"""SnapshotCatalog — atomic manifest CAS (VERDICT r04 #5, ADVICE r04 low).

The r04 publish gate was verify-then-write: a competitor claiming between
the verify and the write had its fresh token clobbered back by the earlier
driver's stale manifest, inverting the "latest claim supersedes"
arbitration. These tests pin the fix: every token-guarded publish goes
through the catalog's compare-and-swap, so a stale-token write RAISES and
leaves the competitor's manifest untouched (no settle window with the
flock catalog).
"""

import json
import multiprocessing as mp
import os

import pytest

from sparkbm25 import jobs
from sparkbm25.catalog import (
    CasConflict,
    FlockCasCatalog,
    RenameCatalog,
    get_catalog,
)


def _manifest(token, status="RUNNING", extra=None):
    m = {"submit_token": token, "status": status,
         "claim": {"host": "h", "pid": 1}}
    m.update(extra or {})
    return m


@pytest.mark.parametrize("cat_cls", [FlockCasCatalog, RenameCatalog])
def test_cas_rejects_stale_token(tmp_path, cat_cls):
    cat = cat_cls()
    d = str(tmp_path / "ix")
    cat.publish(d, _manifest("B"))  # competitor B owns the artifact
    with pytest.raises(CasConflict):
        cat.publish(d, _manifest("A"), expected_token="A")
    assert cat.read(d)["submit_token"] == "B"  # B's claim untouched


@pytest.mark.parametrize("cat_cls", [FlockCasCatalog, RenameCatalog])
def test_cas_accepts_own_token_and_unconditional_claim(tmp_path, cat_cls):
    cat = cat_cls()
    d = str(tmp_path / "ix")
    assert cat.read(d) is None
    cat.publish(d, _manifest("A"))  # claim: unconditional, latest wins
    cat.publish(d, _manifest("A", status="COMPLETED"), expected_token="A")
    assert cat.read(d)["status"] == "COMPLETED"
    # expected_token on a MISSING manifest is a conflict (nothing to own)
    d2 = str(tmp_path / "ix2")
    with pytest.raises(CasConflict):
        cat.publish(d2, _manifest("A"), expected_token="A")


def test_gate_race_does_not_reinstate_stale_token(tmp_path):
    """The exact ADVICE r04 scenario: driver 1 holds token A and is about
    to publish; competitor 2 claims token B first; driver 1's publish must
    abort with ConcurrentBuildError and NOT clobber B back to A."""
    d = str(tmp_path / "ix")
    cat = get_catalog()
    cat.publish(d, _manifest("A"))
    m1 = _manifest("A", extra={"completed_groups": {"0": {}}})
    cat.publish(d, _manifest("B"))  # competitor supersedes (latest wins)
    with pytest.raises(jobs.ConcurrentBuildError):
        jobs._cas_publish(d, m1, "A")
    assert cat.read(d)["submit_token"] == "B"


def test_write_failed_if_claimed_preserves_foreign_claim(tmp_path):
    d = str(tmp_path / "ix")
    cat = get_catalog()
    cat.publish(d, _manifest("B"))
    # driver holding stale token A records its failure: must be a no-op
    jobs._write_failed_if_claimed(d, _manifest("A", status="FAILED"), "A")
    cur = cat.read(d)
    assert cur["submit_token"] == "B" and cur["status"] == "RUNNING"
    # while still claimed, the FAILED record lands
    jobs._write_failed_if_claimed(d, _manifest("B", status="FAILED"), "B")
    assert cat.read(d)["status"] == "FAILED"


def test_env_selection(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARKBM25_CATALOG", "rename")
    assert isinstance(get_catalog(), RenameCatalog)
    assert get_catalog().atomic is False
    monkeypatch.setenv("SPARKBM25_CATALOG", "flock")
    assert isinstance(get_catalog(), FlockCasCatalog)
    assert get_catalog().atomic is True
    monkeypatch.setenv("SPARKBM25_CATALOG", "nope")
    with pytest.raises(ValueError, match="nope"):
        get_catalog()


def _contender(d, token, n_rounds, wins):
    cat = FlockCasCatalog()
    w = 0
    for i in range(n_rounds):
        cat.publish(d, _manifest(token, extra={"round": i}))  # claim
        try:
            cat.publish(d, _manifest(token, status="COMPLETED"),
                        expected_token=token)
            w += 1
        except CasConflict:
            pass
    wins[token] = w


def test_flock_cas_two_processes_never_torn(tmp_path):
    """Two real processes hammer claim+CAS-publish on one manifest: every
    read must observe a CONSISTENT manifest (token matches its own claim
    struct — a torn verify-then-write interleave would mix them), and the
    guard file must survive (never unlinked)."""
    d = str(tmp_path / "ix")
    mgr = mp.Manager()
    wins = mgr.dict()
    ps = [mp.Process(target=_contender, args=(d, t, 40, wins))
          for t in ("A", "B")]
    for p in ps:
        p.start()
    for p in ps:
        p.join(60)
        assert p.exitcode == 0
    with open(os.path.join(d, "manifest.json")) as f:
        m = json.load(f)
    # final state is one contender's intact publish, not an interleave
    assert m["submit_token"] in ("A", "B")
    assert sum(wins.values()) >= 1
    assert os.path.exists(os.path.join(d, ".manifest.guard"))


def test_manifest_records_catalog_choice(spark, tmp_path):
    """Every build's manifest must say which catalog arbitrated it and
    whether the publish path was a true CAS — the default (no env) being
    the flock catalog."""
    from sparkbm25.build import BuildParams
    from sparkbm25.corpus import add_doc_id
    from sparkbm25.fixtures import make_transcripts_pdf
    from sparkbm25.jobs import build_index

    pdf = make_transcripts_pdf(6)
    corpus = add_doc_id(spark.createDataFrame(pdf), "conv_seq").select(
        "doc_id", "text"
    )
    d = str(tmp_path / "ixcat")
    m = build_index(corpus, d, BuildParams(num_shards=2, salt_factor=1,
                                           num_term_buckets=2,
                                           lineage_groups=1,
                                           doc_id_scheme="conv_seq"),
                    source_fingerprint="cat6")
    assert m["claim"]["catalog"] == "FlockCasCatalog"
    assert m["claim"]["catalog_atomic"] is True
