"""CLI surface via real subprocesses (the reference's HTTP e2e analog:
e2e/api/run_e2e.py submit → poll → assert artifact)."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from sparkbm25.fixtures import make_transcripts_pdf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "sparkbm25.cli", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "tr.parquet")
    spark.createDataFrame(make_transcripts_pdf(15)).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.parquet(d)
    return d


def test_cli_lifecycle(src, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("cli_ix") / "job1")
    r = run_cli("build", "--source", src, "--index-dir", ix,
                "--doc-id-scheme", "conv_seq", "--num-shards", "2",
                "--lineage-groups", "1", "--cores", "4")
    assert r.returncode == 0, r.stderr[-800:]
    assert '"status": "COMPLETED"' in r.stdout

    r = run_cli("status", "--index-dir", ix)
    assert r.returncode == 0
    st = json.loads(r.stdout)
    assert st["status"] == "COMPLETED" and st["completed_groups"] == ["0"]

    r = run_cli("query", "--index-dir", ix, "--query", "w0000", "-k", "3",
                "--cores", "4")
    assert r.returncode == 0
    lines = [ln for ln in r.stdout.splitlines() if "\t" in ln]
    assert 1 <= len(lines) <= 3
    rank, doc_id, score = lines[0].split("\t")
    assert rank == "1" and float(score) > 0

    r = run_cli("jobs", "--index-root", os.path.dirname(ix))
    assert json.loads(r.stdout)[0]["status"] == "COMPLETED"


def test_cli_status_missing_is_404(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_missing") / "nope")
    r = run_cli("status", "--index-dir", d)
    assert r.returncode == 1
    assert json.loads(r.stdout) == {"error": "not found"}


def test_concurrent_submit_locked(spark, tmp_path):
    """Two submitters racing one index_dir: exactly one wins, the loser's
    429-analog error names the running pid/job (reference:
    job_service.py:60-83). A lock left by a dead process is stolen."""
    import json
    import os
    import subprocess

    import pytest

    from sparkbm25.build import BuildParams
    from sparkbm25.jobs import (
        LOCKFILE,
        ConcurrentBuildError,
        build_index,
        job_id,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i % 5} common") for i in range(50)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "locked_ix")
    params = BuildParams(num_shards=2, salt_factor=2, num_term_buckets=2,
                         lineage_groups=1)

    # simulate a live concurrent builder holding the lock
    os.makedirs(d, exist_ok=True)
    lock = os.path.join(d, LOCKFILE)
    with open(lock, "w") as f:
        json.dump({"pid": os.getpid(), "job_id": "f" * 64}, f)
    with pytest.raises(ConcurrentBuildError, match="ffffffffffff"):
        build_index(df, d, params, "lock-test")

    # a lock from a DEAD pid is stale: stolen, build proceeds
    p = subprocess.Popen(["true"])
    p.wait()  # reaped: the pid is guaranteed dead
    with open(lock, "w") as f:
        json.dump({"pid": p.pid, "job_id": "dead"}, f)
    m = build_index(df, d, params, "lock-test")
    assert m["status"] == "COMPLETED"
    assert not os.path.exists(lock)  # released after the build

    # threaded race: one build or clean 429s, never a corrupt artifact
    import threading

    outcomes = []

    def submit():
        try:
            outcomes.append(("ok", build_index(df, d, params, "lock-test-2")))
        except ConcurrentBuildError as e:
            outcomes.append(("busy", str(e)))

    d2 = str(tmp_path / "locked_ix2")

    def submit2():
        try:
            outcomes.append(("ok", build_index(df, d2, params, "lock-test-2")))
        except ConcurrentBuildError as e:
            outcomes.append(("busy", str(e)))

    ts = [threading.Thread(target=submit2) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert any(k == "ok" for k, _ in outcomes)
    assert all(k in ("ok", "busy") for k, _ in outcomes)
    # winner's artifact is valid regardless of how the race resolved
    from sparkbm25.jobs import Index
    ix = Index(spark, d2)
    assert ix.n_docs == 50


def test_dead_lock_race_exactly_one_winner(tmp_path):
    """N threads race a lock left by a DEAD pid: the flock-guarded
    examine-and-steal must admit EXACTLY one winner; every loser gets
    ConcurrentBuildError (never a second acquisition, never a destroyed
    fresh lock — the failure modes of the earlier unlink- and
    rename-based steals). The winner's own payload must be what is left
    on disk."""
    import json as _json
    import os as _os
    import subprocess as _sp
    import threading

    from sparkbm25 import jobs as J

    d = str(tmp_path / "race_ix")
    _os.makedirs(d, exist_ok=True)
    lock = _os.path.join(d, J.LOCKFILE)
    p = _sp.Popen(["true"])
    p.wait()  # reaped: guaranteed-dead pid
    with open(lock, "w") as f:
        _json.dump({"pid": p.pid, "job_id": "dead"}, f)

    results: list[str] = []
    res_lock = threading.Lock()

    def contender(i):
        try:
            J._acquire_build_lock(d, f"{i:064d}")
            with res_lock:
                results.append("won")
        except J.ConcurrentBuildError:
            with res_lock:
                results.append("busy")

    ts = [threading.Thread(target=contender, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results.count("won") == 1, results
    assert results.count("busy") == 7, results
    with open(lock) as f:
        held = _json.load(f)
    assert held["pid"] == _os.getpid()  # the winner's fresh lock survived


def test_cli_filtered_query(src, tmp_path_factory):
    """build --attr-cols role + query --where role=user end-to-end: every
    hit belongs to a user turn (verified against the source parquet)."""
    import duckdb

    ix = str(tmp_path_factory.mktemp("cli_fix") / "jobf")
    r = run_cli("build", "--source", src, "--index-dir", ix,
                "--doc-id-scheme", "conv_seq", "--num-shards", "2",
                "--lineage-groups", "1", "--attr-cols", "role",
                "--cores", "4")
    assert r.returncode == 0, r.stderr[-800:]
    r = run_cli("query", "--index-dir", ix, "--query", "w0001 w0002",
                "--where", "role=user", "-k", "5", "--cores", "4")
    assert r.returncode == 0, r.stderr[-800:]
    hits = [line.split("\t") for line in r.stdout.strip().splitlines()
            if line and line[0].isdigit()]
    assert hits, r.stdout
    con = duckdb.connect()
    user_docs = {
        row[0] for row in con.execute(
            "SELECT CAST(regexp_extract(conv_id, '([0-9]+)$', 1) AS BIGINT) "
            "* 1048576 + turn_idx FROM read_parquet(?) WHERE role = 'user'",
            [src.rstrip("/") + "/*.parquet"],
        ).fetchall()
    }
    # doc ids from the conv_seq scheme must all be user turns
    assert all(int(d) in user_docs for _rk, d, _s in hits), (hits, r.stdout)
    # malformed --where refused
    r = run_cli("query", "--index-dir", ix, "--query", "w0001",
                "--where", "rolex", "--cores", "4")
    assert r.returncode != 0


def test_cli_heartbeat_index_probe(src, tmp_path_factory):
    """Heartbeat analog (app/routes/heart_beat.py:17-28): ok + version
    without a Spark session; optional index status probe."""
    r = run_cli("heartbeat")
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["status"] == "ok" and out["version"]
    assert "index_status" not in out
    r = run_cli("heartbeat", "--index-dir", "/nonexistent/ix")
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["index_status"] == "NOT_FOUND"


def test_cli_delete_then_query_excludes(src, tmp_path_factory):
    """delete --ids then query: tombstoned doc ids disappear from results
    across a fresh process; compact reclaims and heartbeat shows COMPLETED."""
    ix = str(tmp_path_factory.mktemp("cli_del") / "jobd")
    r = run_cli("build", "--source", src, "--index-dir", ix,
                "--doc-id-scheme", "conv_seq", "--num-shards", "2",
                "--lineage-groups", "1", "--cores", "4")
    assert r.returncode == 0, r.stderr[-500:]
    r = run_cli("query", "--index-dir", ix, "--query", "w0001 w0002",
                "-k", "5", "--cores", "4")
    hits_before = [ln.split("\t")[1] for ln in r.stdout.strip().splitlines()
                   if ln and ln[0].isdigit()]
    assert hits_before
    victim = hits_before[0]
    r = run_cli("delete", "--index-dir", ix, "--ids", victim, "--cores", "4")
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["n_deleted"] == 1
    r = run_cli("query", "--index-dir", ix, "--query", "w0001 w0002",
                "-k", "5", "--cores", "4")
    hits_after = [ln.split("\t")[1] for ln in r.stdout.strip().splitlines()
                  if ln and ln[0].isdigit()]
    assert victim not in hits_after
    r = run_cli("compact", "--index-dir", ix, "--cores", "4")
    assert r.returncode == 0, r.stderr[-500:]
    r = run_cli("heartbeat", "--index-dir", ix)
    assert json.loads(r.stdout.strip().splitlines()[-1])["index_status"] == "COMPLETED"
