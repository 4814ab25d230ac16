"""Cross-driver build arbitration via manifest CAS (VERDICT r03 #4).

Two REAL processes build the same index_dir with the host-local flock
disabled (simulating drivers on different hosts, where flock and pid
liveness cannot arbitrate): exactly one completes; the loser raises
ConcurrentBuildError and leaves no staging garbage. The reference's 429
analog across hosts (app/services/job_service.py:60-83)."""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, __REPO__)
import sparkbm25.jobs as jobs

# simulate a driver on ANOTHER HOST: the flock lockfile cannot see it, so
# neutralize the host-local lock and let the manifest CAS arbitrate
def _no_lock(index_dir, jid):
    os.makedirs(index_dir, exist_ok=True)
    p = os.path.join(index_dir, ".fake.%d" % os.getpid())
    open(p, "w").close()
    return p
jobs._acquire_build_lock = _no_lock

from sparkbm25.session import get_spark
from sparkbm25.build import BuildParams
from sparkbm25.corpus import add_doc_id
from sparkbm25.fixtures import make_transcripts_df

tag, ix_dir, delay = sys.argv[1], sys.argv[2], float(sys.argv[3])
spark = get_spark("cas-" + tag, cores=2, shuffle_partitions=2)
corpus = add_doc_id(make_transcripts_df(spark, 120), "conv_seq").select(
    "doc_id", "text"
)
corpus.cache().count()
time.sleep(delay)
params = BuildParams(num_shards=4, salt_factor=2, num_term_buckets=8,
                     lineage_groups=3, doc_id_scheme="conv_seq")
try:
    m = jobs.build_index(corpus, ix_dir, params, source_fingerprint="cas")
    print("CASRESULT", json.dumps({"tag": tag, "outcome": "completed",
                                   "token": m.get("submit_token")}))
except jobs.ConcurrentBuildError as e:
    print("CASRESULT", json.dumps({"tag": tag, "outcome": "lost",
                                   "err": str(e)[:100]}))
"""


def test_two_drivers_exactly_one_wins(tmp_path):
    ix_dir = str(tmp_path / "cas_ix")
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(CHILD.replace("__REPO__", repr(REPO)))
    env = {**os.environ, "SPARKBM25_CAS_SETTLE_MS": "100"}
    # A starts building first; B claims ~2 s later, mid-way through A's
    # 3-group build — A must lose at its next publish gate
    pa = subprocess.Popen([sys.executable, script, "A", ix_dir, "0"],
                          stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                          text=True, env=env)
    time.sleep(2.0)
    pb = subprocess.Popen([sys.executable, script, "B", ix_dir, "0"],
                          stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                          text=True, env=env)
    out_a, _ = pa.communicate(timeout=600)
    out_b, _ = pb.communicate(timeout=600)

    results = {}
    for out in (out_a, out_b):
        for line in out.splitlines():
            if line.startswith("CASRESULT"):
                r = json.loads(line.split(" ", 1)[1])
                results[r["tag"]] = r
    assert set(results) == {"A", "B"}, (out_a[-2000:], out_b[-2000:])
    outcomes = sorted(r["outcome"] for r in results.values())
    assert outcomes == ["completed", "lost"], results
    winner = next(r for r in results.values() if r["outcome"] == "completed")

    # final manifest: COMPLETED, carrying the WINNER's token
    with open(os.path.join(ix_dir, "manifest.json")) as f:
        m = json.load(f)
    assert m["status"] == "COMPLETED"
    assert m["submit_token"] == winner["token"]
    assert len(m["completed_groups"]) == 3
    # loser's staging cleaned — no staged data left behind (a bare empty
    # dir can survive a cleanup race; garbage means CONTENTS)
    st = os.path.join(ix_dir, "build_staging")
    assert not os.path.exists(st) or os.listdir(st) == [], os.listdir(st)
    # the artifact the winner published is intact and queryable
    from sparkbm25.fixtures import make_queries, make_transcripts_df
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index
    from sparkbm25.corpus import add_doc_id
    from sparkbm25.oracle import OracleIndex
    from sparkbm25.session import get_spark

    spark = get_spark("cas-check", cores=2, shuffle_partitions=2)
    ix = Index(spark, ix_dir)
    corpus = add_doc_id(make_transcripts_df(spark, 120), "conv_seq").select(
        "doc_id", "text"
    )
    ora = OracleIndex.build([(r.doc_id, r.text) for r in corpus.collect()])
    queries = make_queries(10)
    got = sorted((r.query_id, r.rank, r.doc_id)
                 for r in index_search(ix, queries, k=5).collect())
    want = sorted((q, rk, d) for q, rk, d, _s in ora.search_all(queries, k=5))
    assert got == want
