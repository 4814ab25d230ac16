"""Capture .explain('formatted') for the r07-touched queries.

Usage: python capture_plans.py <repo_root> <out_dir> <suffix> [sf_dir]
Writes <out_dir>/<query>_<suffix>.txt for each touched query plus a
single-query index_search ('point_search')."""
import os
import sys

repo = sys.argv[1]
out_dir = sys.argv[2]
suffix = sys.argv[3]
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
sys.path.insert(0, repo)

from sparkbm25.session import get_spark  # noqa: E402

spark = get_spark(f"r07-plans-{suffix}", cores=8, shuffle_partitions=8)
os.makedirs(out_dir, exist_ok=True)

import __spark_entry__ as entry  # noqa: E402

NAMES = [
    "bm25_topk", "term_stats", "dedup_minhash", "dedup_clusters",
    "curate", "mlt_topk", "hybrid_rrf_topk", "score_explain",
    "bm25_topk_indexed",
]


def fmt(df):
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


for name in NAMES:
    try:
        df = entry.queries()[name](spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(fmt(df))
        print("ok", name, flush=True)
    except Exception as e:
        print("ERR", name, str(e)[:200], flush=True)

# single-query point search (the fast-path surface)
try:
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = entry._entry_index(spark, sf_dir)
    df = index_search(Index(spark, ix_dir), entry.DOC_QUERIES[:1], k=10)
    with open(os.path.join(out_dir, f"point_search_{suffix}.txt"), "w") as fh:
        fh.write(fmt(df))
    print("ok point_search", flush=True)
except Exception as e:
    print("ERR point_search", str(e)[:200], flush=True)
spark.stop()
