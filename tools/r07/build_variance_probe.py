"""Catch an episodic slow build and attribute it: per-stage wall span,
executorRunTime, jvmGcTime, and python-worker spawn counts, for N repeated
identical builds in one JVM.

Usage: python tools/r07/build_variance_probe.py [n_repeats]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bench import prepare_corpus  # noqa: E402
from sparkbm25.build import BuildParams  # noqa: E402
from sparkbm25.corpus import add_doc_id  # noqa: E402
from sparkbm25.jobs import build_index  # noqa: E402
from sparkbm25.session import get_spark  # noqa: E402


def stages(app_url: str):
    with urllib.request.urlopen(f"{app_url}/stages?status=complete") as r:
        return json.load(r)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = 32
    spark = get_spark("varprobe", cores=cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"
    corpus_path = prepare_corpus(spark, "0.1", 50000)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text")
    corpus.count()
    params = BuildParams(num_shards=max(cpus, 8), salt_factor=4,
                         num_term_buckets=32, lineage_groups=1,
                         doc_id_scheme="conv_seq")
    ix_dir = "/tmp/sparkbm25_bench/varprobe_ix"
    prev_ids: set[int] = set()
    for i in range(n):
        shutil.rmtree(ix_dir, ignore_errors=True)
        t0 = time.time()
        build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
        wall = time.time() - t0
        rows = []
        for st in stages(app_url):
            sid = st["stageId"]
            if sid in prev_ids:
                continue
            prev_ids.add(sid)
            sub = st.get("submissionTime", "")
            comp = st.get("completionTime", "")
            rows.append((sid, st["numCompleteTasks"],
                         st["executorRunTime"] / 1e3,
                         st.get("jvmGcTime", 0) / 1e3,
                         st.get("executorDeserializeTime", 0) / 1e3,
                         st.get("shuffleFetchWaitTime", 0) / 1e3,
                         sub[11:22], comp[11:22],
                         st["name"].split(" at ")[0][:28]))
        print(f"== run{i}: wall={wall:.2f}s ==", flush=True)
        for r in sorted(rows):
            print("  sid=%d tasks=%d runT=%.1f gc=%.1f deser=%.1f "
                  "fetchW=%.1f %s->%s %s" % r, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
