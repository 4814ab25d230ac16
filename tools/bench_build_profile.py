"""Per-stage profile of one build variant via the Spark status REST API.

Usage: python tools/bench_build_profile.py {hash|spill} [cpus] [n_convs]
Prints each stage's name, task count, executorRunTime, shuffle/IO bytes.
"""
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import prepare_corpus  # noqa: E402
from sparkbm25.build import BuildParams  # noqa: E402
from sparkbm25.corpus import add_doc_id  # noqa: E402
from sparkbm25.jobs import build_index  # noqa: E402
from sparkbm25.session import get_spark  # noqa: E402


def main() -> None:
    variant = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
    spark = get_spark(
        f"profile-{variant}", cores=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    corpus_path = prepare_corpus(spark, "0.1", n_convs)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text"
    )
    corpus.count()
    params = BuildParams(
        num_shards=max(cpus, 8), salt_factor=4, num_term_buckets=32,
        lineage_groups=1, doc_id_scheme="conv_seq",
        spill_runs=(variant == "spill"),
    )
    ix_dir = f"/tmp/sparkbm25_bench/prof_{variant}_{cpus}"
    # warm-up
    shutil.rmtree(ix_dir, ignore_errors=True)
    build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    shutil.rmtree(ix_dir, ignore_errors=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    before = {
        s["stageId"]
        for s in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
        )
    }
    t0 = time.time()
    build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    wall = time.time() - t0
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    rows = []
    for s in stages:
        if s["stageId"] in before or s["status"] != "COMPLETE":
            continue
        rows.append(
            (
                s["stageId"],
                s["numCompleteTasks"],
                round(s["executorRunTime"] / 1000.0, 1),
                round((s.get("inputBytes", 0)) / 1e6),
                round((s.get("outputBytes", 0)) / 1e6),
                round((s.get("shuffleWriteBytes", 0)) / 1e6),
                round((s.get("shuffleReadBytes", 0)) / 1e6),
                round(
                    (s.get("firstTaskLaunchedTime") and 0) or 0
                ),
                (s.get("name") or "")[:80],
            )
        )
    rows.sort()
    print(f"\n== {variant} wall {wall:.1f}s ==")
    print("stage tasks  runT(s)  inMB  outMB  shwMB  shrMB  name")
    for r in rows:
        print(
            f"{r[0]:>5} {r[1]:>5} {r[2]:>8} {r[3]:>5} {r[4]:>6} "
            f"{r[5]:>6} {r[6]:>6}  {r[8]}"
        )


if __name__ == "__main__":
    main()
