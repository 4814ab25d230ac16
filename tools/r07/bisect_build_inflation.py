"""Bisect the in-bench build_index inflation (31.6 s in-bench vs 14.4 s
interactive, same code/corpus/cores).

Reproduces bench.py's exact sequence, then re-times the build several
more times in the same JVM with and without MemorySampler to separate
(a) sampler contention, (b) warm-up-build JVM/worker-state carryover,
(c) run-order effects.

Usage: python tools/r07/bisect_build_inflation.py
"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bench import prepare_corpus  # noqa: E402
from sparkbm25.build import BuildParams  # noqa: E402
from sparkbm25.corpus import add_doc_id  # noqa: E402
from sparkbm25.jobs import build_index  # noqa: E402
from sparkbm25.memprof import MemorySampler  # noqa: E402
from sparkbm25.session import get_spark  # noqa: E402


def main() -> None:
    cpus = 32
    spark = get_spark("bisect-build", cores=cpus, shuffle_partitions=cpus)
    corpus_path = prepare_corpus(spark, "0.1", 50000)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text"
    )
    corpus.count()
    params = BuildParams(
        num_shards=max(cpus, 8), salt_factor=4, num_term_buckets=32,
        lineage_groups=1, doc_id_scheme="conv_seq",
    )
    ix_dir = "/tmp/sparkbm25_bench/bisect_ix"

    def one(label: str, sampler: bool) -> None:
        shutil.rmtree(ix_dir, ignore_errors=True)
        t0 = time.time()
        if sampler:
            with MemorySampler() as ms:
                build_index(corpus, ix_dir, params,
                            source_fingerprint=corpus_path)
            peak = ms.peak_mb
        else:
            build_index(corpus, ix_dir, params,
                        source_fingerprint=corpus_path)
            peak = None
        print(f"{label}: {time.time() - t0:.2f}s peak={peak}", flush=True)

    one("1 warmup (bench warm-up slot, no sampler)", sampler=False)
    one("2 timed-with-sampler (bench timed slot)", sampler=True)
    one("3 timed-no-sampler", sampler=False)
    one("4 timed-with-sampler-again", sampler=True)
    one("5 timed-no-sampler-again", sampler=False)
    spark.stop()


if __name__ == "__main__":
    main()


def repeats(n: int = 6) -> None:
    import json
    cpus = 32
    spark = get_spark("bisect-build2", cores=cpus, shuffle_partitions=cpus)
    corpus_path = prepare_corpus(spark, "0.1", 50000)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text")
    corpus.count()
    params = BuildParams(num_shards=max(cpus, 8), salt_factor=4,
                         num_term_buckets=32, lineage_groups=1,
                         doc_id_scheme="conv_seq")
    ix_dir = "/tmp/sparkbm25_bench/bisect_ix"
    for i in range(n):
        shutil.rmtree(ix_dir, ignore_errors=True)
        t0 = time.time()
        build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
        wall = time.time() - t0
        m = json.load(open(f"{ix_dir}/manifest.json"))["metrics"]
        print(f"run{i}: wall={wall:.2f} stats={m['stats']:.2f} "
              f"group_0={m['group_0']:.2f} finalize={m['finalize']:.2f}",
              flush=True)
    spark.stop()
