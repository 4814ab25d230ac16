"""Replicate bench.py's exact prefix (corpus count, warm-up build, timed
build under MemorySampler) and then A/B the 100-query batch with and
without the sampler, repeated, in the same JVM.

Usage: python tools/r07/bisect_q100_inflation.py
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
from sparkbm25.fixtures import make_queries  # noqa: E402
from sparkbm25.index_query import index_search  # noqa: E402
from sparkbm25.jobs import Index, build_index  # noqa: E402
from sparkbm25.memprof import MemorySampler  # noqa: E402
from sparkbm25.session import get_spark  # noqa: E402


def main() -> None:
    cpus = 32
    spark = get_spark("bisect-q100", cores=cpus, shuffle_partitions=cpus)
    corpus_path = prepare_corpus(spark, "0.1", 50000)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text")
    corpus.count()
    params = BuildParams(num_shards=max(cpus, 8), salt_factor=4,
                         num_term_buckets=32, lineage_groups=1,
                         doc_id_scheme="conv_seq")
    ix_dir = "/tmp/sparkbm25_bench/bisect_q100_ix"
    shutil.rmtree(ix_dir, ignore_errors=True)
    build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    shutil.rmtree(ix_dir, ignore_errors=True)
    t0 = time.time()
    with MemorySampler() as ms:
        build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    print(f"timed build: {time.time()-t0:.2f}s peak={ms.peak_mb}", flush=True)

    ix = Index(spark, ix_dir)
    queries = make_queries(100)

    def q100(label: str, sampler: bool) -> None:
        t0 = time.time()
        if sampler:
            with MemorySampler() as ms:
                n = index_search(ix, queries, k=10).count()
            peak = ms.peak_mb
        else:
            n = index_search(ix, queries, k=10).count()
            peak = None
        print(f"{label}: {time.time()-t0:.2f}s n={n} peak={peak}", flush=True)

    q100("q100 bench-slot (sampler, first)", True)
    for i in range(3):
        q100(f"q100 no-sampler #{i}", False)
    for i in range(3):
        q100(f"q100 sampler #{i}", True)
    spark.stop()


if __name__ == "__main__":
    main()
