"""A/B the index build: r05 spill path vs r06 hash-pipelined path.

Measures wall + peak process-tree RSS for each variant at the bench's
sf0.1 shape (warm-up build first, same corpus, same session).
Usage: python tools/bench_build_ab.py [cpus] [n_convs]
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import prepare_corpus  # noqa: E402
from sparkbm25.build import BuildParams  # noqa: E402
from sparkbm25.corpus import add_doc_id  # noqa: E402
from sparkbm25.jobs import build_index  # noqa: E402
from sparkbm25.memprof import MemorySampler  # noqa: E402
from sparkbm25.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    spark = get_spark("bench-build-ab", cores=cpus, shuffle_partitions=cpus)
    corpus_path = prepare_corpus(spark, "0.1", n_convs)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text"
    )
    n_turns = corpus.count()
    out = {"cpus": cpus, "n_turns": n_turns}
    for label, spill in (("hash_pipelined", False), ("spill_r05", True)):
        params = BuildParams(
            num_shards=max(cpus, 8), salt_factor=4, num_term_buckets=32,
            lineage_groups=1, doc_id_scheme="conv_seq", spill_runs=spill,
        )
        ix_dir = f"/tmp/sparkbm25_bench/ab_{label}_{cpus}"
        shutil.rmtree(ix_dir, ignore_errors=True)
        build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
        shutil.rmtree(ix_dir, ignore_errors=True)
        t0 = time.time()
        with MemorySampler() as ms:
            build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
        wall = time.time() - t0
        out[label] = {
            "wall_s": round(wall, 2),
            "turns_per_sec": round(n_turns / wall, 1),
            "peak_rss_mb": ms.peak_mb,
        }
        print(json.dumps({label: out[label]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
