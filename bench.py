"""Benchmark harness — per-round feedback loop (driver runs this at sf0.1).

Prints ONE compact JSON line (the FINAL stdout line — the driver tail-captures
it, so it must stay small; round 3's inline param_grid overflowed the capture
and lost the round's machine-readable record):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-stage seconds...}, "sf": ..., throughput/qps/rss}
Everything bulky (param_grid, ivf_recall_curve, minhash A/B) goes to a
sidecar file under bench_results/ whose path is named in the headline.

Stages benched (mirroring the reference's benchmarking/workload/workload.py
doIndexing + doSearch split, with its metric names transposed):
  build_index            full salted-SPIMI build over the synthetic
                         transcript corpus (turns/sec reported)
  query_indexed_batch    100-query batch via block-max pruned index_search
  query_indexed_p50      median single-query latency (20 warm single calls)
  query_scoreall         score-all path over the sf documents table
  dedup/ann/textstats    training-data pipeline ops (when present)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARKBM25_BENCH_CONVS (override corpus size),
     SPARKBM25_SKIP_PIPELINE=1 to bench only the index engine.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_CONVS = {"0.001": 500, "0.01": 5000, "0.1": 50000}

# scalar extras promoted into the compact stdout headline (single source of
# truth — tests/test_bench_rollup.py imports this to verify the headline
# stays inside the driver's tail capture)
HEADLINE_EXTRAS = (
    "build_throughput_turns_per_sec", "n_turns", "build_peak_rss_mb",
    "batch_results", "query_throughput_qps", "query_peak_rss_mb",
    "ivf_n_centroids", "ivf_default_n_probe", "pipeline_curate_s",
    "query_p50_lowlat_s", "positions_overhead_ratio", "query_phrase20_s",
    "blockmax_tomb10_ratio", "pipeline_bm25f_topk_s",
)


def _sf_from_dir(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else "0.1"


def prepare_corpus(spark, sf: str, n_convs: int) -> str:
    """Materialize the bench transcript corpus once per scale (generation
    cost must not pollute build timing)."""
    path = f"/tmp/sparkbm25_bench/transcripts_sf{sf}_{n_convs}.parquet"
    if not os.path.exists(path):
        from sparkbm25.fixtures import make_transcripts_df

        df = make_transcripts_df(spark, n_convs)
        df.write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    n_convs = int(
        os.environ.get("SPARKBM25_BENCH_CONVS", SF_CONVS.get(sf, 50000))
    )

    from sparkbm25.build import BuildParams
    from sparkbm25.corpus import add_doc_id
    from sparkbm25.fixtures import make_queries
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index, build_index
    from sparkbm25.session import get_spark

    spark = get_spark("sparkbm25-bench", cores=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    corpus_path = prepare_corpus(spark, sf, n_convs)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text"
    )
    n_turns = corpus.count()  # warms the scan; not timed

    # --- build ------------------------------------------------------------
    ix_dir = f"/tmp/sparkbm25_bench/ix_sf{sf}_{cpus}"
    # ids come from add_doc_id("conv_seq"): declaring the scheme skips the
    # provided-id quantile sharding audit (dense by construction)
    params = BuildParams(
        num_shards=max(cpus, 8), salt_factor=4,
        num_term_buckets=32, lineage_groups=1,
        doc_id_scheme="conv_seq",
    )
    # warm-up build: python-worker spawn + JIT + page cache (throughput is a
    # steady-state metric; a cluster job amortizes these over hours)
    from sparkbm25.memprof import MemorySampler

    shutil.rmtree(ix_dir, ignore_errors=True)
    build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    shutil.rmtree(ix_dir, ignore_errors=True)
    t0 = time.time()
    with MemorySampler() as ms_build:
        build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    timings["build_index"] = round(time.time() - t0, 3)
    extras["build_throughput_turns_per_sec"] = round(
        n_turns / timings["build_index"], 1
    )
    extras["n_turns"] = n_turns
    # peak process-tree RSS per stage (reference memory_monitor.py analog);
    # feeds back into planner.admission_check's bytes-per-posting constants
    extras["build_peak_rss_mb"] = ms_build.peak_mb

    ix = Index(spark, ix_dir)
    queries = make_queries(100)

    # --- batch query ------------------------------------------------------
    t0 = time.time()
    with MemorySampler() as ms_query:
        n_res = index_search(ix, queries, k=10).count()
    timings["query_indexed_batch"] = round(time.time() - t0, 3)
    extras["batch_results"] = n_res
    extras["query_throughput_qps"] = round(
        len(queries) / timings["query_indexed_batch"], 2
    )
    extras["query_peak_rss_mb"] = ms_query.peak_mb

    # --- single-query p50 ---------------------------------------------------
    lat = []
    for qid, qtext in queries[:20]:
        t0 = time.time()
        index_search(ix, [(qid, qtext)], k=10).count()
        lat.append(time.time() - t0)
    timings["query_indexed_p50"] = round(statistics.median(lat), 3)

    # same stage under the documented low-latency mode (AQE off + small
    # shuffle for the action) — the p50 a latency-sensitive caller gets
    from sparkbm25.session import low_latency

    lat = []
    with low_latency(spark):
        index_search(ix, queries[:1], k=10).count()  # warm the mode
        for qid, qtext in queries[:20]:
            t0 = time.time()
            index_search(ix, [(qid, qtext)], k=10).count()
            lat.append(time.time() - t0)
    extras["query_p50_lowlat_s"] = round(statistics.median(lat), 3)

    # direct-route searches also tolerate the sp shrink (kernel
    # parallelism comes from the work-item df, so sp only sizes the
    # skinny top-k merge — session.low_latency docstring, r06)
    lat = []
    with low_latency(spark, shuffle_partitions=4):
        index_search(ix, queries[:1], k=10).count()
        for qid, qtext in queries[:20]:
            t0 = time.time()
            index_search(ix, [(qid, qtext)], k=10).count()
            lat.append(time.time() - t0)
    extras["query_p50_lowlat_sp4_s"] = round(statistics.median(lat), 3)

    # --- block-max pruned strategy (the WAND path), subset ------------------
    t0 = time.time()
    index_search(ix, queries[:20], k=10, strategy="blockmax").count()
    timings["query_blockmax_20"] = round(time.time() - t0, 3)

    # --- round-5 engine stages (extras: headline total stays comparable
    # across rounds that predate them) -------------------------------------
    # (a) positional postings: build overhead (bytes/posting vs the plain
    #     layout) + a 20-phrase exact-match batch over the same corpus
    try:
        from pyspark.sql import functions as F

        from sparkbm25.index_query import index_phrase_search

        man_plain = Index(spark, ix_dir).manifest
        extras["bytes_per_posting"] = man_plain["metrics"].get(
            "bytes_per_posting"
        )
        pos_dir = f"/tmp/sparkbm25_bench/ixpos_sf{sf}_{cpus}"
        pos_params = BuildParams(
            num_shards=max(cpus, 8), salt_factor=4,
            num_term_buckets=32, lineage_groups=1,
            doc_id_scheme="conv_seq", store_positions=True,
        )
        shutil.rmtree(pos_dir, ignore_errors=True)
        t0 = time.time()
        man_pos = build_index(
            corpus, pos_dir, pos_params, source_fingerprint=corpus_path
        )
        extras["build_positions_s"] = round(time.time() - t0, 3)
        extras["positions_bytes_per_posting"] = man_pos["metrics"].get(
            "bytes_per_posting"
        )
        if extras["bytes_per_posting"]:
            extras["positions_overhead_ratio"] = round(
                extras["positions_bytes_per_posting"]
                / extras["bytes_per_posting"], 3
            )
        # deterministic phrases: leading trigrams of every ~(n/20)-th doc
        pix = Index(spark, pos_dir)
        sample = (
            corpus.filter(F.col("doc_id") % max(n_turns // 20, 1) == 0)
            .select("doc_id", "text").limit(20).collect()
        )
        phrases = [
            (i, " ".join(r.text.split()[:3])) for i, r in enumerate(sample)
        ]
        index_phrase_search(pix, phrases[:2], k=10).count()  # warm
        t0 = time.time()
        index_phrase_search(pix, phrases, k=10).count()
        extras["query_phrase20_s"] = round(time.time() - t0, 3)

        # r06 indexed BM25F (per-field tf from the positional stream) vs
        # the corpus-scan shape on the same corpus — the "off the
        # score_all shape" evidence for field-boosted ranking
        from sparkbm25.bm25f import bm25f_score_topk
        from sparkbm25.index_query import index_bm25f_search

        index_bm25f_search(pix, queries[:2], k=10).count()  # warm
        t0 = time.time()
        index_bm25f_search(pix, queries[:20], k=10).count()
        extras["query_bm25f20_indexed_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        bm25f_score_topk(corpus, queries[:20], k=10).count()
        extras["query_bm25f20_scan_s"] = round(time.time() - t0, 3)
        extras["bm25f_indexed_vs_scan_ratio"] = round(
            extras["query_bm25f20_indexed_s"]
            / extras["query_bm25f20_scan_s"], 3
        )
    except Exception as e:
        extras["positions_error"] = str(e)[:200]

    # (b) blockmax pruning retention under a 10% tombstone load: same
    #     20-query WAND batch on a copy of the index with every 10th doc
    #     deleted — the ratio shows pruning survives deletes (the r04
    #     verdict's "pruned path unavailable under deletes" gap, closed)
    try:
        from pyspark.sql import functions as F

        from sparkbm25.jobs import delete_docs

        tomb_dir = f"/tmp/sparkbm25_bench/ixtomb_sf{sf}_{cpus}"
        shutil.rmtree(tomb_dir, ignore_errors=True)
        shutil.copytree(ix_dir, tomb_dir)
        victims = [
            r.doc_id
            for r in corpus.filter(F.col("doc_id") % 10 == 0)
            .select("doc_id").collect()
        ]
        delete_docs(spark, tomb_dir, victims)
        tix = Index(spark, tomb_dir)
        index_search(tix, queries[:2], k=10, strategy="blockmax").count()
        t0 = time.time()
        index_search(tix, queries[:20], k=10, strategy="blockmax").count()
        extras["query_blockmax20_tomb10_s"] = round(time.time() - t0, 3)
        extras["blockmax_tomb10_ratio"] = round(
            extras["query_blockmax20_tomb10_s"]
            / timings["query_blockmax_20"], 3
        )
        extras["tomb10_n_deleted"] = len(victims)
        shutil.rmtree(tomb_dir, ignore_errors=True)
    except Exception as e:
        extras["tombstone_bench_error"] = str(e)[:200]

    # (c) round-5 boolean surfaces on the same index: the 100-query batch
    #     in conjunctive mode (coverage mask on top of the same fold) and
    #     a 20-stem trailing-wildcard batch (vocabulary expansion, cap 16)
    try:
        from sparkbm25.index_query import index_prefix_search

        index_search(ix, queries[:2], k=10, mode="and").count()  # warm
        t0 = time.time()
        index_search(ix, queries, k=10, mode="and").count()
        extras["query_and100_s"] = round(time.time() - t0, 3)
        # r06: the same conjunctive batch on the PRUNED path (candidate-
        # driven retrieval in the WAND kernel) vs the dense kernel above —
        # the ratio pins "boolean surfaces served pruned" as a win, not
        # just an availability claim
        index_search(ix, queries[:2], k=10, mode="and",
                     strategy="blockmax").count()
        t0 = time.time()
        index_search(ix, queries, k=10, mode="and",
                     strategy="blockmax").count()
        extras["query_and100_blockmax_s"] = round(time.time() - t0, 3)
        extras["and_blockmax_ratio"] = round(
            extras["query_and100_blockmax_s"] / extras["query_and100_s"], 3
        )
        index_search(ix, queries[:2], k=10, min_match=2,
                     strategy="blockmax").count()
        t0 = time.time()
        index_search(ix, queries, k=10, min_match=2,
                     strategy="blockmax").count()
        extras["query_msm100_blockmax_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        index_search(ix, queries, k=10, min_match=2).count()
        extras["query_msm100_s"] = round(time.time() - t0, 3)
        stems = sorted({qtext.split()[0][:3] for _, qtext in queries})[:20]
        pq = [(i, s + "*") for i, s in enumerate(stems)]
        index_prefix_search(ix, pq[:2], k=10, max_expansions=16).count()
        t0 = time.time()
        index_prefix_search(ix, pq, k=10, max_expansions=16).count()
        extras["query_prefix_s"] = round(time.time() - t0, 3)
        extras["prefix_n_queries"] = len(pq)
        # r06: fuzzy landed after the r05 bench refresh — give it a row
        from sparkbm25.index_query import index_fuzzy_search

        fq = [(i, s[:-1] + "x") for i, s in enumerate(stems)]  # 1-edit off
        index_fuzzy_search(ix, fq[:2], k=10, max_dist=1,
                           max_expansions=16).count()
        t0 = time.time()
        index_fuzzy_search(ix, fq, k=10, max_dist=1,
                           max_expansions=16).count()
        extras["query_fuzzy_s"] = round(time.time() - t0, 3)
        extras["fuzzy_n_queries"] = len(fq)
    except Exception as e:
        extras["boolean_bench_error"] = str(e)[:200]

    # --- score-all over driver documents table -----------------------------
    from __spark_entry__ import q_bm25_topk

    t0 = time.time()
    q_bm25_topk(spark, sf_dir).count()
    timings["query_scoreall_documents"] = round(time.time() - t0, 3)

    # --- training-data pipeline ops (optional) -----------------------------
    if os.environ.get("SPARKBM25_SKIP_PIPELINE") != "1":
        try:
            import __spark_entry__ as entry_mod

            for name in (
                "dedup_exact", "dedup_minhash", "ann_cosine_topk",
                "text_quality", "lang_id",
            ):
                fn = entry_mod.queries().get(name)
                if fn is None:
                    continue
                t0 = time.time()
                fn(spark, sf_dir).count()
                timings[f"pipeline_{name}"] = round(time.time() - t0, 3)
            # surfaces new in r5: recorded in extras, NOT the headline
            # total (keeps `value` comparable with earlier rounds)
            for xname in ("bm25f_topk", "search_facets", "search_snippets",
                          "score_explain", "bm25_msm_topk", "bm25_not_topk",
                          "phrase_near_topk", "hybrid_rrf_topk", "mlt_topk",
                          # r06 late surfaces: field collapsing, cursor
                          # pagination (page2 includes its page-1
                          # search), aggregations, significant terms
                          "bm25_collapse_topk", "bm25_page2_topk",
                          "search_histogram", "search_stats",
                          "search_cardinality", "search_count",
                          "significant_terms"):
                fn = entry_mod.queries().get(xname)
                if fn is not None:
                    t0 = time.time()
                    fn(spark, sf_dir).count()
                    extras[f"pipeline_{xname}_s"] = round(
                        time.time() - t0, 3
                    )
        except Exception as e:  # pipeline bench must not sink the headline
            extras["pipeline_error"] = str(e)[:200]
        # integrative curation op: recorded in extras, NOT in the headline
        # total (keeps `value` comparable across rounds that predate it)
        try:
            import __spark_entry__ as entry_mod

            t0 = time.time()
            entry_mod.queries()["curate"](spark, sf_dir).count()
            extras["pipeline_curate_s"] = round(time.time() - t0, 3)
        except Exception as e:
            extras["curate_error"] = str(e)[:200]

    # --- IVF n_probe -> recall@10 curve (the reference's ef_search sweep:
    # benchmarking/benchmarks.yml:14-15 sweeps ef_search and
    # search_indices.py:41-44 reports recall against ground truth). Exact
    # brute-force cosine top-10 is the ground truth; the persisted IVF
    # artifact is searched at each n_probe and recall@10 averaged over the
    # query set. Also times each sweep point so the recall/latency
    # trade-off is one table.
    if os.environ.get("SPARKBM25_SKIP_PIPELINE") != "1":
        try:
            from pyspark.sql import functions as F

            from sparkbm25.pipeline.similarity import build_ann_index, tune_n_probe
            from sparkbm25.session import ensure_shipped

            ensure_shipped(spark)
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            import sparkbm25

            # version-keyed like the entry's cache: a layout change in a
            # later engine revision must not silently serve a stale artifact
            ann_dir = f"/tmp/sparkbm25_bench/ivf_sf{sf}_{sparkbm25.__version__}"
            if not os.path.exists(f"{ann_dir}/manifest.json"):
                manifest = build_ann_index(emb, ann_dir)  # sqrt-rule params
            else:
                with open(f"{ann_dir}/manifest.json") as fh:
                    manifest = json.load(fh)
            rq_ids = list(range(16))
            qvecs = {
                r.vec_id: list(r.embedding)
                for r in emb.filter(F.col("vec_id").isin(rq_ids)).collect()
            }
            # the sweep IS tune_n_probe's probe-list mode: bench and the
            # tuning API share one recall measurement (no drift)
            tuned = tune_n_probe(
                spark, ann_dir, qvecs, k=10, target_recall=1.0,
                probes=[1, 2, 4, 8, 16],
            )
            extras["ivf_recall_curve"] = [
                {"n_probe": c["n_probe"], "recall_at_10": c["recall"],
                 "search_s": c["search_s"]}
                for c in tuned["curve"]
            ]
            extras["ivf_n_centroids"] = int(manifest["n_centroids"])
            extras["ivf_default_n_probe"] = int(manifest["default_n_probe"])
        except Exception as e:
            extras["ivf_recall_error"] = str(e)[:200]

    # --- build-parameter grid (the reference's benchmarks.yml sweep analog:
    # refine_rate x trainset_fraction x compression -> block_size x
    # salt_factor here), run on a 1/5 corpus so the grid stays cheap.
    # Emits one row per config like benchmarking/results.py:14-122.
    if os.environ.get("SPARKBM25_SKIP_GRID") != "1":
        # like the pipeline stage: a grid failure must not sink the headline
        try:
            grid_rows = []
            grid_corpus_path = prepare_corpus(spark, sf, max(n_convs // 5, 500))
            grid_corpus = add_doc_id(
                spark.read.parquet(grid_corpus_path), "conv_seq"
            ).select("doc_id", "text")
            g_turns = grid_corpus.count()
            gq = make_queries(40)
            for block_size in (64, 128, 256):
                for salt_factor in (2, 4, 8):
                    gdir = (
                        f"/tmp/sparkbm25_bench/grid_{sf}_{block_size}_{salt_factor}"
                    )
                    shutil.rmtree(gdir, ignore_errors=True)
                    gp = BuildParams(
                        num_shards=max(cpus, 8), salt_factor=salt_factor,
                        num_term_buckets=32, lineage_groups=1,
                        block_size=block_size, doc_id_scheme="conv_seq",
                    )
                    try:
                        t0 = time.time()
                        mman = build_index(grid_corpus, gdir, gp,
                                           source_fingerprint=grid_corpus_path)
                        b_s = time.time() - t0
                        gix = Index(spark, gdir)
                        t0 = time.time()
                        index_search(gix, gq, k=10).count()
                        q_s = time.time() - t0
                        grid_rows.append({
                            "block_size": block_size,
                            "salt_factor": salt_factor,
                            "build_s": round(b_s, 3),
                            "build_turns_per_sec": round(g_turns / b_s, 1),
                            "query40_s": round(q_s, 3),
                            "bytes_per_posting": mman["metrics"].get(
                                "bytes_per_posting"
                            ),
                        })
                    finally:
                        shutil.rmtree(gdir, ignore_errors=True)
            extras["param_grid"] = grid_rows
            extras["param_grid_turns"] = g_turns
        except Exception as e:
            extras["param_grid_error"] = str(e)[:200]

    # --- minhash geometry A/B (same-run, same cached input) -----------------
    # Round-3's claimed b=32 kernel halving was invisible in the driver's
    # bench context (host-band noise dominated the one measured stage). Pin
    # it: run BOTH geometries back-to-back on an explicitly cached shingle
    # corpus and record the ratio every round. Identical verified pairs is
    # part of the record (banding changes candidate recall, never verified
    # output — the exact-Jaccard verify step removes all false positives).
    if os.environ.get("SPARKBM25_SKIP_PIPELINE") != "1":
        try:
            from sparkbm25.pipeline.dedup import minhash_lsh_pairs
            from sparkbm25.session import ensure_shipped

            ensure_shipped(spark)
            docs = (
                spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text")
                .cache()
            )
            docs.count()  # materialize the cache: both arms read warm input
            ab = {}
            for nb in (64, 32):
                t0 = time.time()
                n_pairs = minhash_lsh_pairs(
                    docs, threshold=0.5, n_bands=nb
                ).count()
                ab[f"b{nb}"] = {
                    "wall_s": round(time.time() - t0, 3),
                    "verified_pairs": n_pairs,
                }
            ab["ratio_b32_over_b64"] = round(
                ab["b32"]["wall_s"] / ab["b64"]["wall_s"], 3
            )
            ab["identical_pairs"] = (
                ab["b32"]["verified_pairs"] == ab["b64"]["verified_pairs"]
            )
            extras["minhash_ab"] = ab
            docs.unpersist()
        except Exception as e:
            extras["minhash_ab_error"] = str(e)[:200]

    total = round(sum(timings.values()), 3)
    # Full record (everything) -> sidecar file; compact headline -> stdout.
    # The driver tail-captures the LAST stdout line, so the headline must
    # stay small and must be printed last.
    full = {
        "metric": "index-build + BM25 top-k wall clock (see queries for stages)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        **{k: v for k, v in extras.items()},
    }
    results_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_results"
    )
    os.makedirs(results_dir, exist_ok=True)
    sidecar = os.path.join(
        results_dir, f"bench_full_sf{sf}_c{cpus}_{int(time.time())}.json"
    )
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1)
    out = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        **{k: extras[k] for k in HEADLINE_EXTRAS if k in extras},
        "sidecar": os.path.relpath(sidecar, os.path.dirname(sidecar) + "/.."),
    }
    if "minhash_ab" in extras:
        out["minhash_ab_ratio"] = extras["minhash_ab"]["ratio_b32_over_b64"]
    print(json.dumps(out))
    spark.stop()
    return 0


def rollup_csv(out_path: str | None = None) -> str:
    """Flatten every bench_results/*.json into one CSV (the reference's
    benchmarking/results.py:14-122 CSV rollup analog). Scalar fields become
    columns; nested lists/dicts (param_grid, curves) are skipped — they stay
    in their sidecar files."""
    import csv
    import glob

    results_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_results"
    )
    rows = []
    for path in sorted(glob.glob(os.path.join(results_dir, "*.json"))):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rec, dict):
            continue
        flat = {"file": os.path.basename(path)}
        for k, v in rec.items():
            if isinstance(v, (int, float, str, bool)) or v is None:
                flat[k] = v
            elif k == "queries" and isinstance(v, dict):
                for qk, qv in v.items():
                    if isinstance(qv, (int, float)):
                        flat[f"q_{qk}"] = qv
        rows.append(flat)
    cols = ["file"]
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    out_path = out_path or os.path.join(results_dir, "rollup.csv")
    with open(out_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)
    return out_path


if __name__ == "__main__":
    if "--csv" in sys.argv[1:]:
        print(rollup_csv())
        raise SystemExit(0)
    raise SystemExit(main())
