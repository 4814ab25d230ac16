"""Persisted IVF ANN artifact + head-term skew stress."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkbm25.build import BuildParams
from sparkbm25.index_query import index_search
from sparkbm25.jobs import Index, build_index
from sparkbm25.oracle import OracleIndex
from sparkbm25.pipeline.similarity import (
    ann_index_search,
    build_ann_index,
    cosine_topk,
)

SF = "/root/testdata/sf0.001"


def test_ann_index_artifact_roundtrip(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = str(tmp_path / "ann_ix")
    m = build_ann_index(emb, d, n_centroids=8)
    assert m["dim"] == 64 and len(m["centroids"]) == 8

    qrows = {r.vec_id: list(r.embedding)
             for r in emb.filter(F.col("vec_id") < 3).collect()}
    # full probe == brute force from the ARTIFACT
    got = [(r.query_vec_id, r.rank, r.vec_id)
           for r in ann_index_search(spark, d, qrows, k=5, n_probe=8).collect()]
    want = [(r.query_vec_id, r.rank, r.vec_id)
            for r in cosine_topk(emb, [0, 1, 2], k=5).collect()]
    assert sorted(got) == sorted(want)

    # partition pruning: the probe scan must carry a centroid_id filter
    vectors = spark.read.parquet(f"{d}/vectors")
    scan = vectors.filter(F.col("centroid_id").isin([1, 2]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "centroid_id" in pf


def test_ann_index_partial_probe_recall(spark, tmp_path):
    """Recall gate at partial probe (6 of 8 centroids) on the weakly-
    clustered testdata (see test_pipeline.test_ivf_partial_probe_recall for
    the tradeoff-curve rationale; the strongly-clustered high-recall case is
    gated there on planted clusters)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = str(tmp_path / "ann_ix2")
    build_ann_index(emb, d, n_centroids=8)
    qrows = {r.vec_id: list(r.embedding)
             for r in emb.filter(F.col("vec_id") < 5).collect()}
    res = ann_index_search(spark, d, qrows, k=10, n_probe=6)

    # the search plan must NOT funnel each query through one task: no
    # groupBy(query).applyInPandas (FlatMapGroupsInPandas) anywhere — the
    # kernel is mapInPandas and the only query-keyed exchange is the final
    # skinny top-k window
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" in plan

    got = res.collect()
    brute = {(r.query_vec_id, r.vec_id)
             for r in cosine_topk(emb, list(qrows), k=10).collect()}
    hits = sum(1 for r in got if (r.query_vec_id, r.vec_id) in brute)
    assert hits / len(brute) >= 0.8


def test_head_term_in_every_doc(spark, tmp_path):
    """The 'the'-case: one term present in EVERY doc. The salted build must
    distribute it across (term, shard) groups bounded by shard size, and
    scoring must stay rank-identical to the oracle."""
    n = 3000
    rows = [
        (i, f"the filler{i % 97} mid{i % 13} " + ("common " if i % 2 else "rare "))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "skew_ix")
    params = BuildParams(num_shards=8, salt_factor=4, num_term_buckets=8,
                         lineage_groups=2)
    build_index(df, d, params, "skew")
    ix = Index(spark, d)

    # "the" must be split into one posting list per shard, each bounded
    blocks = ix.postings().filter(F.col("term") == "the")
    per_shard = {r.shard_id: r.n for r in
                 blocks.groupBy("shard_id").agg(
                     F.sum("n_docs").alias("n")).collect()}
    # count-quantile span derivation (provided scheme) may shard FINER than
    # num_shards (never coarser than the fragmentation budget); the bound
    # that matters is that no shard concentrates the term
    assert params.num_shards // 2 <= len(per_shard) <= 64 * params.num_shards
    assert sum(per_shard.values()) == n
    assert max(per_shard.values()) <= 2 * (n // params.num_shards) + 1

    oracle = OracleIndex.build(rows)
    queries = [(0, "the"), (1, "the common"), (2, "rare mid5")]
    got = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                 for r in index_search(ix, queries, k=10).collect())
    want = sorted((q, rk, did, round(s, 9))
                  for q, rk, did, s in oracle.search_all(queries, k=10))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-9)


def test_tune_n_probe_reaches_target(spark, tmp_path):
    """Probe-to-recall auto-tune: walking n_probe from the sqrt default
    must reach the target recall (full probe is exact, so target 1.0 is
    always reachable), the curve must be monotone in probe count on this
    data, and the returned n_probe must actually deliver the recall."""
    from sparkbm25.pipeline.similarity import tune_n_probe

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = str(tmp_path / "ann_tune")
    build_ann_index(emb, d, n_centroids=8)
    qrows = {r.vec_id: list(r.embedding)
             for r in emb.filter(F.col("vec_id") < 5).collect()}

    out = tune_n_probe(spark, d, qrows, k=10, target_recall=1.0)
    assert out["met"] and out["recall"] == 1.0
    assert out["n_probe"] <= 8
    probes = [c["n_probe"] for c in out["curve"]]
    assert probes == sorted(probes)
    # a modest target stops earlier (or at the same probe) than the exact one
    out9 = tune_n_probe(spark, d, qrows, k=10, target_recall=0.9)
    assert out9["met"] and out9["n_probe"] <= out["n_probe"]
    # the chosen n_probe reproduces the measured recall when searched again
    got = {}
    for r in ann_index_search(spark, d, qrows, k=10, n_probe=out9["n_probe"]).collect():
        got.setdefault(r.query_vec_id, set()).add(r.vec_id)
    brute = {}
    for r in cosine_topk(emb, list(qrows), k=10).collect():
        brute.setdefault(r.query_vec_id, set()).add(r.vec_id)
    rec = sum(len(got[q] & brute[q]) / len(brute[q]) for q in brute) / len(brute)
    assert abs(rec - out9["recall"]) < 1e-9
    # out-of-range probe points clamp to the exact full probe instead of
    # yielding an empty curve (which used to crash): all-beyond-n_centroids
    # lists measure exactly one full-probe point at recall 1.0
    clamped = tune_n_probe(spark, d, qrows, k=10, target_recall=1.0,
                           probes=[64, 128])
    assert clamped["curve"] == [clamped["curve"][0]]
    assert clamped["n_probe"] == 8 and clamped["recall"] == 1.0
    with pytest.raises(ValueError, match="probes"):
        tune_n_probe(spark, d, qrows, k=10, probes=[0, -3])


def test_ann_index_compact_preserves_results(spark, tmp_path):
    """Vector-store segment merge: N appends fragment the partitioned
    store; compaction rewrites it (fewer files) with IDENTICAL search
    results and row count, centroids/manifest frozen."""
    import glob

    from sparkbm25.pipeline.similarity import ann_index_append, ann_index_compact

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = str(tmp_path / "ann_cmp")
    lo = emb.filter(F.col("vec_id") < 300)
    build_ann_index(lo, d, n_centroids=8)
    # three fragmenting appends
    for a, b in ((300, 380), (380, 450), (450, 10**9)):
        ann_index_append(
            spark, d,
            emb.filter((F.col("vec_id") >= a) & (F.col("vec_id") < b)),
        )
    qrows = {r.vec_id: list(r.embedding)
             for r in emb.filter(F.col("vec_id") < 5).collect()}
    before = sorted(
        (r.query_vec_id, r.rank, r.vec_id, r.cos)
        for r in ann_index_search(spark, d, qrows, k=10, n_probe=8).collect()
    )
    files_before = len(glob.glob(f"{d}/vectors/centroid_id=*/*.parquet"))

    m = ann_index_compact(spark, d)
    files_after = len(glob.glob(f"{d}/vectors/centroid_id=*/*.parquet"))
    assert files_after < files_before  # the point of the rewrite
    assert m["metrics"]["vector_compaction_rows"] == emb.count()

    after = sorted(
        (r.query_vec_id, r.rank, r.vec_id, r.cos)
        for r in ann_index_search(spark, d, qrows, k=10, n_probe=8).collect()
    )
    assert after == before
