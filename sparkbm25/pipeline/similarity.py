"""Similarity search over embedding columns (array<float>).

- cosine_topk       exact brute-force top-k per query vector. Arrow kernel:
                    the query block is broadcast as a numpy matrix and each
                    executor batch does one BLAS matmul — the classic
                    distributed brute-force layout (scales linearly in corpus
                    size, constant memory per task).
- cosine_pairs      all pairs with cosine >= threshold (near-dup dedup).
- ivf_topk          IVF-style ANN: deterministic centroid subset, vectors
                    assigned to nearest centroid (map-only), queries probe
                    the top-P centroids — the scale path (reads 1/nlist of
                    the corpus per query at probe=1). Approximate: recall
                    vs brute force asserted in tests, rows-only driver check.

The reference's search analog: benchmarking/search/search_indices.py:13-55
(top-k, k=100, recall vs ground truth); its IVF-PQ compression analog:
core/index_builder/faiss/ivf_pq_build_cagra_config.py:14-56.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPK_SCHEMA = "query_vec_id long, vec_id long, cos double"


def _as_matrix(pdf_col) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in pdf_col])


def _cos_kernel(qids: np.ndarray, qmat: np.ndarray):
    """qmat rows pre-normalized."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = _as_matrix(pdf["embedding"])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            m = m / norms[:, None]
            sims = qmat @ m.T  # (nq, batch)
            nq, nb = sims.shape
            yield pd.DataFrame(
                {
                    "query_vec_id": np.repeat(qids, nb),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), nq),
                    "cos": sims.ravel(),
                }
            )

    return gen


def _query_matrix(df: DataFrame, query_ids: list[int]):
    rows = df.filter(F.col("vec_id").isin(query_ids)).collect()
    by_id = {r.vec_id: r.embedding for r in rows}
    qids = np.array(sorted(by_id), dtype=np.int64)
    qmat = _as_matrix([by_id[i] for i in qids])
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0.0] = 1.0
    return qids, qmat / qn[:, None]


def cosine_topk(df: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self included —
    deterministic rank-1 sanity anchor). Ties broken by ascending vec_id."""
    qids, qmat = _query_matrix(df, query_ids)
    sims = df.select("vec_id", "embedding").mapInPandas(
        _cos_kernel(qids, qmat), schema=TOPK_SCHEMA
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


_DUCK_COS = (
    "(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
)  # float64 cosine — duckdb's list_cosine_similarity is float32 on FLOAT[]


def cosine_topk_sql(query_ids: list[int], k: int = 10,
                    table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = _DUCK_COS.format(a="q.qe", b="e.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe
           FROM {table} WHERE vec_id IN ({ids})),
sims AS (
  SELECT q.query_vec_id, e.vec_id,
         {cos} AS cos
  FROM q CROSS JOIN {table} e
),
ranked AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT query_vec_id, rank, vec_id, round(cos, 6) AS cos
FROM ranked WHERE rank <= {k}
"""


def cosine_pairs(df: DataFrame, threshold: float) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup.
    Brute force n²/2 via the same matmul kernel; the scale path buckets by
    IVF centroid first (near-dups share a centroid at high thresholds)."""
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    m = _as_matrix([r.embedding for r in rows])
    n = np.linalg.norm(m, axis=1)
    n[n == 0.0] = 1.0
    qmat = m / n[:, None]
    sims = df.select("vec_id", "embedding").mapInPandas(
        _cos_kernel(ids, qmat), schema=TOPK_SCHEMA
    )
    return (
        sims.filter(
            (F.col("query_vec_id") < F.col("vec_id"))
            & (F.col("cos") >= threshold)
        )
        .select(
            F.col("query_vec_id").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            F.round("cos", 6).alias("cos"),
        )
    )


def cosine_pairs_sql(threshold: float, table: str = "embeddings") -> str:
    cos = _DUCK_COS.format(a="a.embedding", b="b.embedding")
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cos}, 6) AS cos
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


# ---------------------------------------------------------------------------
# IVF — the ANN scale path


def ivf_assign(df: DataFrame, n_centroids: int) -> tuple[DataFrame, np.ndarray]:
    """Deterministic IVF: centroids = the n_centroids lowest vec_ids
    (seeded subset — no iterative k-means; recorded, reproducible).
    Returns (df + centroid_id column, centroid matrix). Map-only pass."""
    cent_rows = (
        df.orderBy("vec_id").limit(n_centroids).select("vec_id", "embedding").collect()
    )
    cmat = _as_matrix([r.embedding for r in cent_rows])
    cn = np.linalg.norm(cmat, axis=1)
    cn[cn == 0.0] = 1.0
    cmat = cmat / cn[:, None]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = _as_matrix(pdf["embedding"])
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0.0] = 1.0
            sims = (m / nrm[:, None]) @ cmat.T
            pdf = pdf.copy()
            pdf["centroid_id"] = sims.argmax(axis=1).astype(np.int32)
            yield pdf[["vec_id", "embedding", "centroid_id"]]

    out = df.select("vec_id", "embedding").mapInPandas(
        gen, schema="vec_id long, embedding array<float>, centroid_id int"
    )
    return out, cmat


def ivf_topk(
    df: DataFrame, query_ids: list[int], k: int = 10,
    n_centroids: int = 16, n_probe: int = 4,
) -> DataFrame:
    """ANN top-k probing the n_probe nearest centroids per query.
    At scale the assigned table is written partitioned by centroid_id so a
    probe reads n_probe/n_centroids of the corpus (partition pruning)."""
    assigned, cmat = ivf_assign(df, n_centroids)
    qids, qmat = _query_matrix(df, query_ids)
    probes = (qmat @ cmat.T).argsort(axis=1)[:, ::-1][:, :n_probe]
    pairs = [
        (int(q), int(c)) for qi, q in enumerate(qids) for c in probes[qi]
    ]
    spark = df.sparkSession
    probe_df = spark.createDataFrame(pairs, "query_vec_id long, centroid_id int")
    cand = assigned.join(F.broadcast(probe_df), "centroid_id")
    # score candidates per query (kernel reused, filtered to probe buckets)
    sims = cand.select(
        "query_vec_id", "vec_id", "embedding"
    ).groupBy("query_vec_id").applyInPandas(
        _probe_score(dict(zip(qids.tolist(), qmat))),
        schema=TOPK_SCHEMA,
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


def build_ann_index(
    df: DataFrame, index_dir: str, n_centroids: int = 16
) -> dict:
    """Persist an IVF index artifact: vectors partitioned by centroid_id +
    a manifest with the centroid matrix — the vector-side mirror of the
    BM25 index artifact (and of the reference's whole mission: build a
    vector index once, serve top-k from the artifact;
    faiss_index_build_service.py:47-163, ivf list structure analog).

    Probing n_probe of n_centroids reads n_probe/n_centroids of the corpus
    via parquet PARTITION PRUNING on centroid_id — the scale path."""
    import json
    import os

    assigned, cmat = ivf_assign(df, n_centroids)
    os.makedirs(index_dir, exist_ok=True)
    assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(
        os.path.join(index_dir, "vectors")
    )
    manifest = {
        "n_centroids": n_centroids,
        "dim": int(cmat.shape[1]),
        "metric": "cosine",
        "centroids": [[float(x) for x in row] for row in cmat],
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def ann_index_search(
    spark, index_dir: str, query_vecs: dict[int, list[float]],
    k: int = 10, n_probe: int = 4,
) -> DataFrame:
    """Top-k from the persisted IVF artifact. The centroid_id filter is a
    partition filter → only n_probe/n_centroids of the files are read."""
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    cmat = np.asarray(manifest["centroids"], dtype=np.float64)
    qids = np.array(sorted(query_vecs), dtype=np.int64)
    qmat = _as_matrix([query_vecs[int(i)] for i in qids])
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0.0] = 1.0
    qmat = qmat / qn[:, None]
    probes = (qmat @ cmat.T).argsort(axis=1)[:, ::-1][:, :n_probe]
    pairs = [(int(q), int(c)) for qi, q in enumerate(qids) for c in probes[qi]]
    probe_df = spark.createDataFrame(pairs, "query_vec_id long, centroid_id int")
    vectors = spark.read.parquet(os.path.join(index_dir, "vectors"))
    cand = vectors.join(F.broadcast(probe_df), "centroid_id")
    sims = cand.groupBy("query_vec_id").applyInPandas(
        _probe_score(dict(zip(qids.tolist(), qmat))), schema=TOPK_SCHEMA
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


def _probe_score(qvecs: dict[int, np.ndarray]):
    def score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (qid,) = key
        qv = qvecs[int(qid)]
        m = _as_matrix(pdf["embedding"])
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0.0] = 1.0
        cos = (m / nrm[:, None]) @ qv
        return pd.DataFrame(
            {"query_vec_id": int(qid), "vec_id": pdf["vec_id"], "cos": cos}
        )

    return score
