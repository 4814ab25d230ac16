"""Similarity search over embedding columns (array<float>).

- cosine_topk       exact brute-force top-k per query vector. Arrow kernel:
                    the query block is broadcast as a numpy matrix and each
                    executor batch does one BLAS matmul — the classic
                    distributed brute-force layout (scales linearly in corpus
                    size, constant memory per task).
- cosine_pairs      EXACT all pairs with cosine >= threshold, as a blocked
                    tile self-join: vectors are hashed into B blocks, the
                    B(B+1)/2 unordered block tiles are cogrouped, and each
                    task matmuls one tile. No driver-side corpus
                    materialization; per-task memory = 2 blocks. Compute is
                    inherently O(n^2) — that is the contract of an exact
                    threshold join; at scale use cosine_pairs_lsh when the
                    threshold has angular margin.
- cosine_pairs_lsh  random-hyperplane banded LSH + exact verification — the
                    scale path (near-linear) when true pairs sit well above
                    the bulk. Mirrors dedup.minhash_lsh_pairs' shape.
- ivf_topk / index  IVF ANN: sampled spherical k-means centroids (seeded,
                    deterministic), vectors assigned map-only, queries probe
                    the top-P centroids; search is a partition-local partial
                    top-k mapInPandas kernel — NO shuffle keyed on query id
                    before the final skinny top-k window.

The reference's search analog: benchmarking/search/search_indices.py:13-55
(top-k, k=100, recall vs ground truth); its IVF-PQ training-on-a-sample
analog: core/index_builder/faiss/ivf_pq_build_cagra_config.py:14-56 and the
benchmark grid's trainset_fraction knob (benchmarking/benchmarks.yml).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..localrel import local_df

TOPK_SCHEMA = "query_vec_id long, vec_id long, cos double"
PAIRS_SCHEMA = "vec_a long, vec_b long, cos double"


def _as_matrix(pdf_col) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in pdf_col])


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0.0] = 1.0
    return m / n[:, None]


def _cos_kernel(qids: np.ndarray, qmat: np.ndarray):
    """qmat rows pre-normalized."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = _norm_rows(_as_matrix(pdf["embedding"]))
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
    return qids, _norm_rows(qmat)


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


# ---------------------------------------------------------------------------
# Exact pairwise threshold join — blocked tiles, fully distributed


def cosine_pairs(df: DataFrame, threshold: float, n_blocks: int = 8) -> DataFrame:
    """All pairs (vec_a < vec_b) with cosine >= threshold — EXACT embedding
    near-dup. Vectors hash into n_blocks blocks (xxhash64 — uniform, skew-
    free); each of the B(B+1)/2 unordered tiles is one cogrouped task doing
    one BLAS matmul. Nothing is collected to the driver and per-task memory
    is 2 * (n/B) vectors — pick n_blocks so a block fits an executor
    (n_blocks ~ n*dim*8B / task_budget at scale). Compute stays O(n^2):
    that's what an exact threshold says; cosine_pairs_lsh is the near-linear
    path when the threshold has margin over the bulk."""
    spark = df.sparkSession
    tiles = local_df(
        spark, [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    base = df.select("vec_id", "embedding").withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    )
    # tag each row with the tiles it participates in, once per side; a
    # union (not a self-join) avoids ambiguous-lineage issues and one
    # groupBy(tile) holds exactly the two blocks of that tile
    left = base.join(F.broadcast(tiles), base["blk"] == tiles["bi"]).select(
        "bi", "bj", "vec_id", "embedding", F.lit(0).alias("side")
    )
    right = base.join(F.broadcast(tiles), base["blk"] == tiles["bj"]).select(
        "bi", "bj", "vec_id", "embedding", F.lit(1).alias("side")
    )

    def tile_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[0]), int(key[1])
        lpdf = pdf[pdf["side"] == 0]
        rpdf = pdf[pdf["side"] == 1]
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})
        lm = _norm_rows(_as_matrix(lpdf["embedding"]))
        rm = _norm_rows(_as_matrix(rpdf["embedding"]))
        sims = lm @ rm.T
        lid = lpdf["vec_id"].to_numpy()
        rid = rpdf["vec_id"].to_numpy()
        mask = sims >= threshold
        if bi == bj:  # same block on both sides: emit each pair once
            mask &= lid[:, None] < rid[None, :]
        ii, jj = np.nonzero(mask)
        a, b = lid[ii], rid[jj]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cos": np.round(sims[ii, jj], 6),
            }
        )

    return (
        left.unionByName(right)
        .groupby("bi", "bj")
        .applyInPandas(tile_kernel, schema=PAIRS_SCHEMA)
    )


# above this threshold random-hyperplane banding has real angular margin
# (per-bit collision p = 1 - arccos(c)/pi >= 0.745 at c=0.7, so 32x8-bit
# banding misses a true pair w.p. <= 2e-3 and candidates stay sparse);
# below it the bulk of the distribution collides and LSH degenerates —
# the exact tile join is the honest plan there.
LSH_MARGIN_THRESHOLD = 0.7


def auto_n_blocks(
    n: int,
    dim: int,
    task_budget_bytes: int = 256 << 20,
    parallelism: int = 32,
) -> int:
    """Derive cosine_pairs' n_blocks from corpus stats — the
    planner.admission_check analog for the tile join (the reference sizes
    its build from (n, dim, m, dtype) the same way, app/utils/memory.py).

    Three lower bounds, take the max:
    - memory: a task holds TWO blocks as float64 matrices (plus the
      normalized copy) -> 2 * (n/B) * dim * 8 * overhead <= budget
    - sims tile: the (n/B)^2 float64 similarity matrix must also fit
    - parallelism: B(B+1)/2 tiles should cover the cluster's cores
    """
    import math

    if n <= 0:
        return 1
    overhead = 2.5  # raw arrow column + float64 matrix + normalized copy
    mem_bound = math.ceil(2 * n * dim * 8 * overhead / task_budget_bytes)
    sims_bound = math.ceil(n / math.sqrt(task_budget_bytes / 8))
    par_bound = math.ceil((math.sqrt(8 * parallelism + 1) - 1) / 2)
    return max(1, mem_bound, sims_bound, par_bound)


def cosine_pairs_auto(
    df: DataFrame,
    threshold: float,
    task_budget_bytes: int = 256 << 20,
    margin_threshold: float = LSH_MARGIN_THRESHOLD,
    exact: bool | None = None,
) -> DataFrame:
    """Threshold-pair router — the driver-facing entry point.

    Margin thresholds (>= margin_threshold) route to the near-linear
    cosine_pairs_lsh; bulk thresholds run the exact tile join with n_blocks
    DERIVED from (count, dim) so a tile always fits the task budget, and a
    warning names the O(n^2) contract when the compute is genuinely large
    (the admission-control analog: here the exact semantics are the user's
    explicit ask, so we warn-and-run rather than refuse).

    ``exact`` pins the semantics instead of letting the threshold decide:
    ``exact=True`` always runs the tile join (no silent approximation —
    LSH misses a true pair at cosine c with probability up to ~2e-3 at
    c=0.7); ``exact=False`` always runs LSH (caller accepts the miss
    probability, e.g. after measuring their data's margin). With the
    default ``exact=None`` the router decides by threshold and WARNS when
    it picks the approximate path, so no caller gets probabilistic
    semantics without a runtime signal."""
    import warnings

    if exact is None and threshold >= margin_threshold:
        warnings.warn(
            f"cosine_pairs_auto: threshold {threshold} >= margin point "
            f"{margin_threshold} routes to APPROXIMATE banded LSH "
            "(per-pair miss probability up to ~2e-3 at cosine 0.7, "
            "falling fast with similarity); pass exact=True to force the "
            "exact tile join, or exact=False to silence this",
            stacklevel=2,
        )
        return cosine_pairs_lsh(df, threshold)
    if exact is False:
        return cosine_pairs_lsh(df, threshold)
    row = df.agg(
        F.count("vec_id").alias("n"), F.min(F.size("embedding")).alias("d")
    ).first()
    n, dim = int(row["n"] or 0), int(row["d"] or 0)
    par = df.sparkSession.sparkContext.defaultParallelism
    n_blocks = auto_n_blocks(n, dim, task_budget_bytes, parallelism=par)
    if n * n * dim > 1e12:
        warnings.warn(
            f"cosine_pairs_auto: exact threshold join over n={n} vectors is "
            f"O(n^2) by contract (~{n * n * dim:.1e} flops across "
            f"{n_blocks * (n_blocks + 1) // 2} tiles); if the threshold has "
            f"angular margin use cosine_pairs_lsh instead",
            stacklevel=2,
        )
    return cosine_pairs(df, threshold, n_blocks=n_blocks)


def cosine_pairs_sql(threshold: float, table: str = "embeddings") -> str:
    cos = _DUCK_COS.format(a="a.embedding", b="b.embedding")
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cos}, 6) AS cos
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float,
    n_bands: int = 32,
    band_bits: int = 8,
    seed: int = 0x5EED,
) -> DataFrame:
    """Near-dup pairs via banded random-hyperplane LSH, candidates verified
    with the exact cosine — near-linear scale path. A pair at cosine c
    matches one hyperplane bit w.p. p = 1 - arccos(c)/pi, so its miss
    probability is (1 - p^band_bits)^n_bands: at c=0.9 the default
    (32 bands x 8 bits) misses ~2e-8; at c=0.8, ~1e-4. SOUND ONLY when true
    pairs sit above the bulk with margin — for a bulk threshold (e.g. 0.4 on
    near-uniform data, where p=0.63 makes banding degenerate) use the exact
    cosine_pairs. Same shape as dedup.minhash_lsh_pairs: map-only signature
    kernel -> band self-join -> exact verification of candidates."""
    first = df.select(F.size(F.col("embedding")).alias("d")).first()
    dim = int(first["d"]) if first else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * band_bits, dim))
    weights = (1 << np.arange(band_bits, dtype=np.int64))

    def sig_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = _as_matrix(pdf["embedding"])
            bits = (m @ planes.T) >= 0.0  # (n, bands*bits)
            sigs = bits.reshape(len(m), n_bands, band_bits) @ weights  # (n, bands)
            vid = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vid, n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(m)),
                    "sig": sigs.ravel(),
                }
            )

    sig = df.select("vec_id", "embedding").mapInPandas(
        sig_kernel, schema="vec_id long, band int, sig long"
    )
    # materialize once: the self-join would otherwise run the full-corpus
    # signature kernel twice (same pattern as dedup.minhash_lsh_pairs)
    sig = sig.localCheckpoint(eager=True)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    emb = df.select("vec_id", "embedding")
    pairs = (
        cand.join(
            emb.select(
                F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
            ),
            "vec_a",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
            ),
            "vec_b",
        )
        .select("vec_a", "vec_b", "emb_a", "emb_b")
    )

    def verify_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            am = _norm_rows(_as_matrix(pdf["emb_a"]))
            bm = _norm_rows(_as_matrix(pdf["emb_b"]))
            cos = np.einsum("ij,ij->i", am, bm)
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "cos": np.round(cos[keep], 6),
                }
            )

    return pairs.mapInPandas(verify_kernel, schema=PAIRS_SCHEMA)


# ---------------------------------------------------------------------------
# IVF — the ANN scale path


def _kmeans_centroids(
    df: DataFrame,
    n_centroids: int,
    sample_size: int = 4096,
    n_iter: int = 10,
    seed: int = 0x5EED,
    restarts: int = 4,
) -> np.ndarray:
    """Spherical k-means trained on a deterministic sample (lowest
    xxhash64(vec_id) — uniform over the corpus, reproducible across runs;
    rows then ordered by vec_id so the result doesn't depend on hash order).
    The driver holds only the bounded sample, never the corpus — the
    reference trains IVF on a trainset_fraction sample the same way
    (benchmarking/benchmarks.yml, ivf_pq_build_cagra_config.py:14-56).
    Rows are normalized, assignment maximizes dot product, centroids are
    re-normalized means, empty clusters keep their previous position.
    Seeded multi-restart: the restart with the best objective (sum of max
    cosine to a centroid) wins — deterministic, and shields recall from a
    bad random init."""
    rows = (
        df.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
        .limit(sample_size)
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    m = _norm_rows(_as_matrix([r.embedding for r in rows]))
    if len(m) <= n_centroids:
        # degenerate corpus: every sampled vector is a centroid. Return
        # ONLY the real rows — zero-padding to n_centroids would create
        # cosine-0 phantom centroids that outrank real ones for queries
        # with all-negative sims and silently eat probe slots (callers
        # treat n_centroids as an upper bound).
        return m

    best: tuple[float, np.ndarray] | None = None
    for r in range(restarts):
        rng = np.random.default_rng(seed + r)
        idx = rng.choice(len(m), size=n_centroids, replace=False)
        cmat = m[np.sort(idx)].copy()
        for _ in range(n_iter):
            assign = (m @ cmat.T).argmax(axis=1)
            for j in range(n_centroids):
                mem = m[assign == j]
                if len(mem):
                    v = mem.sum(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        cmat[j] = v / nv
        obj = float((m @ cmat.T).max(axis=1).sum())
        if best is None or obj > best[0]:
            best = (obj, cmat)
    return best[1]


def _assign_to_centroids(df: DataFrame, cmat: np.ndarray) -> DataFrame:
    """Map-only nearest-centroid assignment (ties -> lowest centroid id,
    deterministic) — ONE definition shared by build-time assignment and
    ann_index_append, so the two can never drift apart."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = _norm_rows(_as_matrix(pdf["embedding"]))
            sims = m @ cmat.T
            pdf = pdf.copy()
            pdf["centroid_id"] = sims.argmax(axis=1).astype(np.int32)
            yield pdf[["vec_id", "embedding", "centroid_id"]]

    return df.select("vec_id", "embedding").mapInPandas(
        gen, schema="vec_id long, embedding array<float>, centroid_id int"
    )


def ivf_assign(
    df: DataFrame,
    n_centroids: int | None = None,
    sample_size: int | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """IVF assignment: seeded sampled k-means centroids (see
    _kmeans_centroids), then a map-only pass assigning every vector to its
    nearest centroid. Returns (df + centroid_id column, centroid matrix).

    n_centroids/sample_size default to planner.auto_ann_params(count) —
    the sqrt(n) rule (index_builder_utils.py:29-41 analog); pass explicit
    values to override."""
    if n_centroids is None:
        from ..planner import auto_ann_params

        auto = auto_ann_params(df.count())  # one column-pruned count job
        n_centroids = auto.n_centroids
        if sample_size is None:
            sample_size = auto.sample_size
    if sample_size is None:
        # explicit n_centroids, auto sample: no count needed — the sample
        # rule depends only on the centroid count
        sample_size = min(max(4096, 32 * n_centroids), 1 << 20)
    cmat = _kmeans_centroids(df, n_centroids, sample_size=sample_size)
    return _assign_to_centroids(df, cmat), cmat


def _probe_table(qids: np.ndarray, qmat: np.ndarray, cmat: np.ndarray,
                 n_probe: int) -> dict[int, np.ndarray]:
    """centroid_id -> array of query ROW indices probing it. Deterministic:
    per query, centroids ordered by (-dot, centroid_id)."""
    qc = qmat @ cmat.T  # (nq, nc)
    nc = cmat.shape[0]
    order = np.lexsort((np.broadcast_to(np.arange(nc), qc.shape), -qc), axis=1)
    probes = order[:, : min(n_probe, nc)]
    table: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probes[qi]:
            table.setdefault(int(c), []).append(qi)
    return {c: np.asarray(v, dtype=np.int64) for c, v in table.items()}


def _ivf_search_kernel(qids: np.ndarray, qmat: np.ndarray,
                       probe_sets: dict[int, np.ndarray], k: int):
    """Partition-local partial top-k: each Arrow batch is grouped by
    centroid_id, scored against only the queries probing that centroid, and
    reduced to the per-batch survivors (everything >= the batch's k-th best
    per query — tie-inclusive, so the global top-k under (-cos, vec_id) is
    preserved exactly). Output is skinny (query, vec, cos) rows; the only
    shuffle keyed on query id is the final global top-k window over
    ~n_queries*k*n_batches rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            for cid, grp in pdf.groupby("centroid_id"):
                qidx = probe_sets.get(int(cid))
                if qidx is None or len(qidx) == 0:
                    continue
                m = _norm_rows(_as_matrix(grp["embedding"]))
                sims = qmat[qidx] @ m.T  # (nq_sub, nb)
                vid = grp["vec_id"].to_numpy()
                nb = sims.shape[1]
                kk = min(k, nb)
                # per-row k-th largest; keep everything >= it (ties included)
                thr = np.partition(sims, nb - kk, axis=1)[:, nb - kk]
                ii, jj = np.nonzero(sims >= thr[:, None])
                yield pd.DataFrame(
                    {
                        "query_vec_id": qids[qidx][ii],
                        "vec_id": vid[jj],
                        "cos": sims[ii, jj],
                    }
                )

    return gen


def _topk_window(sims: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


def ivf_topk(
    df: DataFrame, query_ids: list[int], k: int = 10,
    n_centroids: int | None = None, n_probe: int | None = None,
) -> DataFrame:
    """ANN top-k probing the n_probe nearest centroids per query.
    At scale the assigned table is written partitioned by centroid_id so a
    probe reads n_probe/n_centroids of the corpus (partition pruning — see
    build_ann_index/ann_index_search for the persisted form).
    n_centroids/n_probe default to the sqrt(n) auto rule."""
    assigned, cmat = ivf_assign(df, n_centroids)
    if n_probe is None:
        import math

        n_probe = max(4, math.isqrt(cmat.shape[0]))
    qids, qmat = _query_matrix(df, query_ids)
    probe_sets = _probe_table(qids, qmat, cmat, n_probe)
    cand = assigned.filter(
        F.col("centroid_id").isin([int(c) for c in probe_sets])
    )
    sims = cand.select("vec_id", "embedding", "centroid_id").mapInPandas(
        _ivf_search_kernel(qids, qmat, probe_sets, k), schema=TOPK_SCHEMA
    )
    return _topk_window(sims, k)


def build_ann_index(
    df: DataFrame, index_dir: str, n_centroids: int | None = None
) -> dict:
    """Persist an IVF index artifact: vectors partitioned by centroid_id +
    a manifest with the centroid matrix — the vector-side mirror of the
    BM25 index artifact (and of the reference's whole mission: build a
    vector index once, serve top-k from the artifact;
    faiss_index_build_service.py:47-163, ivf list structure analog).

    Probing n_probe of n_centroids reads n_probe/n_centroids of the corpus
    via parquet PARTITION PRUNING on centroid_id — the scale path.
    n_centroids=None derives max(16, floor(sqrt(n))) via
    planner.auto_ann_params (the reference's n_lists rule); the manifest
    records the derived default_n_probe for searches to inherit."""
    from ..jobs import artifact_lock

    with artifact_lock(index_dir, "ann-build"):
        import os

        from ..ioutil import write_json_atomic

        assigned, cmat = ivf_assign(df, n_centroids)
        os.makedirs(index_dir, exist_ok=True)
        assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(
            os.path.join(index_dir, "vectors")
        )
        import math

        manifest = {
            # actual count, not the requested upper bound (degenerate corpora
            # train fewer centroids than asked)
            "n_centroids": int(cmat.shape[0]),
            "dim": int(cmat.shape[1]),
            "metric": "cosine",
            "default_n_probe": max(4, math.isqrt(int(cmat.shape[0]))),
            "centroids": [[float(x) for x in row] for row in cmat],
        }
        write_json_atomic(os.path.join(index_dir, "manifest.json"), manifest)
        return manifest


def ann_index_append(
    spark, index_dir: str, new_vecs: DataFrame, audit_ids: bool = True
) -> dict:
    """Fold new vectors INTO the persisted IVF artifact: assign them to the
    STORED centroids (map-only — centroids stay frozen like the BM25
    streaming contract's corpus stats; re-train via periodic rebuild) and
    append to the partitioned vector store. Searches pick the new rows up
    on the next read.

    Validates the batch UP FRONT instead of failing deep in the numpy
    kernel: embedding width must equal the manifest's dim, and (unless
    audit_ids=False — callers that enforce disjointness upstream, like the
    streaming ingest's collision audit) new vec_ids must be disjoint from
    the stored ones, else searches would return duplicate rows."""
    from ..jobs import artifact_lock

    with artifact_lock(index_dir, "ann-append"):
        import json
        import os

        mpath = os.path.join(index_dir, "manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        cmat = np.asarray(manifest["centroids"], dtype=np.float64)
        dim = int(manifest["dim"])
        vec_dir = os.path.join(index_dir, "vectors")
        bad = (
            new_vecs.select(F.size("embedding").alias("d"))
            .filter(F.col("d") != dim)
            .first()
        )
        if bad is not None:
            raise ValueError(
                f"ann_index_append: batch has embeddings of dim {bad['d']}, "
                f"index at {index_dir} was built with dim {dim}"
            )
        if audit_ids:
            stored_ids = spark.read.parquet(vec_dir).select("vec_id")
            n_dup = new_vecs.select("vec_id").join(stored_ids, "vec_id").count()
            if n_dup:
                raise ValueError(
                    f"ann_index_append: {n_dup} vec_ids in the batch already "
                    f"exist in the index at {index_dir}; appending would "
                    "duplicate search results (pass audit_ids=False only if "
                    "disjointness is enforced upstream)"
                )
        _assign_to_centroids(new_vecs, cmat).write.partitionBy(
            "centroid_id"
        ).mode("append").parquet(vec_dir)
        return manifest


def ann_index_search(
    spark, index_dir: str, query_vecs: dict[int, list[float]],
    k: int = 10, n_probe: int | None = None,
) -> DataFrame:
    """Top-k from the persisted IVF artifact. The centroid_id IN (...)
    filter is a partition filter -> only n_probe/n_centroids of the files
    are read; scoring is the partition-local partial-top-k kernel (no
    per-query group shuffle — the old groupBy(query).applyInPandas funneled
    a query's whole probed candidate set through one task).
    n_probe=None inherits the manifest's default_n_probe (sqrt rule)."""
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    cmat = np.asarray(manifest["centroids"], dtype=np.float64)
    if n_probe is None:
        n_probe = int(manifest.get("default_n_probe")
                      or max(4, int(len(cmat) ** 0.5)))
    qids = np.array(sorted(query_vecs), dtype=np.int64)
    qmat = _norm_rows(_as_matrix([query_vecs[int(i)] for i in qids]))
    probe_sets = _probe_table(qids, qmat, cmat, n_probe)
    vectors = spark.read.parquet(os.path.join(index_dir, "vectors"))
    cand = vectors.filter(
        F.col("centroid_id").isin([int(c) for c in probe_sets])
    )
    sims = cand.select("vec_id", "embedding", "centroid_id").mapInPandas(
        _ivf_search_kernel(qids, qmat, probe_sets, k), schema=TOPK_SCHEMA
    )
    return _topk_window(sims, k)


def tune_n_probe(
    spark, index_dir: str, query_vecs: dict[int, list[float]],
    k: int = 10, target_recall: float = 0.9,
    probes: list[int] | None = None,
) -> dict:
    """Probe-to-recall auto-tune over a persisted IVF artifact: walk
    n_probe up (doubling from the manifest's sqrt-rule default) until
    measured recall@k on the given sample queries reaches the target, and
    return the chosen n_probe plus the measured curve. With an explicit
    ``probes`` list, EVERY listed point is measured (no early stop) and
    the chosen n_probe is the smallest meeting the target (else the
    last) — this sweep mode is what bench.py's recall curve runs, so the
    benchmark and the tuning API share one recall measurement instead of
    two drifting implementations. Curve entries carry per-point wall
    seconds (``search_s``).

    The reference exposes the same trade-off as a benchmark-time ef_search
    sweep (benchmarking/benchmarks.yml:14-15, search_indices.py:41-44
    recall-vs-ground-truth); here it is a first-class API so a pipeline
    can pin its own recall target instead of shipping a magic n_probe.
    Ground truth is exact brute-force cosine over the SAME stored vectors
    (one full scan per tune — a tuning-time cost, amortized over every
    search that then runs at the chosen n_probe).

    Returns {"n_probe", "recall", "target_recall", "met", "curve":
    [{"n_probe", "recall"}...]} — "met" False means even a full probe
    (n_probe = n_centroids, which scans every list and is EXACT for the
    stored vectors) fell short, which can only happen if k exceeds
    distinct stored neighbors; callers should treat that as data, not
    retry."""
    import json
    import os
    import time

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    n_cent = int(manifest["n_centroids"])
    vectors = spark.read.parquet(os.path.join(index_dir, "vectors"))

    qids = np.array(sorted(query_vecs), dtype=np.int64)
    qmat = _norm_rows(_as_matrix([query_vecs[int(i)] for i in qids]))
    exact_df = _topk_window(
        vectors.select("vec_id", "embedding").mapInPandas(
            _cos_kernel(qids, qmat), schema=TOPK_SCHEMA
        ),
        k,
    )
    exact: dict[int, set] = {}
    for r in exact_df.collect():
        exact.setdefault(int(r.query_vec_id), set()).add(int(r.vec_id))

    def measure(n_probe: int) -> dict:
        t0 = time.time()
        got: dict[int, set] = {}
        for r in ann_index_search(
            spark, index_dir, query_vecs, k=k, n_probe=n_probe
        ).collect():
            got.setdefault(int(r.query_vec_id), set()).add(int(r.vec_id))
        recall = (
            sum(
                len(got.get(q, set()) & t) / len(t)
                for q, t in exact.items()
            ) / len(exact)
            if exact else 1.0
        )
        return {
            "n_probe": n_probe,
            "recall": round(recall, 4),
            "search_s": round(time.time() - t0, 3),
        }

    curve = []
    if probes is not None:
        # clamp out-of-range points to the exact full probe instead of
        # skipping them — a list whose entries ALL exceed n_centroids must
        # still measure something (an empty curve would crash below), and
        # the full-probe point is the honest stand-in for "probe more than
        # exists". Dedup after clamping so one full-probe measurement
        # serves every clamped entry.
        clamped, seen = [], set()
        for p in probes:
            p = min(int(p), n_cent)
            if p >= 1 and p not in seen:
                seen.add(p)
                clamped.append(p)
        if not clamped:
            raise ValueError(
                f"probes {probes!r} contains no usable point (n_centroids="
                f"{n_cent}); pass at least one integer >= 1"
            )
        for p in clamped:
            curve.append(measure(p))
        chosen = next(
            (c for c in curve if c["recall"] >= target_recall), curve[-1]
        )
    else:
        n_probe = int(manifest.get("default_n_probe") or 4)
        n_probe = min(max(1, n_probe), n_cent)
        while True:
            curve.append(measure(n_probe))
            if curve[-1]["recall"] >= target_recall or n_probe >= n_cent:
                break
            n_probe = min(n_cent, n_probe * 2)
        chosen = curve[-1]
    return {
        "n_probe": chosen["n_probe"],
        "recall": chosen["recall"],
        "target_recall": target_recall,
        "met": chosen["recall"] >= target_recall,
        "curve": curve,
    }


def ann_index_compact(spark, index_dir: str) -> dict:
    """Rewrite the IVF vector store partition-by-partition — the vector
    artifact's segment merge. Every ann_index_append adds one parquet file
    set per centroid partition; a long-running ingest accumulates small
    files until probe-time file listing and row-group overhead dominate
    (the same fragmentation compact_index solves for the BM25 postings).
    Centroids, assignments and the manifest are untouched — this is a
    pure physical rewrite (assignment is a deterministic function of the
    frozen centroids), audited by an exact row-count check before swap.
    Holds the artifact lock, so appends/builds/compactions of one index
    exclude each other (a lock-free compact could silently delete a
    concurrent append's rows: both audit counts predate the append).
    Staging keeps concurrent searches off half-written data, but the
    rename swap itself is a maintenance window (a reader between the two
    renames sees a missing dir and fails loudly, never reads wrong data);
    refresh search handles afterwards."""
    from ..jobs import artifact_lock

    with artifact_lock(index_dir, "ann-compact"):
        import json
        import os
        import shutil

        from ..ioutil import write_json_atomic

        mpath = os.path.join(index_dir, "manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        vec_dir = os.path.join(index_dir, "vectors")
        staging = os.path.join(index_dir, "vectors_compacting")
        shutil.rmtree(staging, ignore_errors=True)
        vectors = spark.read.parquet(vec_dir)
        n_before = vectors.count()
        (
            vectors.repartition("centroid_id")
            .write.partitionBy("centroid_id")
            .mode("overwrite")
            .parquet(staging)
        )
        n_after = spark.read.parquet(staging).count()
        if n_after != n_before:
            raise ValueError(
                f"ann_index_compact dropped rows: {n_before} -> {n_after}; "
                f"staging kept at {staging}"
            )
        old = os.path.join(index_dir, "vectors_old")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(vec_dir, old)
        os.rename(staging, vec_dir)
        shutil.rmtree(old)
        manifest.setdefault("metrics", {})["vector_compaction_rows"] = int(n_after)
        write_json_atomic(mpath, manifest)
        return manifest
