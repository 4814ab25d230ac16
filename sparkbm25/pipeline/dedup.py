"""Deduplication ops for training-data pipelines.

- exact_dedup           hash-groupBy on normalized text (md5)
- shingles / jaccard    token n-gram sets + exact pairwise Jaccard
- minhash signatures    (a·x + b) mod p over JVM-side xxhash64 shingle hashes
- minhash LSH pairs     banded candidate join + exact-Jaccard verification
- simhash               60-bit md5-based simhash + 4-chunk banding
                        (pigeonhole-exact for hamming <= 3)

Scale notes (the part that matters at 100 TB):
- shingle hashing / signatures are pure Catalyst array expressions —
  whole-stage codegen, zero Python, map-only (no shuffle).
- LSH candidate generation self-joins on (band_id, band_key): the shuffle
  key is the band hash, so work is proportional to colliding candidates,
  not n². Hot buckets (boilerplate docs) are the skew risk — the optional
  `max_bucket` cap skips them (an approximation: see minhash_lsh_pairs
  docstring; run exact_dedup first so mega-clusters never reach LSH).
- exact verification joins only candidate pairs back to shingle sets.

Every driver-checked op has a DuckDB oracle-SQL generator; the LSH path is
compared against the *exact* Jaccard SQL — sound because band count is sized
so the miss probability at the threshold is < 1e-7 and candidates are
verified exactly (false positives filtered).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis import DUCKDB_TOKENS, ngrams_col, tokens_col

# minhash parameters: h_i(x) = (a_i * x + b_i) mod P over x = shingle hash
# folded into [0, 2^31). P Mersenne; a,b from a fixed seeded sequence.
MH_P = (1 << 31) - 1
MH_ROWS = 2  # rows per band
MH_BANDS = 64  # bands → 128 hashes
NGRAM = 3


def _mh_params(n: int = MH_ROWS * MH_BANDS) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs (simple LCG, recorded here, no RNG dep)."""
    out = []
    state = 88172645463325252
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = 1 + state % (MH_P - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MH_P
        out.append((a, b))
    return out


def normalized_text(text_col: str = "text") -> Column:
    """Dedup key normalization: the token stream joined by single spaces."""
    return F.array_join(tokens_col(text_col), " ")


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_hash, canonical_doc_id, is_dup): duplicate groups by
    md5 of normalized text; canonical = min doc_id of the group."""
    from pyspark.sql import Window

    h = F.md5(normalized_text(text_col))
    base = df.select("doc_id", h.alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return base.select(
        "doc_id",
        "text_hash",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
    ).withColumn(
        "is_dup", (F.col("doc_id") != F.col("canonical_doc_id")).cast("int")
    )


def exact_dedup_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         md5(array_to_string({toks}, ' ')) AS text_hash
  FROM {table}
)
SELECT doc_id, text_hash,
       min(doc_id) OVER (PARTITION BY text_hash) AS canonical_doc_id,
       CAST(doc_id != min(doc_id) OVER (PARTITION BY text_hash) AS INT) AS is_dup
FROM base
"""


def shingles_col(text_col: str = "text", n: int = NGRAM) -> Column:
    """Distinct token n-gram shingles (space-joined), [] when < n tokens.
    The per-occurrence n-gram builder (and its O(total tokens) shifted-
    slice construction) is shared with textstats.top_ngrams via
    analysis.ngrams_col."""
    return F.array_distinct(ngrams_col(text_col, n))


DUCKDB_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len({t}) - %d, 0) + 1), "
    "i -> array_to_string({t}[i:i+%d], ' ')))" % (NGRAM - 1, NGRAM - 1)
)


def _duckdb_shingles(text_col: str) -> str:
    t = DUCKDB_TOKENS.format(col=text_col)
    return DUCKDB_SHINGLES.format(t=t)


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (a < b, jaccard >= threshold)
    via the shingle inverted index (explode → self-join on shingle).

    max_df (stop-shingle guard, default None = exact): a shingle present in
    k docs contributes k(k-1)/2 candidate rows to the self-join — one
    boilerplate shingle in 10^6 docs is ~10^12 rows, i.e. the whole job.
    With max_df set, shingles whose document frequency exceeds the cap are
    dropped from the INVERTED INDEX ONLY (set sizes stay full), bounding
    per-shingle fan-out to max_df^2/2. This is a documented CONSERVATIVE
    approximation (same pattern as minhash_lsh_pairs' max_bucket): the
    intersection count — and hence the Jaccard estimate — can only shrink,
    so it never emits a false pair; it can miss pairs whose overlap is
    mostly stop-shingles. Exact whenever no shingle's df exceeds the cap."""
    sh = df.select(
        F.col("doc_id"), shingles_col(text_col).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    if max_df is not None:
        # hot-shingle list is tiny by construction (only df>cap survive) —
        # broadcast anti-join, one map-side-combined count shuffle
        hot = (
            ex.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("s")
        )
        ex = ex.join(F.broadcast(hot), "s", "left_anti")
    a, b_ = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b_, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    raw = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    # filter on the RAW value (matches the oracle SQL's WHERE clause);
    # round only in the projection — filtering on the rounded value keeps
    # boundary pairs the oracle drops
    out = (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .filter(raw >= threshold)
        .select("doc_a", "doc_b", F.round(raw, 6).alias("jaccard"))
    )
    return out


def jaccard_pairs_sql(threshold: float, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    shingles = _duckdb_shingles(text_col)
    return f"""
WITH sh AS (
  SELECT {id_col} AS doc_id, {shingles} AS s
  FROM {table}
  WHERE len({shingles}) > 0
),
ex AS (SELECT doc_id, t.s AS shingle FROM sh, unnest(s) AS t(s)),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT doc_a, doc_b,
       round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold}
"""


# driver-side connected-components gate: edge lists at or below this size
# fold locally (numpy pointer-jumping union-find) instead of paying one
# Spark join+shuffle round per propagation step — ~0.3 s per ROUND of pure
# job overhead at tiny edge counts (measured r07: 9 s of rounds for a
# 4.8k-edge graph). The distributed loop remains the at-scale path.
CC_LOCAL_MAX_EDGES = int(
    os.environ.get("SPARKBM25_CC_LOCAL_MAX_EDGES", "2000000")
)


def _cc_local(edges_pdf, spark) -> DataFrame:
    """Union-find via vectorized min-label pointer jumping over a
    driver-resident symmetric edge list: labels converge to each
    component's min doc_id — the same fixpoint (hence bit-identical
    rows) as the distributed propagation."""
    import numpy as np

    u = edges_pdf["u"].to_numpy(dtype=np.int64)
    v = edges_pdf["v"].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = label.copy()
        # neighbor-min gather + pointer jumping (label of label)
        np.minimum.at(label, ui, prev[vi])
        label = np.minimum(label, label[label])
        if np.array_equal(label, prev):
            break
    import pandas as pd

    out = pd.DataFrame(
        {"doc_id": nodes, "cluster_id": nodes[label]}
    )
    return spark.createDataFrame(out, schema="doc_id long, cluster_id long")


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Undirected connected components over an edge list (doc_a, doc_b) →
    (doc_id, cluster_id = min doc_id in the component) — turns near-dup
    PAIRS into dedup GROUPS (keep one per cluster).

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels; converges in O(component
    diameter) rounds (near-dup clusters are clique-ish, diameter ~1-3).
    Spark-first: one DataFrame plan per round (a single groupBy-u shuffle),
    eagerly localCheckpoint-ed to cut lineage; data never leaves the
    cluster — the driver sees only a per-round decimal label-sum used as
    the convergence test (labels decrease monotonically, so the sum is
    strictly decreasing iff anything changed). Iterative fixpoints are not
    expressible in one Catalyst plan — a driver loop over distributed
    rounds is the idiomatic Spark shape; at extreme scale the alternating
    large-star/small-star formulation (Kiveris et al., "Connected
    Components in MapReduce and Beyond") uses these same primitives with
    provably fewer rounds."""
    e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    n_edges = edges.count()  # metadata-cheap on the checkpointed frame
    if n_edges <= CC_LOCAL_MAX_EDGES:
        return _cc_local(edges.toPandas(), pairs.sparkSession)
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    labels = labels.localCheckpoint(eager=True)
    sig = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label").alias("nl")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nl").alias("nmin"))
        )
        labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        new_sig = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if new_sig == sig:
            break
        sig = new_sig
    else:
        # returning partially-propagated labels would silently split a
        # component whose diameter exceeds max_iter — fail loudly instead
        raise ValueError(
            f"connected_components did not converge in {max_iter} rounds "
            "(a component's diameter exceeds it); raise max_iter or use "
            "connected_components_star (log-bounded rounds at any diameter)"
        )
    return labels.select(
        F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_clusters_sql(threshold: float, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB oracle: transitive closure (recursive CTE) over the exact
    Jaccard pairs, min reachable id per node = cluster id."""
    inner = jaccard_pairs_sql(threshold, table, id_col, text_col)
    return f"""
WITH RECURSIVE jp AS (SELECT doc_a, doc_b FROM ({inner}) q),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jp
  UNION ALL
  SELECT doc_b, doc_a FROM jp
),
reach (u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
"""


def _spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition an UNDER-partitioned input up to cluster parallelism
    (guide: input skew / small files). The pipeline's heavy per-row work
    (shingling, signature kernels, tf counting) inherits the scan's
    partitioning, and a small corpus arrives as one or two parquet
    splits — every Arrow kernel then runs on 1-2 cores while the rest of
    the cluster idles (measured at 50k docs / local[32]: the signature
    pass ran as 6 tasks with one straggler owning ~80% of the work).
    Scale-adaptive by construction: a corpus big enough to produce
    >= defaultParallelism scan splits is returned untouched, so no
    shuffle is ever added at real scale."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if n < target else df


def _shingle_hashes(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, xs array<long>) — per-shingle xxhash64 folded to [0, 2^31).
    JVM-side hashing (codegen); the minhash matrix math happens in numpy."""
    sh = shingles_col(text_col)
    xs = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 31)))
    return (
        _spread_small_input(df.select("doc_id", text_col))
        .select("doc_id", xs.alias("xs"))
        .filter(F.size("xs") > 0)
    )


def _ngram_hashes(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, xs array<long>) — xxhash64-of-shingle folded to [0, 2^31),
    PER OCCURRENCE (non-distinct), via one fused Catalyst transform.

    The banding kernel's input only feeds per-doc MINIMA, and min is
    duplicate-insensitive, so skipping array_distinct changes nothing in
    any signature bit while dropping a whole interpreted pass; fusing the
    hash into the same transform that builds each n-gram skips the
    intermediate shingle-string array the shared shingles_col shape
    materializes. Verification and the persisted artifact keep
    shingles_col/_shingle_hashes (set semantics there is load-bearing)."""
    toks_df = _spread_small_input(df.select("doc_id", text_col))
    # The token array is LET-BOUND as a lambda variable (transform over a
    # one-element array) so the optimizer cannot inline the tokenizer into
    # every element access: a plain withColumn("__t", tokens) + transform
    # referencing __t gets project-collapsed into per-SHINGLE re-tokenization
    # (measured 2.3x slower end-to-end); the docs-with-enough-tokens filter
    # runs on a cheap size() instead of the hash chain for the same reason.
    def _hashes(t):
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - (NGRAM - 1)),
            lambda i: F.pmod(
                F.xxhash64(
                    F.concat_ws(
                        " ", *[F.element_at(t, i + j) for j in range(NGRAM)]
                    )
                ),
                F.lit(1 << 31),
            ),
        )

    toks = tokens_col(text_col)
    return (
        toks_df.filter(F.size(toks) >= NGRAM)
        .select(
            "doc_id",
            F.get(F.transform(F.array(toks), _hashes), F.lit(0)).alias("xs"),
        )
    )


def _mod_p(y):
    """Vectorized ``y % MH_P`` for 0 <= y < 2^62 via Mersenne folding
    (MH_P = 2^31 - 1): two shift-and-add folds then one conditional
    subtract — ~3x cheaper than int64 ``%`` and bit-identical to it
    (tests/test_sig_kernel.py proves equality over the full input
    range). The signature kernel is a (n_hashes x n_shingles) matrix of
    exactly this op, so it is the kernel's dominant cost."""
    import numpy as np

    y = (y & MH_P) + (y >> 31)
    y = (y & MH_P) + (y >> 31)
    return np.where(y >= MH_P, y - MH_P, y)


def _sig_minima(xs, starts, A, Bp):
    """Per-segment minima of (A·x + B) mod MH_P — the minhash signature
    matrix — computed BAND-BLOCKED (2 hash rows at a time) with reused
    buffers and the Mersenne fold applied in place.

    The one-shot ``_mod_p(A * xs + B)`` materializes an
    (n_hashes x n_shingles) int64 matrix plus ~4 same-sized temporaries —
    at the driver's sf1.0 scale that is ~80 MB x 5 arrays PER TASK, and
    with 32 tasks resident the kernel is memory-bandwidth-bound. Two rows
    at a time keeps every temporary ~1 MB (xs stays hot in cache across
    the 64 iterations); measured 3.4x on one core at the sf1.0 per-task
    shape, bit-identical output (the in-place fold is _mod_p's exact
    arithmetic; tests/test_sig_kernel.py pins _mod_p itself).

    Returns the (n_hashes, n_segments) int64 minima."""
    import numpy as np

    n_hashes = A.shape[0]
    S = xs.shape[0]
    out = np.empty((n_hashes, len(starts)), dtype=np.int64)
    y = np.empty((2, S), dtype=np.int64)
    t = np.empty((2, S), dtype=np.int64)
    for i in range(0, n_hashes, 2):
        c = min(2, n_hashes - i)
        yv, tv = y[:c], t[:c]
        np.multiply(A[i:i + c], xs[None, :], out=yv)
        yv += Bp[i:i + c]
        np.bitwise_and(yv, MH_P, out=tv)
        yv >>= 31
        yv += tv
        np.bitwise_and(yv, MH_P, out=tv)
        yv >>= 31
        yv += tv
        np.subtract(yv, MH_P, out=yv, where=yv >= MH_P)
        np.minimum.reduceat(yv, starts, axis=1, out=out[i:i + c])
    return out


def _band_keys_from_xs(xs_df: DataFrame, n_bands: int) -> DataFrame:
    """(doc_id, band_id, h0, h1) — the banded LSH join keys as TWO long
    columns, computed in ONE fused Arrow kernel (signature + banding).

    This is the one-shot pair finder's kernel (minhash_lsh_pairs). The
    persisted-artifact path keeps minhash_bands_from_xs' binary ``key``
    layout; here the two raw minhashes ARE the key ((h0, h1) equality is
    exactly byte-key equality), which skips the per-row ``tobytes``
    loop, the second Arrow crossing of the 2x-band-count signature
    arrays, and the JVM round trip between the two kernels that the
    chained signature->banding shape paid."""
    import numpy as np
    import pandas as pd

    assert MH_ROWS == 2, "band key columns are specialized to r=2"
    n_hashes = n_bands * MH_ROWS
    A = np.array([a for a, _ in _mh_params(n_hashes)], dtype=np.int64)[:, None]
    Bp = np.array([b for _, b in _mh_params(n_hashes)], dtype=np.int64)[:, None]

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            lens = pdf["xs"].str.len().to_numpy(dtype=np.int64)
            xs = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in pdf["xs"]]
            )
            starts = np.r_[0, np.cumsum(lens)[:-1]]
            sig = _sig_minima(xs, starts, A, Bp)  # (n_hashes, n)
            # rows 2i / 2i+1 are band i's two minhashes; emit doc-major
            h0 = sig[0::2, :].T.ravel()
            h1 = sig[1::2, :].T.ravel()
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n_bands),
                    "band_id": np.tile(np.arange(n_bands, dtype=np.int32), n),
                    "h0": h0,
                    "h1": h1,
                }
            )

    return xs_df.mapInPandas(
        gen, schema="doc_id long, band_id int, h0 long, h1 long"
    )


def minhash_signature_from_xs(
    xs_df: DataFrame, n_bands: int = MH_BANDS
) -> DataFrame:
    """(doc_id, n_sh, sig array<long>) — n_bands*MH_ROWS minhashes over
    precomputed hashed shingle arrays (doc_id, xs). Min is
    duplicate-insensitive, so raw or array_distinct xs give the same
    signature. Signature cost is linear in n_bands: b=32 (64 hashes)
    halves the kernel work of the default b=64; the banding miss
    probability trade-off is quantified in minhash_lsh_pairs.

    Split of labor: Catalyst computes xxhash64 per shingle (JVM codegen);
    an Arrow kernel does min over (a_i·x + b_i) mod P for the hash
    functions as one numpy matrix op + minimum.reduceat over doc segments.
    (A pure-Catalyst nested transform/array_min expression evaluates
    interpreted per element — measured ~50s for 500 docs; the kernel does
    the same in <1s.) Map-only at any corpus size."""
    import numpy as np
    import pandas as pd

    n_hashes = n_bands * MH_ROWS
    A = np.array([a for a, _ in _mh_params(n_hashes)], dtype=np.int64)[:, None]
    Bp = np.array([b for _, b in _mh_params(n_hashes)], dtype=np.int64)[:, None]

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = pdf["xs"].str.len().to_numpy(dtype=np.int64)
            xs = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in pdf["xs"]]
            )
            starts = np.r_[0, np.cumsum(lens)[:-1]]
            sig = _sig_minima(xs, starts, A, Bp)  # (n_hashes, n_docs)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_sh": lens.astype(np.int32),
                    "sig": [sig[:, i] for i in range(len(pdf))],
                }
            )

    return xs_df.mapInPandas(
        gen, schema="doc_id long, n_sh int, sig array<long>"
    )


def minhash_signature(
    df: DataFrame, text_col: str = "text", n_bands: int = MH_BANDS
) -> DataFrame:
    """minhash_signature_from_xs over freshly hashed shingles."""
    return minhash_signature_from_xs(_shingle_hashes(df, text_col), n_bands)


def minhash_bands_from_xs(
    xs_df: DataFrame, n_bands: int = MH_BANDS
) -> DataFrame:
    """(doc_id, band_id, key binary) — the banded minhash LSH join keys,
    from precomputed hashed shingle arrays; shared by the one-shot pair
    finder and the persisted dedup artifact (which hashes shingles ONCE
    and feeds both banding and verification from the same pass).

    Banding happens in an Arrow kernel, NOT as explode(slice(sig, ...)):
    Catalyst's project-collapse would inline the 128-hash signature
    expression into every one of the 64 band slices (64x re-evaluation —
    measured 44s vs 1.6s on sf0.01). Crossing the Arrow boundary forces
    the signature to be evaluated exactly once per row."""
    import numpy as np
    import pandas as pd

    sig = minhash_signature_from_xs(xs_df, n_bands)

    def band_gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            sigs = np.vstack([np.asarray(s, dtype=np.int64) for s in pdf["sig"]])
            rows = sigs.reshape(n * n_bands, MH_ROWS)
            # band key = raw little-endian bytes of its MH_ROWS minhashes
            # (binary join key; no per-key string formatting)
            keys = [r.tobytes() for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n_bands),
                    "band_id": np.tile(
                        np.arange(n_bands, dtype=np.int32), n
                    ),
                    "key": keys,
                }
            )

    return sig.mapInPandas(
        band_gen, schema="doc_id long, band_id int, key binary"
    )


def minhash_bands(
    df: DataFrame, text_col: str = "text", n_bands: int = MH_BANDS
) -> DataFrame:
    """minhash_bands_from_xs over freshly hashed shingles."""
    return minhash_bands_from_xs(_shingle_hashes(df, text_col), n_bands)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    max_bucket: int | None = None,
    n_bands: int = MH_BANDS,
    min_band_collisions: int = 1,
) -> DataFrame:
    """Near-dup pairs with exact Jaccard >= threshold, found via banded
    minhash LSH and verified exactly.

    With r=2 the probability a pair at Jaccard J collides in no band is
    (1 - J^2)^n_bands — candidate verification then removes all false
    positives, so miss probability is the ONLY approximation. At the
    default b=64: 1e-8 at J=0.5. At the half-cost b=32 (64 hashes —
    signature kernel work is linear in band count): 1e-4 at J=0.5, but
    9e-10 at J=0.7 and 6.5e-15 at J=0.8 — callers whose true near-dup
    population sits well above the threshold (the usual case: thresholds
    are picked BELOW the dup cluster, e.g. the driver corpus' measured
    minimum true-pair J is 0.8 at a 0.5 threshold) can halve signature
    cost with no practical recall change.

    min_band_collisions (default 1 = classic LSH): require a candidate
    pair to collide in >= m DISTINCT bands before exact verification —
    collision counting (public-literature C2LSH-style). This is THE
    scale lever against the popular-shingle mega-bucket pathology: one
    globally common shingle whose hash happens to be tiny under some
    band's functions owns that band's minimum for every doc containing
    it, so the band degenerates into one bucket of size O(corpus) and
    candidates grow quadratically while being almost entirely false
    (measured at 550k transcript turns: 81.3M distinct candidates for
    100 true pairs; >= 2 bands keeps 1.11M — a 73x verification cut).
    A TRUE pair at J collides per band with p = J^2, so requiring m=2
    raises the miss bound from (1-p)^b to (1-p)^b + b*p*(1-p)^(b-1):
    2.3e-7 at exactly J=0.5 with b=64 — and 1e-26 at J=0.8. The count
    is over the same shuffle the classic path's DISTINCT uses, so m=1
    and m>1 cost the same up to the verify join.

    max_bucket (default None = exact): when set, band buckets larger than
    the cap are SKIPPED — an APPROXIMATION for adversarial boilerplate at
    extreme scale that can drop entire mega-clusters of near-identical
    docs (a 10^6-doc duplicate cluster otherwise implies ~10^12 candidate
    pairs). Production pipelines that set a cap should handle mega-clusters
    separately via exact_dedup on the normalized text first. Composes
    with min_band_collisions (cap prunes the join's input, collision
    count prunes its output)."""
    if not isinstance(min_band_collisions, int) or min_band_collisions < 1:
        raise ValueError(
            "min_band_collisions must be an int >= 1, got "
            f"{min_band_collisions!r}"
        )
    if min_band_collisions > n_bands:
        raise ValueError(
            f"min_band_collisions={min_band_collisions} can never be met "
            f"with n_bands={n_bands}"
        )
    # ONE pass end to end: fused signature+banding kernel -> ONE shuffle
    # on the band key (groupBy) -> in-bucket pair enumeration in Catalyst.
    # This replaces the former self-join shape, which shuffled the band
    # frame twice AND needed an eager localCheckpoint so the join's two
    # inputs would not recompute the signature kernel twice (measured at
    # 50k docs: the checkpoint materialization alone re-paid the whole
    # signature cost). Buckets are collected per (band_id, h0, h1); a doc
    # appears once per band, so each unordered pair is enumerated at most
    # once per band — identical candidate multiset to the self-join.
    bands = _band_keys_from_xs(_ngram_hashes(df, text_col), n_bands)
    buckets = bands.groupBy("band_id", "h0", "h1").agg(
        F.collect_list("doc_id").alias("ds")
    )
    buckets = buckets.filter(F.size("ds") >= 2)
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ds") <= max_bucket)
    # all i<j position pairs via TWO generate steps, not
    # explode(flatten(transform(transform))): the flatten shape
    # materializes the whole k^2 pair array of a bucket IN ONE ROW before
    # the explode — a popular-shingle mega-bucket (k ~ 10^4-10^5 under
    # classic m=1 banding) then builds a 10^8+-element array in task
    # memory, which measured SUPERLINEAR at 550k docs (r07
    # BENCH_SF1_PIPELINE: linearity_x 5.6 on the exact path). posexplode
    # first (one row per bucket member), then each row enumerates only
    # its own i<j tail — identical pair multiset, per-row memory O(k).
    # least/greatest canonicalizes to doc_a < doc_b (collect_list order
    # is nondeterministic).
    member = buckets.select(
        F.col("ds"), F.posexplode("ds").alias("i", "x")
    )
    raw_pairs = member.select(
        F.explode(
            F.transform(
                F.slice(F.col("ds"), F.col("i") + 2,
                        F.greatest(F.size("ds") - F.col("i") - 1, F.lit(0))),
                lambda y: F.struct(
                    F.least(F.col("x"), y).alias("a"),
                    F.greatest(F.col("x"), y).alias("b"),
                ),
            )
        ).alias("p")
    ).select(
        F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b")
    )
    if min_band_collisions > 1:
        # a pair collides at most once per band (one row per (doc, band)),
        # so the row count per (doc_a, doc_b) IS its distinct-band count
        cand = (
            raw_pairs.groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("_nb"))
            .filter(F.col("_nb") >= min_band_collisions)
            .drop("_nb")
        )
    else:
        cand = raw_pairs.distinct()
    # exact verification on the candidate pairs only; shingles recomputed
    # ONLY for docs that appear in some candidate pair (semi-join pushes the
    # doc_id filter below the shingle expression — at near-dup densities
    # this is a few % of the corpus instead of two full tokenize passes)
    cand = cand.localCheckpoint(eager=True)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        _spread_small_input(
            df.join(F.broadcast(cand_docs), "doc_id", "left_semi")
            .select("doc_id", text_col)
        )
        .select("doc_id", shingles_col(text_col).alias("sh"))
    )
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "raw_j",
            F.col("common").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("raw_j") >= threshold)  # raw, like the oracle SQL
        .select("doc_a", "doc_b", F.round("raw_j", 6).alias("jaccard"))
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash

SIMHASH_BITS = 60  # md5 hex prefix of 15 chars = 60 bits
SIMHASH_CHUNKS = 4  # pigeonhole: hamming<=3 pairs share >=1 of 4 chunks


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long) — 60-bit simhash with md5-based token hashes
    (md5 so the DuckDB oracle computes identical bits), tf-weighted."""
    toks = tokens_col(text_col)
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long")
    ex = df.select("doc_id", F.explode(toks).alias("t")).withColumn("h", h)
    bit_sums = ex.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), j).bitwiseAND(1) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    acc = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"b{j}") >= 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bit_sums.select("doc_id", acc.alias("simhash"))


def simhash_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    bit_terms = " + ".join(
        f"CASE WHEN sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH ex AS (
  SELECT {id_col} AS doc_id,
         CAST(concat('0x', substr(md5(t.t), 1, 15)) AS BIGINT) AS h
  FROM {table}, unnest({toks}) AS t(t)
)
SELECT doc_id, {bit_terms} AS simhash
FROM ex GROUP BY doc_id
"""


def simhash_pairs(df: DataFrame, max_hamming: int = 3,
                  text_col: str = "text") -> DataFrame:
    """All pairs with simhash hamming distance <= max_hamming, found by
    15-bit chunk banding (exact for max_hamming <= SIMHASH_CHUNKS - 1 by
    pigeonhole) and verified with bit_count(xor)."""
    assert max_hamming <= SIMHASH_CHUNKS - 1
    sh = simhash(df, text_col)
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND((1 << chunk_bits) - 1)
                        .alias("chunk"),
                    )
                    for i in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    a, b_ = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_pairs_sql(max_hamming: int = 3, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    inner = simhash_sql(table, id_col, text_col)
    return f"""
WITH sh AS ({inner})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Persisted dedup artifact — incremental near-dup against an indexed corpus


def build_dedup_index(df: DataFrame, index_dir: str,
                      text_col: str = "text") -> dict:
    """Persist the near-dup artifact: banded LSH keys (parquet partitioned
    by band_id) + DISTINCT hashed shingle sets for verification. A 100 TB
    corpus tokenizes + shingle-hashes ONCE: the shingles are written first
    and the bands derive from the WRITTEN shingles (one expensive pass, not
    two independent plans); every incremental batch then joins against the
    stored bands instead of re-signing the corpus — the same
    build-once-serve-many artifact shape as the BM25 and IVF indexes (and
    the reference's whole mission, faiss_index_build_service.py:47-163)."""
    from ..jobs import artifact_lock

    with artifact_lock(index_dir, "dedup-build"):
        import os

        from ..ioutil import write_json_atomic

        os.makedirs(index_dir, exist_ok=True)
        spark = df.sparkSession
        sdir = os.path.join(index_dir, "shingles")
        (
            _shingle_hashes(df, text_col)
            .select("doc_id", F.array_distinct("xs").alias("xs"))
            .write.mode("overwrite")
            .parquet(sdir)
        )
        xs_stored = spark.read.parquet(sdir)
        minhash_bands_from_xs(xs_stored).write.partitionBy("band_id").mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, "bands"))
        manifest = {
            "kind": "minhash_lsh",
            "bands": MH_BANDS,
            "rows": MH_ROWS,
            "ngram": NGRAM,
            "n_docs": xs_stored.count(),  # metadata-only count on fresh parquet
        }
        write_json_atomic(os.path.join(index_dir, "manifest.json"), manifest)
        return manifest


def _check_dedup_manifest(index_dir: str) -> dict:
    """The stored bands were computed under the manifest's recorded LSH
    geometry; silently joining keys produced under DIFFERENT constants
    would just miss every pair — refuse instead (the job_id-mismatch
    refusal of jobs.build_index, transposed)."""
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    current = {"bands": MH_BANDS, "rows": MH_ROWS, "ngram": NGRAM}
    stored = {k: manifest.get(k) for k in current}
    if stored != current:
        raise ValueError(
            f"dedup artifact at {index_dir} was built with LSH geometry "
            f"{stored}, engine uses {current}; rebuild the artifact"
        )
    return manifest


def dedup_index_query(
    spark, index_dir: str, new_docs: DataFrame,
    threshold: float, text_col: str = "text",
    min_band_collisions: int = 1,
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, Jaccard >= threshold) TOUCHING the new
    batch: new-vs-indexed and new-vs-new, without recomputing corpus
    signatures (only the batch is signed; the corpus side is the stored
    artifact). Jaccard here is over DISTINCT xxhash64-hashed shingle sets —
    deterministic and self-consistent; it differs from raw string-shingle
    Jaccard only through ~2^-31-probability hash collisions, which is what
    makes cross-batch verification possible from the compact stored arrays.
    Assumes batch doc_ids are disjoint from indexed ones (the streaming
    ingest audit enforces that invariant upstream).

    ``min_band_collisions``: same collision-counting scale lever as
    minhash_lsh_pairs (see its docstring for the miss bounds); counted
    as DISTINCT colliding bands, because a new-vs-new pair matches the
    self-union join twice per band while new-vs-stored matches once."""
    import os

    if not isinstance(min_band_collisions, int) or min_band_collisions < 1:
        raise ValueError(
            "min_band_collisions must be an int >= 1, got "
            f"{min_band_collisions!r}"
        )
    manifest = _check_dedup_manifest(index_dir)
    if min_band_collisions > int(manifest["bands"]):
        raise ValueError(
            f"min_band_collisions={min_band_collisions} can never be met "
            f"with the artifact's n_bands={manifest['bands']}"
        )
    # hash the batch's shingles ONCE: banding and verification both feed
    # from this checkpointed pass
    new_xs = (
        _shingle_hashes(new_docs, text_col)
        .select("doc_id", F.array_distinct("xs").alias("xs"))
        .localCheckpoint(eager=True)
    )
    nb = minhash_bands_from_xs(new_xs).localCheckpoint(eager=True)
    stored = spark.read.parquet(os.path.join(index_dir, "bands")).select(
        "doc_id", "band_id", "key"
    )
    all_bands = stored.unionByName(nb)
    raw_pairs = (
        nb.alias("a")
        .join(
            all_bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            F.col("a.band_id").alias("band_id"),
        )
    )
    if min_band_collisions > 1:
        cand = (
            raw_pairs.groupBy("doc_a", "doc_b")
            .agg(F.countDistinct("band_id").alias("_nb"))
            .filter(F.col("_nb") >= min_band_collisions)
            .drop("_nb")
        )
    else:
        cand = raw_pairs.drop("band_id").distinct()
    cand = cand.localCheckpoint(eager=True)
    stored_xs = spark.read.parquet(os.path.join(index_dir, "shingles"))
    xs_all = stored_xs.unionByName(new_xs)
    common = F.size(F.array_intersect("xs_a", "xs_b"))
    raw_j = common.cast("double") / (
        F.size("xs_a") + F.size("xs_b") - common
    )
    return (
        cand.join(
            xs_all.select(
                F.col("doc_id").alias("doc_a"), F.col("xs").alias("xs_a")
            ),
            "doc_a",
        )
        .join(
            xs_all.select(
                F.col("doc_id").alias("doc_b"), F.col("xs").alias("xs_b")
            ),
            "doc_b",
        )
        .filter(raw_j >= threshold)
        .select("doc_a", "doc_b", F.round(raw_j, 6).alias("jaccard"))
    )


def dedup_index_append(spark, index_dir: str, new_docs: DataFrame,
                       text_col: str = "text") -> dict:
    """Fold a new batch INTO the artifact. Shingles are written BEFORE
    bands: a crash between the two leaves docs with shingles but no bands
    (they are simply not yet discoverable — benign), never bands without
    shingles (whose candidate pairs would be SILENTLY dropped by the
    verification join). Idempotence across retries is the caller's epoch
    concern, like streaming.append_batch. Run dedup_index_query BEFORE
    appending to get the batch's near-dup report. The batch is shingle-
    hashed once; bands derive from the written shingles."""
    from ..jobs import artifact_lock

    with artifact_lock(index_dir, "dedup-append"):
        import os

        from ..ioutil import write_json_atomic

        manifest = _check_dedup_manifest(index_dir)
        new_xs = (
            _shingle_hashes(new_docs, text_col)
            .select("doc_id", F.array_distinct("xs").alias("xs"))
            .localCheckpoint(eager=True)
        )
        new_xs.write.mode("append").parquet(os.path.join(index_dir, "shingles"))
        minhash_bands_from_xs(new_xs).write.partitionBy("band_id").mode(
            "append"
        ).parquet(os.path.join(index_dir, "bands"))
        manifest["n_docs"] = int(manifest["n_docs"]) + new_xs.count()
        write_json_atomic(os.path.join(index_dir, "manifest.json"), manifest)
        return manifest


def dedup_index_compact(spark, index_dir: str) -> dict:
    """Defragment the near-dup artifact after incremental appends — the
    third artifact's segment merge (BM25: streaming.compact_index; IVF:
    similarity.ann_index_compact). Each dedup_index_append adds one file
    set per band partition plus one to shingles/; a standing ingest
    accumulates small files until query-time listing dominates. Pure
    physical rewrite (band keys and shingle sets are deterministic
    functions of the stored data): bands repartitioned by band_id, one
    file per partition; shingles coalesced toward the same file count.
    Row-count audits on both stores before the staged swap; holds the
    artifact lock so appends/builds/compactions exclude each other."""
    import json
    import os
    import shutil

    from ..ioutil import write_json_atomic
    from ..jobs import artifact_lock

    with artifact_lock(index_dir, "dedup-compact"):
        manifest = _check_dedup_manifest(index_dir)
        staging = os.path.join(index_dir, "compact_staging")
        shutil.rmtree(staging, ignore_errors=True)
        audits = {}
        for name, part_col in (("bands", "band_id"), ("shingles", None)):
            src_dir = os.path.join(index_dir, name)
            df = spark.read.parquet(src_dir)
            n_before = df.count()
            out = os.path.join(staging, name)
            if part_col:
                (
                    df.repartition(part_col)
                    .write.partitionBy(part_col)
                    .mode("overwrite").parquet(out)
                )
            else:
                df.coalesce(max(4, MH_BANDS // 8)).write.mode(
                    "overwrite"
                ).parquet(out)
            n_after = spark.read.parquet(out).count()
            if n_after != n_before:
                raise ValueError(
                    f"dedup_index_compact dropped rows in {name}: "
                    f"{n_before} -> {n_after}; staging kept at {staging}"
                )
            audits[name] = int(n_after)
        for name in ("bands", "shingles"):
            old = os.path.join(index_dir, f"{name}_old")
            shutil.rmtree(old, ignore_errors=True)
            os.rename(os.path.join(index_dir, name), old)
            os.rename(os.path.join(staging, name), os.path.join(index_dir, name))
            shutil.rmtree(old)
        shutil.rmtree(staging, ignore_errors=True)
        manifest.setdefault("metrics", {})["compaction_rows"] = audits
        write_json_atomic(os.path.join(index_dir, "manifest.json"), manifest)
        return manifest


def connected_components_star(pairs: DataFrame, max_iter: int = 16) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm), same contract as connected_components:
    (doc_id, cluster_id = min doc_id of the component) over an undirected
    edge list.

    Why it exists alongside min-label propagation: label propagation
    converges in O(component diameter) rounds — fine for clique-ish
    near-dup clusters, quadratic-round-count for chain-shaped graphs
    (100-link chain = 100 shuffles, and the default guard raises at 25).
    The star algorithm converges in O(log n) rounds REGARDLESS of
    diameter: each round is the same primitive (one groupBy-u shuffle +
    a join), but the graph is rewired toward stars instead of labels
    being diffused hop by hop.

    Round = large-star (hook every larger neighbor of u to
    m = min(N(u) ∪ {u})) then small-star (hook every smaller neighbor and
    u itself to the minimum of the smaller neighborhood). Fixpoint (edge
    set unchanged — checked EXACTLY via a distributed except, not a
    collidable checksum) is a star forest: every node points at its
    component min. Raises if max_iter rounds don't converge (log2-bounded,
    so 16 covers ~64k-node components of ANY shape; raise it for more)."""
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    for _ in range(max_iter):
        # large-star: for each u, hook strictly-larger neighbors to
        # m = min(N(u) + {u})
        sym = _sym(edges).localCheckpoint(eager=True)
        mins = sym.groupBy("u").agg(F.min("v").alias("mv")).withColumn(
            "m", F.least(F.col("u"), F.col("mv"))
        ).select("u", "m")
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: for each u over its SMALLER neighborhood,
        # hook those neighbors and u itself to that neighborhood's min
        lsym = _sym(large).localCheckpoint(eager=True)
        smaller = lsym.filter(F.col("v") < F.col("u"))
        smins = smaller.groupBy("u").agg(F.min("v").alias("m"))
        hooked = smaller.join(smins, "u")
        new_edges = (
            hooked.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(hooked.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            new_edges.exceptAll(edges).head(1)
            or edges.exceptAll(new_edges).head(1)
        )
        edges = new_edges
        if not changed:
            break
    else:
        raise ValueError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds (log2-bounded: this means >2^max_iter nodes in one "
            "component); raise max_iter"
        )
    roots = edges.select(F.col("v").alias("doc_id")).subtract(
        edges.select(F.col("u").alias("doc_id"))
    )
    return (
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        .unionByName(
            roots.select("doc_id", F.col("doc_id").alias("cluster_id"))
        )
        .distinct()
    )
