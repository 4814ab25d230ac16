"""End-to-end training-data curation: the operator a 100 TB pre-training
pipeline actually runs — exact dedup, near-dup cluster keep-one, quality
floor and language filter composed into ONE decision table.

This is the integrative layer over the pipeline primitives (each of which
is individually driver-gated): `dedup.exact_dedup`, `dedup.minhash_lsh_pairs`
→ `dedup.connected_components`, `textstats.quality_score`,
`textstats.lang_id`. One row per input document with the per-policy flags
AND the final `kept` bit, so downstream writers filter `kept = 1` while
audits keep the full ledger (why was each doc dropped?) — the shape real
curation pipelines log.

Scale: every component is the scale-pinned variant (banded LSH + exact
verify for the edge list — near-linear; map-only Catalyst for quality/lang;
one window shuffle for exact dedup; one shuffle per label-propagation
round). The joins are all on doc_id — co-partitioned after the first
shuffle, AQE handles the rest.

Reference provenance: the reference has no curation layer (it builds
vector indexes); this module exists for the training-data-pipeline mandate
(SURVEY.md §2 "beyond the reference" block). Oracle: the composed SQL over
the same primitives' oracle generators, value-hash gated by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    MH_BANDS,
    connected_components,
    dedup_clusters_sql,
    exact_dedup,
    exact_dedup_sql,
    minhash_lsh_pairs,
)
from .textstats import lang_id, lang_id_sql, quality_score, quality_score_sql


def curate(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.75,
    langs: tuple[str, ...] = ("en",),
    n_bands: int = MH_BANDS,
    text_col: str = "text",
    max_bucket: int | None = None,
    min_band_collisions: int = 1,
) -> DataFrame:
    """(doc_id, exact_canonical, neardup_canonical, quality, lang_pred,
    kept) — one row per input doc; kept = 1 iff the doc survives ALL
    policies:

    - exact_canonical: the doc is its normalized-text group's min-id
      representative (catches short docs below the shingle width that
      near-dup clustering cannot see);
    - neardup_canonical: the doc is the min-id member of its near-dup
      cluster, or belongs to none (edges = exact-verified MinHash-LSH
      pairs at `jaccard_threshold`, components by min-label propagation);
    - quality >= min_quality (composite heuristic, 6dp-rounded — the
      rounded column is the one both engines hash-match, so the threshold
      compare is deterministic cross-engine);
    - lang_pred in langs.

    ``max_bucket`` / ``min_band_collisions`` pass through to
    minhash_lsh_pairs — the scale levers against the popular-shingle
    mega-bucket candidate blowup (see its docstring for the quantified
    miss bounds); defaults keep the exact classic-LSH behavior the
    driver gate verifies.
    """
    base = df.select("doc_id")
    ex = exact_dedup(df, text_col).select("doc_id", "is_dup")
    clusters = connected_components(
        minhash_lsh_pairs(
            df, jaccard_threshold, text_col, n_bands=n_bands,
            max_bucket=max_bucket,
            min_band_collisions=min_band_collisions,
        )
    )
    q = quality_score(df, text_col).select("doc_id", "quality")
    lang = lang_id(df, text_col).select("doc_id", "lang_pred")

    exact_ok = (F.col("is_dup") == 0).cast("int")
    neardup_ok = (
        F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id"))
    ).cast("int")
    quality_ok = F.col("quality") >= F.lit(min_quality)
    lang_ok = F.col("lang_pred").isin(*langs)
    return (
        base.join(ex, "doc_id")
        .join(clusters, "doc_id", "left")
        .join(q, "doc_id")
        .join(lang, "doc_id")
        .select(
            "doc_id",
            exact_ok.alias("exact_canonical"),
            neardup_ok.alias("neardup_canonical"),
            "quality",
            "lang_pred",
            (
                (exact_ok == 1) & (neardup_ok == 1) & quality_ok & lang_ok
            ).cast("int").alias("kept"),
        )
    )


def curate_sql(
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.75,
    langs: tuple[str, ...] = ("en",),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle: the same decision table composed from the component
    oracles (exact-dedup window, recursive-CTE transitive closure over
    EXACT Jaccard pairs, quality, lang)."""
    lang_list = ", ".join(f"'{l}'" for l in langs)
    return f"""
WITH ex AS ({exact_dedup_sql(table, id_col, text_col)}),
cl AS ({dedup_clusters_sql(jaccard_threshold, table, id_col, text_col)}),
q AS (SELECT doc_id, quality FROM ({quality_score_sql(table, id_col, text_col)}) t),
lg AS (SELECT doc_id, lang_pred FROM ({lang_id_sql(table, id_col, text_col)}) t)
SELECT ex.doc_id,
       CAST(ex.is_dup = 0 AS INT) AS exact_canonical,
       CAST(cl.cluster_id IS NULL OR cl.cluster_id = ex.doc_id AS INT)
         AS neardup_canonical,
       q.quality,
       lg.lang_pred,
       CAST(ex.is_dup = 0
            AND (cl.cluster_id IS NULL OR cl.cluster_id = ex.doc_id)
            AND q.quality >= {min_quality}
            AND lg.lang_pred IN ({lang_list}) AS INT) AS kept
FROM ex
LEFT JOIN cl ON cl.doc_id = ex.doc_id
JOIN q ON q.doc_id = ex.doc_id
JOIN lg ON lg.doc_id = ex.doc_id
"""
