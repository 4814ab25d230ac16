"""Top-k BM25 query engine — score-all DataFrame path.

The analog of the reference's search path (reference:
benchmarking/search/search_indices.py:13-55 — per-query ``index.search(q, k)``
returning distance-ordered ids). Two engine paths exist:

- ``score_all_topk`` (this module): no prebuilt index; tokenize-and-score the
  corpus declaratively. This is the correctness reference path and the one
  whose plan is fully SQL-expressible (driver oracle checks), and the shape
  Catalyst optimizes end-to-end: Arrow tf kernel → broadcast join with the
  (tiny) query-term side → hash aggregate → window top-k.
- ``index_search`` (sparkbm25.index_query): reads the prebuilt compressed
  posting index and prunes with block-max metadata — the scale path.

Determinism contract (rank-identity with the oracle):
- duplicate query terms weight contributions by multiplicity (qtf)
- absent terms contribute nothing
- final order: score DESC, doc_id ASC (reference analog: faiss returns
  distance-ordered ids; search_indices.py:30-39)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analysis import tokenize_py
from .bm25 import B, K1
from .corpus import corpus_stats, doc_stats
from .kernels import doc_term_freqs


def query_terms_df(
    spark: SparkSession, queries: list[tuple[int, str]]
) -> DataFrame:
    """(query_id, term, qtf) — tokenized driver-side (query sets are tiny;
    the reference also feeds queries one host-side array at a time,
    search_indices.py:30-33)."""
    rows = []
    for qid, qtext in queries:
        counts: dict[str, int] = {}
        for t in tokenize_py(qtext):
            counts[t] = counts.get(t, 0) + 1
        rows.extend((qid, t, c) for t, c in counts.items())
    return spark.createDataFrame(rows, "query_id int, term string, qtf int")


def bm25_contrib_col(
    n_docs: int, avgdl: float, k1: float = K1, b: float = B
) -> F.Column:
    """Per-(query,term,doc) contribution, pure Catalyst double arithmetic.

    Matches sparkbm25.bm25.idf/tf_norm exactly (same expression tree).
    Expects columns: qtf, df, tf, doc_len.
    """
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    tf_norm = (
        tf
        * F.lit(k1 + 1.0)
        / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len").cast("double") / F.lit(avgdl))
        )
    )
    return F.col("qtf").cast("double") * idf * tf_norm


def topk_window(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, doc_id, score) -> (query_id, rank, doc_id, score) top-k.

    Scales: the window partitions by query_id, so per-query state is the
    score list of matched docs for that query; Spark sorts within partition.
    For huge candidate sets per query, AQE handles partition sizing; a
    two-level top-k (per-shard limit k, then global) is used by the indexed
    path.
    """
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def score_all(
    corpus: DataFrame,
    queries: list[tuple[int, str]],
    n_docs: int | None = None,
    avgdl: float | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact BM25 scores for every (query, matching doc) pair.

    Plan: Arrow tf kernel over the corpus scan → broadcast-join the query
    terms (tiny side broadcast, no shuffle of the corpus stream) → per-term
    df via an aggregate over the matched subset only → Catalyst double
    expression → hash aggregate on (query_id, doc_id).
    """
    spark = corpus.sparkSession
    if n_docs is None or avgdl is None:
        n_docs, avgdl = corpus_stats(doc_stats(corpus))
    qterms = query_terms_df(spark, queries)
    distinct_terms = qterms.select("term").distinct()

    tf = doc_term_freqs(corpus)
    # keep only postings of query terms; this is the only pass over the corpus
    matched = tf.join(F.broadcast(distinct_terms), "term")
    if not materialize:
        # lazy plan (two passes over the tf kernel) — used for plan
        # inspection in tests; production path caches + checkpoints below
        term_df = matched.groupBy("term").agg(F.count("*").alias("df"))
        contrib = (
            matched.join(F.broadcast(term_df), "term")
            .join(F.broadcast(qterms), "term")
            .withColumn("contrib", bm25_contrib_col(n_docs, avgdl))
        )
        return contrib.groupBy("query_id", "doc_id").agg(
            F.sum("contrib").alias("score")
        )
    matched.cache()
    try:
        term_df = matched.groupBy("term").agg(F.count("*").alias("df"))
        contrib = (
            matched.join(F.broadcast(term_df), "term")
            .join(F.broadcast(qterms), "term")
            .withColumn("contrib", bm25_contrib_col(n_docs, avgdl))
        )
        scored = contrib.groupBy("query_id", "doc_id").agg(
            F.sum("contrib").alias("score")
        )
        # materialize while `matched` is still cached
        scored = scored.localCheckpoint(eager=True)
    finally:
        matched.unpersist()
    return scored


def score_all_topk(
    corpus: DataFrame, queries: list[tuple[int, str]], k: int = 10
) -> DataFrame:
    """Top-k per query: (query_id, rank, doc_id, score)."""
    return topk_window(score_all(corpus, queries), k)
