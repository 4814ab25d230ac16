"""BM25F — multi-field BM25 with per-field boosts (simple/weighted variant).

The reference engine scores a single vector per doc; a transcripts user's
next ask after plain BM25 is field-weighted ranking ("title hits beat body
hits"). This implements the classic *simple BM25F* composition (Robertson &
Zaragoza 2009 §3.3: fold field boosts into a weighted tf and weighted doc
length, then apply the usual saturation once):

    tf~(t, d)  = Σ_f  w_f · tf(t, d, f)
    dl~(d)     = Σ_f  w_f · len(d, f)
    avgdl~     = avg_d dl~(d)
    score(q,d) = Σ_t  qtf · idf(df_t) · tf~·(k1+1) / (tf~ + k1·(1-b+b·dl~/avgdl~))

df_t counts docs containing t in ANY field. With integer-valued weights
(e.g. title 2.0 / body 1.0) every weighted sum is EXACT in float64
regardless of accumulation order, so engine and DuckDB oracle agree
bit-for-bit before the shared 6-dp rounding; avgdl~ is one exact integer
sum divided by the doc count (identical in both engines).

Fields here are DERIVED from the single text column — ``title`` = the
first ``title_tokens`` tokens, ``body`` = the rest — because the driver's
documents table carries one text field; the same composition applies
unchanged to physically separate columns (pass a pre-concatenated
token-position frame).

Plan shape (scales like score_all): ONE posexplode pass over the corpus →
hash aggregate on (doc_id, term) building tf~ map-side → broadcast join
with the tiny query-occurrence side → df collect (bounded by distinct
query terms) → driver-side idf (glibc libm, bit-equal to the DuckDB
oracle's ln) → Catalyst tf_norm → canonical per-occurrence fold. No
Python rows anywhere.

Reference analog: per-field boosts generalize the reference's single
distance metric the way its benchmark harness sweeps search parameters
(benchmarking configs); cited per SURVEY.md transposition contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .localrel import local_df
from .analysis import DUCKDB_TOKENS, tokens_col
from .bm25 import B, K1
from .bm25 import idf as idf_py
from .bm25 import idf_sql, tf_norm_sql
from .query import canonical_score_sum, query_occurrences_df, topk_window

TITLE_TOKENS = 8
W_TITLE = 2.0
W_BODY = 1.0


def _weighted_doc_stats(corpus: DataFrame, title_tokens: int,
                        w_title: float, w_body: float) -> DataFrame:
    """(doc_id, dlw): field-weighted doc length — exact integer-valued."""
    size = F.size(tokens_col("text"))
    dlw = (
        F.lit(w_title) * F.least(size, F.lit(title_tokens))
        + F.lit(w_body) * F.greatest(size - title_tokens, F.lit(0))
    )
    return corpus.select("doc_id", dlw.alias("dlw"))


def bm25f_score_topk(
    corpus: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    title_tokens: int = TITLE_TOKENS,
    w_title: float = W_TITLE,
    w_body: float = W_BODY,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Exact BM25F top-k: (query_id, rank, doc_id, score)."""
    spark = corpus.sparkSession
    qocc = query_occurrences_df(spark, queries)
    distinct_terms = qocc.select("term").distinct()

    # one pass: token -> (doc, term, field weight); weighted tf via hash agg
    tok = corpus.select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "term")
    )
    wtf = (
        tok.join(F.broadcast(distinct_terms), "term")
        .groupBy("doc_id", "term")
        .agg(
            F.sum(
                F.when(F.col("pos") < title_tokens, F.lit(w_title))
                .otherwise(F.lit(w_body))
            ).alias("tfw")
        )
    )

    dstats = _weighted_doc_stats(corpus, title_tokens, w_title, w_body)
    # sum dlw as DOUBLE: with integer-valued weights every dlw is an
    # integer and float64 addition of integers stays exact below 2^53
    # (bit-identical to the oracle's sum regardless of order); a long
    # cast here would silently TRUNCATE non-integer weights' dlw
    row = dstats.agg(
        F.count("*").alias("n"),
        F.sum(F.col("dlw")).alias("s"),
    ).first()
    n_docs = int(row.n)
    avgdl_w = float(row.s) / n_docs

    wtf = wtf.cache()
    try:
        df_rows = wtf.groupBy("term").agg(F.count("*").alias("df")).collect()
        idf_df = local_df(
            spark, [(r.term, idf_py(r.df, n_docs)) for r in df_rows],
            "term string, idf double",
        )
        tfw = F.col("tfw")
        tf_norm = tfw * F.lit(k1 + 1.0) / (
            tfw
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dlw") / F.lit(avgdl_w))
        )
        contrib = (
            wtf.join(F.broadcast(idf_df), "term")
            .join(dstats, "doc_id")
            .join(F.broadcast(qocc), "term")
            .withColumn("contrib", F.col("idf") * tf_norm)
        )
        scored = contrib.groupBy("query_id", "doc_id").agg(
            canonical_score_sum().alias("score")
        )
        scored = scored.localCheckpoint(eager=True)
    finally:
        wtf.unpersist()
    return topk_window(scored, k)


def bm25f_topk_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    title_tokens: int = TITLE_TOKENS,
    w_title: float = W_TITLE,
    w_body: float = W_BODY,
    round_dp: int = 6,
) -> str:
    """DuckDB oracle: identical composition over list-sliced fields."""
    toks = DUCKDB_TOKENS.format(col=text_col)
    rows = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries
    )
    idf = idf_sql("tdf.df", "cs.n")
    tfn = tf_norm_sql("tf.tfw", "dstats.dl", "cs.avgdl")
    t = title_tokens
    return f"""
WITH q AS (SELECT * FROM (VALUES {rows}) AS q(query_id, query_text)),
qt AS (
  SELECT query_id, t.term, count(*) AS qtf
  FROM q, unnest({DUCKDB_TOKENS.format(col='query_text')}) AS t(term)
  GROUP BY 1, 2
),
toks AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
fields AS (
  SELECT doc_id, ts[1:{t}] AS tts, ts[{t} + 1:] AS bts, len(ts) AS rawlen
  FROM toks
),
tfu AS (
  SELECT doc_id, t.term, {w_title} AS w FROM fields, unnest(tts) AS t(term)
  WHERE t.term IN (SELECT term FROM qt)
  UNION ALL
  SELECT doc_id, t.term, {w_body} AS w FROM fields, unnest(bts) AS t(term)
  WHERE t.term IN (SELECT term FROM qt)
),
tf AS (SELECT doc_id, term, sum(w) AS tfw FROM tfu GROUP BY 1, 2),
dstats AS (
  SELECT doc_id,
         {w_title} * least(rawlen, {t}) +
         {w_body} * greatest(rawlen - {t}, 0) AS dl
  FROM fields
),
cs AS (SELECT count(*) AS n, sum(dl) / count(*) AS avgdl FROM dstats),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, tf.doc_id,
         sum(qt.qtf * {idf} * {tfn}) AS score
  FROM tf
  JOIN qt ON qt.term = tf.term
  JOIN tdf ON tdf.term = tf.term
  JOIN dstats ON dstats.doc_id = tf.doc_id
  CROSS JOIN cs
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, round(score, {round_dp}) AS score
FROM ranked WHERE rank <= {k}
"""
