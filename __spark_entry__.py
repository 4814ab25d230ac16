"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship BM25 top-k over sf0.001 documents.
queries()      — one entry per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL for each query (value-hash checks).

All engine code lives in sparkbm25/; this module only adapts it to the
driver's (spark, sf_dir) calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkbm25 import sqlgen
from sparkbm25.analysis import tokens_col
from sparkbm25.kernels import doc_term_freqs
from sparkbm25.query import score_all_topk
from sparkbm25.session import ensure_shipped

K = 10

# Fixed reference query set over the `documents` vocabulary: head terms,
# mid terms, an absent term, duplicate-term query (FIXTURES.md §2 mix).
DOC_QUERIES: list[tuple[int, str]] = [
    (0, "spark merge join"),
    (1, "the window"),
    (2, "vector batch stream hash"),
    (3, "customer zzabsentzz"),
    (4, "sort sort table"),
    (5, "group filter"),
    (6, "dup"),
    (7, "slow query scan column row"),
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- query implementations (each: (spark, sf_dir) -> DataFrame) -----------

def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: exact BM25 top-k per query (SURVEY §2.5 T1/T2)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    out = score_all_topk(docs, DOC_QUERIES, k=K)
    return out.withColumn("score", F.round("score", 6))


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length statistics (SURVEY §2.4 A2 avgdl inputs)."""
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", F.size(tokens_col("text")).alias("doc_len"))


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term document frequency + collection frequency (SURVEY §2.4 A2)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tf = doc_term_freqs(docs)
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "doc_stats": q_doc_stats,
        "term_stats": q_term_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": sqlgen.bm25_topk_sql(DOC_QUERIES, k=K),
        "doc_stats": sqlgen.doc_stats_sql(),
        "term_stats": sqlgen.term_stats_sql(),
    }
