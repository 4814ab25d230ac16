"""Corpus adapters: stable doc_id assignment + doc/term statistics.

The reference attaches external int32 doc ids positionally to the vector
matrix (reference: faiss_gpu_index_cagra_builder.py:207-225 IndexIDMap
``add_with_ids``; ids parsed little-endian int32 at vectors_dataset.py:128).
Our docs are transcript turns; the north rule demands a stable doc identity
under ``(conv_id, turn_idx)`` ordering, and rank tie-breaks depend on it, so
the id scheme is part of the index contract and is recorded in the manifest.

Schemes
-------
- ``conv_seq`` (default for fixture corpora): parse the integer suffix of
  ``conv-%08d`` conv ids; ``doc_id = conv_seq * 2^20 + turn_idx``. Pure
  column expression — NO shuffle, no global sort, scales to any size, and
  the numeric order of doc_id equals the lexicographic (conv_id, turn_idx)
  order, which is what rank-identity requires.
- ``hash64``: ``xxhash64(conv_id, turn_idx)`` for arbitrary conv_id strings
  at 10^12 scale. Ordering is stable but not lexicographic; a collision
  audit job (count(distinct doc_id) == count(*)) must pass before use.
- ``row_number``: global ``row_number() over (order by conv_id, turn_idx)``
  — exact dense ids, but a single-partition global sort: small corpora only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_BITS = 20  # turn_idx < 2^20 per conversation


def add_doc_id(transcripts: DataFrame, scheme: str = "conv_seq") -> DataFrame:
    if scheme == "conv_seq":
        # try_cast: a conv_id without a trailing digit run yields NULL
        # doc_id instead of an ANSI CAST_INVALID_INPUT crash deep inside an
        # executor; compute_corpus_stats audits for nulls with a clear error
        conv_seq = F.regexp_extract("conv_id", r"(\d+)$", 1).try_cast("long")
        doc_id = (F.shiftleft(conv_seq, TURN_BITS) + F.col("turn_idx").cast("long"))
    elif scheme == "hash64":
        doc_id = F.xxhash64("conv_id", "turn_idx")
    elif scheme == "row_number":
        w = Window.orderBy("conv_id", "turn_idx")
        doc_id = F.row_number().over(w).cast("long") - 1
    else:
        raise ValueError(f"unknown doc_id scheme: {scheme}")
    return transcripts.withColumn("doc_id", doc_id)


def assert_doc_ids_unique(corpus: DataFrame) -> None:
    """Collision audit (mandatory before trusting hash64 ids)."""
    n, d = corpus.agg(
        F.count("doc_id").alias("n"), F.countDistinct("doc_id").alias("d")
    ).first()
    if n != d:
        raise ValueError(f"doc_id collision: {n} rows, {d} distinct ids")


def decode_conv_seq(df: DataFrame) -> DataFrame:
    """Inverse of the conv_seq scheme: doc_id -> (conv_seq, turn_idx).
    Lets results carry conversation coordinates without storing them."""
    return df.withColumn(
        "conv_seq", F.shiftrightunsigned("doc_id", TURN_BITS)
    ).withColumn(
        "turn_idx",
        F.col("doc_id").bitwiseAND((1 << TURN_BITS) - 1).cast("int"),
    )


def doc_stats(corpus: DataFrame) -> DataFrame:
    """(doc_id, doc_len) — doc_len in tokens. Pure Catalyst, no shuffle."""
    from .analysis import tokens_col

    return corpus.select("doc_id", F.size(tokens_col("text")).alias("doc_len"))


def corpus_stats(dstats: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — two scalars, one aggregate job."""
    row = dstats.agg(
        F.count("doc_id").alias("n"), F.avg("doc_len").alias("avgdl")
    ).first()
    return int(row.n), float(row.avgdl)
