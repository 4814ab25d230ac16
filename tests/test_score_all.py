"""Rank-identity of the score-all path vs the pure-Python oracle and DuckDB.

The engine analog of the reference's recall test vs ground-truth neighbors
(benchmarking/utils/common_utils.py:10-41) — but exact rank-identity, not
recall, per the north rule."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkbm25.corpus import add_doc_id, assert_doc_ids_unique
from sparkbm25.fixtures import MICRO_DOCS, make_queries, make_transcripts_pdf
from sparkbm25.oracle import OracleIndex
from sparkbm25.query import score_all_topk
from sparkbm25.sqlgen import bm25_topk_sql

K = 10


def _assert_rank_identical(got_rows, want, rel=1e-9):
    """got_rows: [(query_id, rank, doc_id, score)] spark; want: same from oracle."""
    got = sorted((r.query_id, r.rank, r.doc_id, r.score) for r in got_rows)
    want = sorted(want)
    assert [g[:3] for g in got] == [w[:3] for w in want], (
        "rank sequences differ: " + str([(g, w) for g, w in zip(got, want) if g[:3] != w[:3]][:5])
    )
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=rel)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_transcripts_pdf(80)
    df = add_doc_id(spark.createDataFrame(pdf), scheme="conv_seq")
    df.cache().count()
    return df


def test_conv_seq_doc_ids_follow_turn_order(corpus):
    rows = corpus.orderBy("doc_id").select("conv_id", "turn_idx", "doc_id").collect()
    keys = [(r.conv_id, r.turn_idx) for r in rows]
    assert keys == sorted(keys)
    assert_doc_ids_unique(corpus)


def test_per_turn_text_equality(corpus, spark):
    """North rule: per-turn text equality under stable (conv_id, turn_idx)
    ordering — the corpus adapter must not alter or reorder text."""
    pdf = make_transcripts_pdf(80)
    want = pdf.sort_values(["conv_id", "turn_idx"])["text"].tolist()
    got = [r.text for r in corpus.orderBy("doc_id").select("text").collect()]
    assert got == want


def test_score_all_rank_identical_transcripts(corpus):
    docs = [
        (r.doc_id, r.text) for r in corpus.select("doc_id", "text").collect()
    ]
    oracle = OracleIndex.build(docs)
    queries = make_queries(40)
    want = oracle.search_all(queries, k=K)
    got = score_all_topk(corpus, queries, k=K).collect()
    _assert_rank_identical(got, want)


def test_score_all_micro_corpus_tie_break(spark):
    df = spark.createDataFrame(MICRO_DOCS, "doc_id long, text string")
    oracle = OracleIndex.build(MICRO_DOCS)
    queries = [(0, "cat mat"), (1, "the dog"), (2, "cat cat"), (3, "zzabsentzz")]
    got = score_all_topk(df, queries, k=5).collect()
    _assert_rank_identical(got, oracle.search_all(queries, k=5))
    # absent-only query yields no rows at all
    assert not [r for r in got if r.query_id == 3]


DOC_QUERIES = [
    (0, "spark merge join"),
    (1, "the window"),
    (2, "vector batch stream hash"),
    (3, "customer zzabsentzz"),
    (4, "sort sort table"),
]


def test_score_all_matches_duckdb_documents(spark, sf_dir):
    """Cross-engine: Spark plan vs generated DuckDB SQL on real testdata."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        score_all_topk(docs.select("doc_id", "text"), DOC_QUERIES, k=K)
        .withColumn("score", F.round("score", 6))
        .collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.sql(bm25_topk_sql(DOC_QUERIES, k=K)).fetchall()
    got_t = sorted((r.query_id, r.rank, r.doc_id, r.score) for r in got)
    want_t = sorted((int(a), int(b), int(c), float(d)) for a, b, c, d in want)
    assert [g[:3] for g in got_t] == [w[:3] for w in want_t]
    for g, w in zip(got_t, want_t):
        assert g[3] == pytest.approx(w[3], abs=2e-6)
