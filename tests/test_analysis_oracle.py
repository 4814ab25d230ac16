"""Tokenizer 3-way parity + oracle BM25 on hand-computed values."""

import math

import pandas as pd
import pytest

from sparkbm25.analysis import tokenize_py, tokenize_series, tokens_col
from sparkbm25.bm25 import B, K1, idf, tf_norm
from sparkbm25.fixtures import MICRO_DOCS, make_transcripts_pdf
from sparkbm25.oracle import OracleIndex

TEXTS = [
    "Hello, WORLD! x42",
    "the cat sat on the mat",
    "",
    None,
    "naïve café 123 foo_bar",
    "a  b\t c\nd",
]


def test_tokenize_py_basics():
    assert tokenize_py("Hello, WORLD! x42") == ["hello", "world", "x42"]
    assert tokenize_py(None) == []
    assert tokenize_py("naïve") == ["na", "ve"]  # non-ascii splits


def test_tokenize_series_matches_py():
    got = tokenize_series(pd.Series(TEXTS)).tolist()
    want = [tokenize_py(t) for t in TEXTS]
    assert got == want


def test_tokens_col_matches_py(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["i", "text"])
    rows = df.select("i", tokens_col("text").alias("toks")).orderBy("i").collect()
    for r in rows:
        assert r.toks == tokenize_py(TEXTS[r.i]), TEXTS[r.i]


def test_pandas_udf_tokenizer_matches(spark):
    from sparkbm25.analysis import tokenize_pandas_udf

    tok = tokenize_pandas_udf()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["i", "text"])
    rows = df.select("i", tok("text").alias("toks")).orderBy("i").collect()
    for r in rows:
        assert r.toks == tokenize_py(TEXTS[r.i])


def test_oracle_hand_computed_micro():
    """MICRO_DOCS: 5 docs; df(cat)=3, df(the)=3, df(dog)=1; N=5.

    doc lens: 6, 2, 0, 50, 6  -> avgdl = 64/5 = 12.8
    """
    ix = OracleIndex.build(MICRO_DOCS)
    assert ix.n_docs == 5
    assert ix.avgdl == pytest.approx(12.8)
    assert ix.df("cat") == 3
    assert ix.df("the") == 3
    assert ix.df("dog") == 1
    assert ix.df("zzz") == 0

    # hand-computed score of "cat" on doc 3 (tf=50, dl=50)
    w = idf(3, 5) * tf_norm(50, 50, 12.8)
    expect = math.log(1 + (5 - 3 + 0.5) / (3 + 0.5)) * (
        50 * (K1 + 1) / (50 + K1 * (1 - B + B * 50 / 12.8))
    )
    assert w == pytest.approx(expect, rel=1e-12)
    assert ix.score("cat", 3) == pytest.approx(expect, rel=1e-12)

    # tie-break: docs 0 and 4 identical -> doc 0 first
    top = ix.search("cat mat", k=5)
    ids = [d for d, _ in top]
    assert ids.index(0) < ids.index(4)
    s = dict(top)
    assert s[0] == pytest.approx(s[4], rel=1e-12)


def test_oracle_duplicate_query_terms():
    ix = OracleIndex.build(MICRO_DOCS)
    assert ix.search("cat cat", k=1)[0][1] == pytest.approx(
        2 * ix.search("cat", k=1)[0][1], rel=1e-12
    )


def test_oracle_absent_term_ignored():
    ix = OracleIndex.build(MICRO_DOCS)
    assert ix.search("zzabsentzz", k=5) == []
    a = ix.search("cat zzabsentzz", k=5)
    b = ix.search("cat", k=5)
    assert a == b


def test_fixture_generator_deterministic():
    a = make_transcripts_pdf(5)
    b = make_transcripts_pdf(5)
    pd.testing.assert_frame_equal(a, b)
    assert set(a.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert (a.groupby("conv_id").size() >= 2).all()
