"""Score explain (query.explain_scores): per-term BM25 breakdown rows for
each top-k hit — contribs sum back to the hit's score, rows match the
pure-Python oracle's inputs, and the generated DuckDB SQL agrees."""

import math

import pytest

from sparkbm25.analysis import tokenize_py
from sparkbm25.bm25 import idf as idf_py
from sparkbm25.bm25 import tf_norm
from sparkbm25.corpus import add_doc_id
from sparkbm25.fixtures import make_queries, make_transcripts_pdf
from sparkbm25.query import explain_scores, score_all_topk

K = 5


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_transcripts_pdf(50)
    df = add_doc_id(spark.createDataFrame(pdf), scheme="conv_seq")
    df = df.select("doc_id", "text")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def rows(corpus):
    return [(r.doc_id, r.text) for r in corpus.collect()]


def _py_explain(rows, queries, k):
    """{(qid, rank, doc_id, term): (qtf, tf, dl, df, idf, tfn, contrib)}"""
    toks = {i: tokenize_py(t) for i, t in rows}
    n = len(toks)
    av = sum(len(v) for v in toks.values()) / n
    dfm: dict[str, int] = {}
    qterms = {t for _, q in queries for t in tokenize_py(q)}
    for ts in toks.values():
        for t in set(ts) & qterms:
            dfm[t] = dfm.get(t, 0) + 1
    out = {}
    for qid, qtext in queries:
        qt: dict[str, int] = {}
        for t in tokenize_py(qtext):
            qt[t] = qt.get(t, 0) + 1
        scored = []
        for i, ts in toks.items():
            s = 0.0
            for t in tokenize_py(qtext):  # per occurrence, query order
                c = ts.count(t)
                if c:
                    s += idf_py(dfm[t], n) * tf_norm(c, len(ts), av)
            if s > 0:
                scored.append((i, s))
        ranked = sorted(scored, key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (i, _s) in enumerate(ranked, start=1):
            ts = toks[i]
            for t, qtf in qt.items():
                c = ts.count(t)
                if not c:
                    continue
                w = idf_py(dfm[t], n)
                tfn = tf_norm(c, len(ts), av)
                out[(qid, rank, i, t)] = (
                    qtf, c, len(ts), dfm[t],
                    round(w, 6), round(tfn, 6), round(qtf * w * tfn, 6),
                )
    return out


def test_explain_matches_python_oracle(spark, corpus, rows):
    queries = make_queries(12)
    want = _py_explain(rows, queries, K)
    got = {
        (r.query_id, r.rank, r.doc_id, r.term):
        (r.qtf, r.tf, r.doc_len, r.df, r.idf, r.tf_norm, r.contrib)
        for r in explain_scores(corpus, queries, k=K).collect()
    }
    assert got == want
    assert len(got) > 0


def test_explain_contribs_sum_to_score(spark, corpus):
    """Sum of a hit's contribs equals its ranked score (to the shared
    rounding) and explain covers exactly the top-k rows."""
    queries = make_queries(8)
    top = {
        (r.query_id, r.rank, r.doc_id): r.score
        for r in score_all_topk(corpus, queries, k=K).collect()
    }
    agg: dict[tuple, float] = {}
    for r in explain_scores(corpus, queries, k=K).collect():
        key = (r.query_id, r.rank, r.doc_id)
        agg[key] = agg.get(key, 0.0) + r.contrib
    assert set(agg) == set(top)
    for key, s in agg.items():
        assert math.isclose(s, top[key], abs_tol=5e-6), key


def test_explain_sql_oracle_parity(spark, corpus, rows):
    import duckdb
    import pandas as pd

    from sparkbm25.sqlgen import explain_sql

    queries = make_queries(10)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        (int(q), int(rk), int(di), t):
        (int(qtf), int(tf), int(dl), int(df),
         round(float(i), 6), round(float(tn), 6), round(float(c), 6))
        for q, rk, di, t, qtf, tf, dl, df, i, tn, c in con.execute(
            explain_sql(queries, k=K)
        ).fetchall()
    }
    got = {
        (r.query_id, r.rank, r.doc_id, r.term):
        (r.qtf, r.tf, r.doc_len, r.df, r.idf, r.tf_norm, r.contrib)
        for r in explain_scores(corpus, queries, k=K).collect()
    }
    assert got == want
