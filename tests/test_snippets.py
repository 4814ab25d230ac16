"""Snippet attachment (snippets.attach_snippets): the token window around
each hit's first query-term match, verified against a pure-Python oracle
and the generated DuckDB SQL."""

import pytest
from pyspark.sql import functions as F

from sparkbm25.analysis import tokenize_py
from sparkbm25.snippets import attach_snippets


def _py_snippet(text: str, qtext: str, window: int) -> str | None:
    ts = tokenize_py(text)
    qs = set(tokenize_py(qtext))
    pos = [i for i, t in enumerate(ts, start=1) if t in qs]
    if not pos:
        return None
    p = pos[0]
    lo = max(p - window, 1)
    return " ".join(ts[lo - 1:p + window])


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Alpha beta GAMMA delta epsilon zeta eta theta"),
        (2, "one two three gamma four five"),
        (3, "gamma starts this document right here"),
        (4, "ends with the token gamma"),
        (5, "completely unrelated content words"),
        (6, "zeta at second position here padding padding"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.cache().count()
    return df


def _fake_results(spark, queries, docs_rows, k=10):
    """Rank by doc_id per query over ALL docs (scores arbitrary but
    deterministic) — attach_snippets must not care how results ranked."""
    rows = []
    for qid, _q in queries:
        for rank, (doc_id, _t) in enumerate(docs_rows, start=1):
            rows.append((qid, rank, doc_id, float(100 - rank)))
    return spark.createDataFrame(
        rows, "query_id int, rank int, doc_id long, score double"
    )


def test_snippets_match_python_oracle(spark, docs):
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    queries = [(0, "gamma zeta"), (1, "theta"), (2, "zzabsent")]
    res = _fake_results(spark, queries, rows)
    got = {
        (r.query_id, r.doc_id): r.snippet
        for r in attach_snippets(res, docs, queries, window=2).collect()
    }
    qmap = dict(queries)
    for (qid, doc_id), snip in got.items():
        text = dict(rows)[doc_id]
        assert snip == _py_snippet(text, qmap[qid], 2), (qid, doc_id)
    # every result row survives the join with a snippet column
    assert len(got) == len(queries) * len(rows)


def test_snippets_window_edges(spark, docs):
    """Match at token 1 (no left clip available) and at the last token
    (right side clipped by the array's end)."""
    queries = [(0, "gamma")]
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    res = _fake_results(spark, queries, rows)
    got = {
        r.doc_id: r.snippet
        for r in attach_snippets(res, docs, queries, window=3).collect()
    }
    assert got[3] == "gamma starts this document"   # left-clipped
    assert got[4] == "with the token gamma"          # right-clipped
    assert got[5] is None                             # no match -> NULL


def test_snippets_validation(spark, docs):
    from sparkbm25.sqlgen import snippets_sql

    res = _fake_results(spark, [(0, "x")], [(1, "t")])
    with pytest.raises(ValueError, match="window"):
        attach_snippets(res, docs, [(0, "x")], window=-1)
    # oracle-side refusal parity
    for bad in (-1, 2.5):
        with pytest.raises(ValueError, match="window"):
            snippets_sql([(0, "x")], window=bad)


def test_snippets_duplicate_qid_merges(spark, docs):
    """Duplicate query_ids merge their token sets (the index_search / SQL
    DISTINCT contract) — result rows must NOT fan out through the join."""
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    dup = [(0, "gamma"), (0, "zeta")]
    res = _fake_results(spark, [(0, "gamma zeta")], rows)
    merged = attach_snippets(res, docs, [(0, "gamma zeta")],
                             window=2).collect()
    got = attach_snippets(res, docs, dup, window=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, merged))
    assert len(got) == len(rows)


def test_snippets_plan_broadcasts_results(spark, docs):
    """The result side must broadcast onto the source scan — a sort-merge
    join here would shuffle the whole tokenized corpus per batch."""
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    res = _fake_results(spark, [(0, "gamma")], rows)
    plan = attach_snippets(res, docs, [(0, "gamma")])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_snippets_sql_oracle_parity(spark, docs):
    """End-to-end parity: index-free scoring path not needed — compare the
    full driver composition (index_search + attach_snippets vs
    snippets_sql) on a real built index."""
    import duckdb
    import pandas as pd

    from sparkbm25.build import BuildParams
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index, build_index
    from sparkbm25.sqlgen import snippets_sql

    import tempfile

    rows = [(r.doc_id, r.text) for r in docs.collect()]
    d = tempfile.mkdtemp(prefix="ixsnip_")
    build_index(docs.select("doc_id", "text"), d,
                BuildParams(num_shards=2, num_term_buckets=4,
                            lineage_groups=1, doc_id_scheme="provided"),
                source_fingerprint="snip6")
    queries = [(0, "gamma zeta"), (1, "two three"), (2, "padding")]
    top = index_search(Index(spark, d), queries, k=5)
    got = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6), r.snippet)
        for r in attach_snippets(top, docs, queries, window=3).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        (int(q), int(rk), int(di), float(s), sn)
        for q, rk, di, s, sn in con.execute(
            snippets_sql(queries, k=5, window=3)
        ).fetchall()
    )
    assert [g[:3] + (g[4],) for g in got] == [w[:3] + (w[4],) for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)
