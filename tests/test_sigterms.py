"""Significant-terms aggregation (OpenSearch `significant_terms`,
sampler shape: foreground = the top-k_hits result set).

`index_significant_terms(ix, queries, k_hits, max_terms, min_df)` —
per query, terms over-represented in its top hits vs the background
corpus, JLH-scored over distinct-doc rates (pure rational arithmetic
→ bit-identical engine/oracle doubles). Artifact-served: stored text
supplies foreground terms, the term_stats artifact the background df.

Contract pinned here:
- equals a brute-force python recompute seeded by the engine's OWN
  top-k (so the test isolates the aggregation, with foreground
  equality covered by the rank-identity suites);
- query's own tokens excluded by default, kept on request;
- min_df drops background-rare terms;
- score > 0 required (fg_rate must exceed bg_rate);
- refuses: no stored text, bad parameters.
"""

import numpy as np
import pytest

from sparkbm25.analysis import tokenize_py
from sparkbm25.build import BuildParams
from sparkbm25.corpus import add_doc_id
from sparkbm25.fixtures import make_queries, make_transcripts_pdf
from sparkbm25.index_query import index_search
from sparkbm25.jobs import Index, build_index
from sparkbm25.sigterms import index_significant_terms

QS = make_queries(6)
K_HITS, MAX_TERMS = 20, 8


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_transcripts_pdf(40)
    corpus = add_doc_id(spark.createDataFrame(pdf), "conv_seq").select(
        "doc_id", "text"
    )
    d = str(tmp_path_factory.mktemp("sig_ix"))
    build_index(
        corpus, d,
        BuildParams(num_shards=4, salt_factor=2, num_term_buckets=4,
                    lineage_groups=1, store_text=True,
                    doc_id_scheme="conv_seq"),
        "sig",
    )
    return Index(spark, d), corpus.toPandas()


def _brute(ix, docs_pdf, min_df=1, include_query_terms=False,
           k_hits=K_HITS, max_terms=MAX_TERMS):
    doc_toks = {
        r.doc_id: set(tokenize_py(r.text)) for r in docs_pdf.itertuples()
    }
    n = len(doc_toks)
    df = {}
    for ts in doc_toks.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    hits = {}
    for r in index_search(ix, QS, k=k_hits).collect():
        hits.setdefault(r.query_id, []).append(r.doc_id)
    want = set()
    for qid, text in QS:
        docs = hits.get(qid)
        if not docs:
            continue
        own = set(tokenize_py(text))
        fg = {}
        for d in docs:
            for t in doc_toks[d]:
                fg[t] = fg.get(t, 0) + 1
        rows = []
        for t, f in fg.items():
            if not include_query_terms and t in own:
                continue
            if df[t] < min_df:
                continue
            fgr = f / len(docs)
            bgr = df[t] / n
            score = (fgr - bgr) * (fgr / bgr)
            if score > 0.0:
                rows.append((t, f, df[t], score))
        rows.sort(key=lambda r: (-r[3], r[0]))
        want |= {
            (qid, t, f, d_, round(s, 9))
            for t, f, d_, s in rows[:max_terms]
        }
    return want


def _got(df):
    return {
        (r.query_id, r.term, r.fg_df, r.df, round(r.score, 9))
        for r in df.collect()
    }


def test_matches_brute(built):
    ix, docs_pdf = built
    want = _brute(ix, docs_pdf)
    assert want
    got = _got(index_significant_terms(ix, QS, k_hits=K_HITS,
                                       max_terms=MAX_TERMS))
    assert got == want


def test_min_df_and_own_terms(built):
    ix, docs_pdf = built
    got = _got(index_significant_terms(ix, QS, k_hits=K_HITS,
                                       max_terms=MAX_TERMS, min_df=3))
    assert got == _brute(ix, docs_pdf, min_df=3)
    got_own = _got(index_significant_terms(
        ix, QS, k_hits=K_HITS, max_terms=MAX_TERMS,
        include_query_terms=True,
    ))
    want_own = _brute(ix, docs_pdf, include_query_terms=True)
    assert got_own == want_own
    # the query's own corpus-present tokens must appear once included
    own_terms = {
        (qid, t) for qid, text in QS for t in tokenize_py(text)
    }
    assert any((q, t) in own_terms for q, t, *_ in got_own)
    assert not any((q, t) in own_terms for q, t, *_ in got)


def test_significance_direction(built):
    """Every reported term must be MORE frequent in the foreground than
    in the background (score > 0 ⇔ fg_rate > bg_rate)."""
    ix, docs_pdf = built
    n = len(docs_pdf)
    for r in index_significant_terms(ix, QS, k_hits=K_HITS,
                                     max_terms=MAX_TERMS).collect():
        assert r.score > 0.0
        assert r.fg_df <= r.df


def test_refusals(built, spark, tmp_path):
    ix, docs_pdf = built
    with pytest.raises(ValueError, match="k_hits"):
        index_significant_terms(ix, QS, k_hits=0)
    with pytest.raises(ValueError, match="max_terms"):
        index_significant_terms(ix, QS, max_terms=0)
    with pytest.raises(ValueError, match="min_df"):
        index_significant_terms(ix, QS, min_df=0)
    # an index without stored text refuses
    corpus = spark.createDataFrame(docs_pdf)
    d2 = str(tmp_path / "notext")
    build_index(
        corpus, d2,
        BuildParams(num_shards=2, salt_factor=2, num_term_buckets=2,
                    lineage_groups=1, doc_id_scheme="conv_seq"),
        "nt",
    )
    with pytest.raises(ValueError, match="store_text"):
        index_significant_terms(Index(spark, d2), QS)
