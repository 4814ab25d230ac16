"""BM25F multi-field scoring: engine vs a transparent pure-Python oracle."""

import math

import pytest

from sparkbm25.analysis import tokenize_py
from sparkbm25.bm25f import TITLE_TOKENS, W_BODY, W_TITLE, bm25f_score_topk
from sparkbm25.corpus import add_doc_id
from sparkbm25.fixtures import make_queries, make_transcripts_pdf

K = 10


def _py_bm25f(docs, queries, k, t=TITLE_TOKENS, wt=W_TITLE, wb=W_BODY,
              k1=1.2, b=0.75):
    toks = {i: tokenize_py(x) for i, x in docs}
    dlw = {
        i: wt * min(len(ts), t) + wb * max(len(ts) - t, 0)
        for i, ts in toks.items()
    }
    n = len(toks)
    avgdl = sum(dlw.values()) / n
    # weighted tf + df over any-field containment
    tfw: dict[str, dict[int, float]] = {}
    for i, ts in toks.items():
        for p, term in enumerate(ts):
            tfw.setdefault(term, {}).setdefault(i, 0.0)
            tfw[term][i] += wt if p < t else wb
    out = []
    for qid, qtext in queries:
        acc: dict[int, float] = {}
        for term in tokenize_py(qtext):
            plist = tfw.get(term)
            if not plist:
                continue
            df = len(plist)
            w = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for i, f in plist.items():
                acc[i] = acc.get(i, 0.0) + w * (
                    f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dlw[i] / avgdl))
                )
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qid, r + 1, i, s) for r, (i, s) in enumerate(ranked)]
    return out


def test_bm25f_rank_identical_to_python_oracle(spark):
    pdf = make_transcripts_pdf(50)
    corpus = add_doc_id(spark.createDataFrame(pdf), "conv_seq").select(
        "doc_id", "text"
    )
    docs = [(r.doc_id, r.text) for r in corpus.collect()]
    queries = make_queries(20) + [(900, "w0001 w0001 w0002")]
    want = sorted(
        (q, rk, di, round(s, 9))
        for q, rk, di, s in _py_bm25f(docs, queries, K)
    )
    got = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9))
        for r in bm25f_score_topk(corpus, queries, k=K).collect()
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-9)


def test_bm25f_title_boost_changes_ranking(spark):
    """A term hit in the first `title_tokens` tokens must outrank the same
    term equally frequent but later in an otherwise-identical doc."""
    rows = [
        (1, "zzterm " + "filler " * 20),          # title hit
        (2, "filler " * 20 + " zzterm"),           # body hit, same length
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25f_score_topk(corpus, [(0, "zzterm")], k=2).collect()
    order = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
    assert order == [1, 2]
