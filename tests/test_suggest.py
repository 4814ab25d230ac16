"""Term suggester (OpenSearch `term` suggester, suggest_mode="always").

`suggest.index_suggest(ix, tokens, max_dist, n)` — per input token,
the vocabulary terms within max_dist edits ranked (dist ASC, df DESC,
term ASC), served from the fuzzy vocabulary-expansion machinery (no
corpus scan). Pinned here:
- identity with a brute-force python recompute over the corpus
  vocabulary (dists, dfs, ranks);
- an indexed token suggests itself first (dist 0);
- multi-token inputs suggest per token under one id;
- unknown-ball tokens yield no rows; refusals on bad params.
"""

import pytest

from sparkbm25.analysis import levenshtein_py, tokenize_py
from sparkbm25.build import BuildParams
from sparkbm25.corpus import add_doc_id
from sparkbm25.fixtures import make_transcripts_pdf
from sparkbm25.jobs import Index, build_index
from sparkbm25.suggest import index_suggest

TOKENS = [
    (0, "w0007"),            # indexed -> itself at dist 0
    (1, "w007"),             # 1-edit ball
    (2, "w0x07 w0011"),      # multi-token input
    (3, "zzzzzzzzzz"),       # empty ball
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_transcripts_pdf(40)
    corpus = add_doc_id(spark.createDataFrame(pdf), "conv_seq").select(
        "doc_id", "text"
    )
    d = str(tmp_path_factory.mktemp("sug_ix"))
    build_index(
        corpus, d,
        BuildParams(num_shards=2, salt_factor=2, num_term_buckets=2,
                    lineage_groups=1, doc_id_scheme="conv_seq"),
        "sug",
    )
    return Index(spark, d), corpus.toPandas()


def _brute(docs_pdf, max_dist=2, n=5):
    df: dict[str, int] = {}
    for text in docs_pdf.text:
        for t in set(tokenize_py(text)):
            df[t] = df.get(t, 0) + 1
    want = []
    for tid, text in TOKENS:
        for tok in sorted(set(tokenize_py(text))):
            cands = sorted(
                (levenshtein_py(term, tok), -d, term, d)
                for term, d in df.items()
                if abs(len(term) - len(tok)) <= max_dist
                and levenshtein_py(term, tok) <= max_dist
            )
            want.extend(
                (tid, tok, r + 1, term, dist, d)
                for r, (dist, _nd, term, d) in enumerate(cands[:n])
            )
    return sorted(want)


def test_matches_brute(built):
    ix, docs_pdf = built
    got = sorted(
        tuple(r) for r in index_suggest(ix, TOKENS, max_dist=2, n=5).collect()
    )
    want = _brute(docs_pdf)
    assert got == want and got
    # the indexed token leads its own list at dist 0
    first = [r for r in got if r[0] == 0 and r[2] == 1]
    assert first and first[0][3] == "w0007" and first[0][4] == 0
    # the empty-ball token yields nothing
    assert not [r for r in got if r[0] == 3]


def test_refusals(built):
    ix, _docs = built
    with pytest.raises(ValueError, match="max_dist"):
        index_suggest(ix, TOKENS, max_dist=-1)
    with pytest.raises(ValueError, match="n must"):
        index_suggest(ix, TOKENS, n=0)
