"""Transparent pure-Python BM25 reference engine — the rank-identity oracle.

Plays the role of the reference's ground-truth `neighbors` datasets
(reference: benchmarking/dataset/dataset.py:79-93 loads HDF5 ground truth;
benchmarking/utils/common_utils.py:10-41 compares results against it).
The Spark engine must produce rank-identical top-k (doc ids AND scores)
against this implementation on every fixture corpus.

Intentionally simple: dict-based inverted index, float64 math, the shared
formula from sparkbm25.bm25, ties broken by ascending doc_id.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from .analysis import tokenize_py
from .bm25 import idf, tf_norm


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    doc_len: dict[int, int] = field(default_factory=dict)
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)

    @classmethod
    def build(cls, docs: list[tuple[int, str]]) -> "OracleIndex":
        """docs: list of (doc_id, text)."""
        ix = cls()
        total_len = 0
        for doc_id, text in docs:
            toks = tokenize_py(text)
            ix.doc_len[doc_id] = len(toks)
            total_len += len(toks)
            for term, tf in Counter(toks).items():
                ix.postings.setdefault(term, {})[doc_id] = tf
        ix.n_docs = len(ix.doc_len)
        ix.avgdl = total_len / ix.n_docs if ix.n_docs else 0.0
        return ix

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def score(self, query_text: str, doc_id: int,
              k1: float | None = None, b: float | None = None) -> float:
        kw = {} if k1 is None else {"k1": k1}
        if b is not None:
            kw["b"] = b
        return sum(
            idf(self.df(t), self.n_docs)
            * tf_norm(
                self.postings.get(t, {}).get(doc_id, 0),
                self.doc_len[doc_id],
                self.avgdl,
                **kw,
            )
            for t in tokenize_py(query_text)
            if self.postings.get(t, {}).get(doc_id, 0) > 0
        )

    def search(self, query_text: str, k: int = 10,
               allowed: set | None = None,
               k1: float | None = None,
               b: float | None = None,
               mode: str = "or",
               min_match: int | None = None,
               exclude: str | None = None) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), score desc, doc_id asc tie-break.

        Accumulates per query-term occurrence (duplicate query terms count
        multiply), in query order, float64 — the engine mirrors this.
        ``allowed`` restricts CANDIDATES to that doc-id set (filtered
        search: idf/avgdl stay global, matching the engine's `where=`).
        ``k1``/``b`` override the BM25 shape parameters at query time
        (idf and avgdl do not depend on them). ``mode='and'`` keeps only
        docs containing EVERY distinct query token (a token absent from
        the corpus empties the result) — scores are unchanged full sums."""
        # mirror the engine's validation: a typo'd mode must raise here
        # too, or a parity test would compare OR vs OR and mask a gap
        if mode not in ("or", "and"):
            raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
        if min_match is not None:
            if mode == "and":
                raise ValueError(
                    "min_match composes with mode='or' only (mode='and' "
                    "is already full coverage)"
                )
            if not isinstance(min_match, int) or min_match < 1:
                raise ValueError(
                    f"min_match must be an int >= 1, got {min_match!r}"
                )
        kw = {} if k1 is None else {"k1": k1}
        if b is not None:
            kw["b"] = b
        acc: dict[int, float] = {}
        for t in tokenize_py(query_text):
            plist = self.postings.get(t)
            if not plist:
                continue
            w = idf(self.df(t), self.n_docs)
            for doc_id, tf in plist.items():
                if allowed is not None and doc_id not in allowed:
                    continue
                acc[doc_id] = acc.get(doc_id, 0.0) + w * tf_norm(
                    tf, self.doc_len[doc_id], self.avgdl, **kw
                )
        if mode == "and":
            toks = set(tokenize_py(query_text))
            acc = {
                d: s for d, s in acc.items()
                if all(d in self.postings.get(t, {}) for t in toks)
            }
        if min_match is not None and min_match > 1:
            # minimum-should-match: >= min_match DISTINCT query tokens
            # must match (a corpus-absent token can never match)
            toks = set(tokenize_py(query_text))
            acc = {
                d: s for d, s in acc.items()
                if sum(d in self.postings.get(t, {}) for t in toks)
                >= min_match
            }
        if exclude is not None:
            # MUST_NOT: drop docs containing ANY excluded token
            ex = set(tokenize_py(exclude))
            acc = {
                d: s for d, s in acc.items()
                if not any(d in self.postings.get(t, {}) for t in ex)
            }
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_prefix(
        self, query_text: str, k: int = 10,
        max_expansions: int | None = None,
        k1: float | None = None, b: float | None = None,
    ) -> list[tuple[int, float]]:
        """Trailing-wildcard top-k: each '*'-marked token expands to every
        vocabulary term starting with its stem (capped to the
        ``max_expansions`` highest-df terms, df desc / term asc — the
        engine's deterministic cap), each expansion folding as one
        occurrence with its own idf in term-asc order at the wildcard's
        query position."""
        from .analysis import parse_prefix_query

        kw = {} if k1 is None else {"k1": k1}
        if b is not None:
            kw["b"] = b
        acc: dict[int, float] = {}
        for stem, is_pref in parse_prefix_query(query_text):
            if is_pref:
                terms = [t for t in self.postings if t.startswith(stem)]
                if max_expansions is not None and len(terms) > max_expansions:
                    terms.sort(key=lambda t: (-len(self.postings[t]), t))
                    del terms[max_expansions:]
                terms.sort()
            else:
                terms = [stem] if stem in self.postings else []
            for t in terms:
                w = idf(self.df(t), self.n_docs)
                for doc_id, tf in self.postings[t].items():
                    acc[doc_id] = acc.get(doc_id, 0.0) + w * tf_norm(
                        tf, self.doc_len[doc_id], self.avgdl, **kw
                    )
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_fuzzy(
        self, query_text: str, k: int = 10,
        max_dist: int = 1,
        max_expansions: int | None = None,
        k1: float | None = None, b: float | None = None,
    ) -> list[tuple[int, float]]:
        """Fuzzy top-k: each token expands to every vocabulary term within
        ``max_dist`` Levenshtein edits (capped to the ``max_expansions``
        highest-df terms, df desc / term asc), each expansion folding as
        one occurrence with its own idf in term-asc order at the token's
        query position — index_fuzzy_search's semantics."""
        from .analysis import levenshtein_py, tokenize_py

        kw = {} if k1 is None else {"k1": k1}
        if b is not None:
            kw["b"] = b
        acc: dict[int, float] = {}
        for stem in tokenize_py(query_text):
            terms = [
                t for t in self.postings
                if abs(len(t) - len(stem)) <= max_dist
                and levenshtein_py(t, stem) <= max_dist
            ]
            if max_expansions is not None and len(terms) > max_expansions:
                terms.sort(key=lambda t: (-len(self.postings[t]), t))
                del terms[max_expansions:]
            terms.sort()
            for t in terms:
                w = idf(self.df(t), self.n_docs)
                for doc_id, tf in self.postings[t].items():
                    acc[doc_id] = acc.get(doc_id, 0.0) + w * tf_norm(
                        tf, self.doc_len[doc_id], self.avgdl, **kw
                    )
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_all(
        self, queries: list[tuple[int, str]], k: int = 10,
        allowed: set | None = None,
        k1: float | None = None, b: float | None = None,
        mode: str = "or",
        min_match: int | None = None,
        exclude: dict[int, str] | None = None,
    ) -> list[tuple[int, int, int, float]]:
        """[(query_id, rank(1-based), doc_id, score)] over a query set."""
        out = []
        for qid, qtext in queries:
            ranked = self.search(qtext, k, allowed=allowed, k1=k1, b=b,
                                 mode=mode, min_match=min_match,
                                 exclude=(exclude or {}).get(qid))
            for rank, (doc_id, score) in enumerate(ranked, start=1):
                out.append((qid, rank, doc_id, score))
        return out

    def search_prefix_all(
        self, queries: list[tuple[int, str]], k: int = 10,
        max_expansions: int | None = None,
        k1: float | None = None, b: float | None = None,
    ) -> list[tuple[int, int, int, float]]:
        out = []
        for qid, qtext in queries:
            ranked = self.search_prefix(qtext, k, max_expansions,
                                        k1=k1, b=b)
            for rank, (doc_id, score) in enumerate(ranked, start=1):
                out.append((qid, rank, doc_id, score))
        return out
