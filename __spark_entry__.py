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
from sparkbm25.bm25f import bm25f_topk_sql as _bm25f_topk_sql
from sparkbm25.sigterms import significant_terms_sql as _sig_terms_sql
from sparkbm25.suggest import suggest_sql as _suggest_sql
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


FILTER_LANG = "en"  # the filtered-search driver predicate (majority class)


def _entry_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (idempotent, /tmp-cached, version-keyed) the shared entry
    index over the documents table — with lang/source stored as filterable
    attributes so the filtered-search query shares one artifact."""
    import hashlib

    from sparkbm25.build import BuildParams
    from sparkbm25.jobs import build_index

    import sparkbm25

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # version in the cache key: a stale /tmp artifact from an older engine
    # revision (prior round) must never be served by newer code
    tag = hashlib.sha1(f"{sf_dir}@{sparkbm25.__version__}".encode()).hexdigest()[:10]
    ix_dir = f"/tmp/sparkbm25_entry/ix_{tag}"
    # store_positions: ONE shared artifact serves scoring, filtered, tuned
    # AND phrase queries (the scoring kernels' column pruning drops the
    # positional stream from their scans, so they pay nothing at query);
    # n_chars feeds the histogram/stats aggregation queries
    params = BuildParams(num_shards=8, salt_factor=2, num_term_buckets=16,
                         lineage_groups=2,
                         attr_cols=("lang", "source", "n_chars"),
                         store_positions=True)
    build_index(docs, ix_dir, params, source_fingerprint=sf_dir)  # idempotent
    return ix_dir


def q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship results via the FULL engine: salted SPIMI build into a
    compressed block index, then shard-grouped exact search (SURVEY §2.4 A1
    + §2.5 T1). Oracle: identical SQL as bm25_topk — the index must be a
    pure representation change."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K)
    return out.withColumn("score", F.round("score", 6))


TUNED_K1, TUNED_B = 0.9, 0.4  # short-doc tuning — the query-time override


def q_bm25_topk_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time BM25 parameter override (k1=0.9, b=0.4) on the SAME
    index artifact — no rebuild: tf/doc-lengths are stored raw and
    tf_norm is kernel-computed (the reference's search-time knob sweep,
    benchmarks.yml ef_search). Oracle: same SQL with the tuned constants
    in the tf_norm fragment."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K,
                       k1=TUNED_K1, b=TUNED_B)
    return out.withColumn("score", F.round("score", 6))


def q_bm25_page2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor pagination (OpenSearch search_after analog): run page 1
    (top-K), take each query's last hit as a stateless (score, doc_id)
    cursor, and serve page 2 as the top-K STRICTLY after the cursor in
    the (score DESC, doc_id ASC) total order — no deep re-ranking, the
    kernel masks folded scores before local top-k extraction. Oracle:
    the same BM25 SQL windowed to ranks K+1..2K (rank-identity of the
    shared total order). Cursors use the engine's UNROUNDED page-1
    scores (bit-exact across routes); queries with a short first page
    have no page 2. Reference analog: repeated top-k harness calls
    (benchmarking/search/search_indices.py)."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    ix = Index(spark, ix_dir)
    # page 1: k*|queries| rows — a driver-bounded collect by construction
    page1: dict[int, list] = {}
    for r in index_search(ix, DOC_QUERIES, k=K).collect():
        page1.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    # sort by rank before taking the cursor: collect() row order is not a
    # contract (ADVICE r06) — the cursor must be the rank-K hit, not
    # whichever row happened to arrive last
    for rows in page1.values():
        rows.sort()
    cursors = {
        qid: (rows[-1][2], rows[-1][1])
        for qid, rows in page1.items()
        if len(rows) == K and rows[-1][0] == K
    }
    qs2 = [(qid, txt) for qid, txt in DOC_QUERIES if qid in cursors]
    out = index_search(ix, qs2, k=K, search_after=cursors)
    return out.withColumn("score", F.round("score", 6))


def q_bm25_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered search: exact top-k among docs with lang = FILTER_LANG,
    global idf/avgdl (standard filter-narrows-candidates semantics). The
    qualifying ids cogroup with the posting blocks on the doc-range key —
    no broadcast, scales with the corpus. Oracle: the same BM25 SQL with
    the candidate CTE restricted by the same predicate."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K,
                       where={"lang": FILTER_LANG})
    return out.withColumn("score", F.round("score", 6))


HIST_WIDTH = 50  # n_chars spans ~48..553 -> ~10 buckets


def q_search_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram aggregation over the match set (OpenSearch `histogram`
    analog): per query, doc counts in fixed-width n_chars buckets over
    ALL docs matching >= 1 query token — the facet candidate-set
    semantics with a computed numeric bucket (floor(n_chars/width)*
    width). Served by the facet kernel over a bucket-valued attribute
    side (side-grouped direct plan on layout 2). Oracle: the same
    match CTE grouped by the same bucket expression."""
    from sparkbm25.facets import index_histogram
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    return index_histogram(Index(spark, ix_dir), DOC_QUERIES,
                           on="n_chars", width=HIST_WIDTH)


def q_search_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats aggregation over the match set (OpenSearch `stats` analog):
    per query, (n_docs, min_v, max_v, sum_v, avg_v) of n_chars over all
    matching docs — partial (n, sum, min, max) folds in the kernel, one
    tiny final fold, |queries| output rows regardless of match volume.
    Exact vs the SQL oracle: n_chars is integer-valued, so f64 partial
    sums are order-free below 2^53 and avg is the division of the same
    two exact doubles."""
    from sparkbm25.facets import index_stats
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    return index_stats(Index(spark, ix_dir), DOC_QUERIES, on="n_chars")


SUGGEST_TOKENS: list[tuple[int, str]] = [
    (0, "spark"),      # indexed -> itself at dist 0
    (1, "spakr"),      # 2-edit misspelling
    (2, "windov"),     # 1-edit
    (3, "vectr batc"),  # multi-token input
    (4, "zzzzzzzzzzzz"),  # empty ball -> no rows
]
SUGGEST_DIST, SUGGEST_N = 2, 5


def q_term_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term suggester (OpenSearch `term` suggester, "did you mean"):
    per input token, the top-N vocabulary terms within SUGGEST_DIST
    edits ranked dist ASC, df DESC, term ASC — served from the fuzzy
    vocabulary-expansion machinery (preloaded cache or windowed plan),
    no corpus scan. Integer order -> exact oracle agreement."""
    from sparkbm25.jobs import Index
    from sparkbm25.suggest import index_suggest

    ix_dir = _entry_index(spark, sf_dir)
    return index_suggest(Index(spark, ix_dir), SUGGEST_TOKENS,
                         max_dist=SUGGEST_DIST, n=SUGGEST_N)


def q_search_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-count API (OpenSearch `_count`): per query, how many docs
    match >= 1 token — the candidate-set size disjunctive retrieval
    ranks over, served from the posting blocks without scoring."""
    from sparkbm25.facets import index_count
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    return index_count(Index(spark, ix_dir), DOC_QUERIES)


def q_search_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality aggregation (OpenSearch `cardinality`, exact): per
    query, the number of distinct `source` values over all matching
    docs. The facet kernel's partials are one row per distinct (query,
    value) per shard, so the final distinct-count shuffles an
    attribute-bounded frame, never a doc-bounded one."""
    from sparkbm25.facets import index_cardinality
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    return index_cardinality(Index(spark, ix_dir), DOC_QUERIES,
                             on="source")


def q_bm25_collapse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing (OpenSearch `collapse`): per query, the top-K
    keeps only the BEST doc per distinct `source` value (total order
    score DESC, doc_id ASC), re-ranked over the group representatives —
    "best hit per source". Served from the stored-attribute side
    (side-grouped direct plan: blocks pyarrow-read in-task, only the
    attribute side shuffles). Oracle: the same BM25 SQL with a
    group-best row_number between scoring and ranking."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K,
                       collapse="source")
    return out.withColumn("score", F.round("score", 6))


DOC_PHRASES: list[tuple[int, str]] = [
    (0, "sort table"),
    (1, "batch batch"),      # repeated-term phrase
    (2, "merge join"),
    (3, "join order batch"),  # rare 3-gram
    (4, "data zzabsentzz"),   # absent term -> no rows
    (5, "window"),            # single-term phrase (ptf == tf)
    (6, "stream spark"),
]


def q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over POSITIONAL postings (SURVEY §2.5 T1
    extension; VERDICT r04 next-round #1): docs containing the exact token
    sequence, BM25-ranked over the phrase frequency (phrase as composite
    term). Oracle: positional list_filter intersection + the same
    idf/tf_norm fragments."""
    from sparkbm25.index_query import index_phrase_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_phrase_search(Index(spark, ix_dir), DOC_PHRASES, k=K)
    return out.withColumn("score", F.round("score", 6))


NEAR_SLOP = 2
# proximity phrases: pairs/triples of co-occurring testdata words where
# intervening tokens are common, so slop>0 matches strictly more than
# exact adjacency; plus a single-term and an absent-term edge case
DOC_NEAR_PHRASES: list[tuple[int, str]] = [
    (0, "sort join"),
    (1, "merge table"),
    (2, "data batch window"),
    (3, "stream zzabsentzz"),   # absent term -> no rows
    (4, "group"),               # single term: slop-independent
    (5, "join join"),           # repeated term with gaps
]


def q_phrase_near_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity (sloppy) phrase search over POSITIONAL postings: ordered
    chains with up to NEAR_SLOP intervening tokens per consecutive term
    pair (Lucene SloppyPhraseQuery analog with a per-gap bound), ranked
    by BM25 over the chain-start frequency. Oracle: the same start-filter
    SQL with every gap combination unrolled into an OR."""
    from sparkbm25.index_query import index_phrase_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_phrase_search(Index(spark, ix_dir), DOC_NEAR_PHRASES, k=K,
                              slop=NEAR_SLOP)
    return out.withColumn("score", F.round("score", 6))


def q_search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted search (ES terms-aggregation analog): per query, count ALL
    docs matching >= 1 query token, grouped by the stored lang attribute.
    Counting happens inside the doc-range cogrouped kernel (partials of at
    most |values| rows per group) — one shuffle, no broadcast. Oracle:
    distinct (query, doc) matches joined to the attribute, GROUP BY."""
    from sparkbm25.facets import index_facets
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    return index_facets(Index(spark, ix_dir), DOC_QUERIES, by="lang")


FUZZY_DIST, FUZZY_MAX_EXP = 1, 8
# typo'd queries over the documents vocabulary: single-edit typos of
# common testdata words (the engine must recover them via edit-distance
# expansion), one clean token, and one token with no 1-edit neighbor
DOC_FUZZY_QUERIES: list[tuple[int, str]] = [
    (0, "sord table"),       # substitution typo + clean token
    (1, "merge joim"),       # clean + substitution typo
    (2, "windoq"),           # single typo'd token
    (3, "batc group"),       # deletion typo + clean token
    (4, "zzzzzzzz"),         # no 1-edit neighbor -> no rows
]


def q_bm25_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy retrieval (Lucene FuzzyQuery analog): every token expands to
    vocabulary terms within FUZZY_DIST Levenshtein edits, capped to the
    FUZZY_MAX_EXP highest-df expansions (df DESC, term ASC), each
    scoring as one occurrence with its own idf. Oracle: the same
    levenshtein-join expansion + cap window."""
    from sparkbm25.index_query import index_fuzzy_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_fuzzy_search(Index(spark, ix_dir), DOC_FUZZY_QUERIES, k=K,
                             max_dist=FUZZY_DIST,
                             max_expansions=FUZZY_MAX_EXP)
    return out.withColumn("score", F.round("score", 6))


MLT_LIKE_IDS = [0, 3, 7]
MLT_MAX_TERMS = 10


def q_mlt_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this (Lucene MLT analog): per source doc, its top
    MLT_MAX_TERMS terms by the pure-rational interest weight
    tf*(n-df+0.5)/(df+0.5) (bit-identical selection across engines —
    sparkbm25.mlt module doc) become a BM25 disjunctive query; the source
    doc is excluded from its own result. Corpus-scan composition here
    (the correctness reference); the artifact-served path (stored text +
    term_stats lookup + one index_search) is rank-identity-gated in
    tests/test_mlt.py."""
    from sparkbm25.mlt import more_like_this

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    out = more_like_this(docs, MLT_LIKE_IDS, k=K, max_terms=MLT_MAX_TERMS)
    return out.withColumn("score", F.round("score", 6))


EXPLAIN_K = 5


def q_score_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene-`explain` analog: per-term BM25 score breakdown for each
    top-EXPLAIN_K hit — (term, qtf, tf, doc_len, df, idf, tf_norm,
    contrib) rows whose contribs sum to the hit's score. One Arrow tf
    pass; ranks from the identical canonical-fold scoring. Oracle: the
    same contribution projection joined to the ranked CTE."""
    from sparkbm25.query import explain_scores

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return explain_scores(docs, DOC_QUERIES, k=EXPLAIN_K)


SNIPPET_WINDOW = 3


def q_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-UI result lines: the indexed top-k plus a snippet column —
    the token window around each hit's FIRST query-term match (pure
    Catalyst array ops over the shared tokenizer; results broadcast onto
    the source scan). Oracle: the same window/array_to_string composition
    over the bm25_topk SQL."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index
    from sparkbm25.snippets import attach_snippets

    ix_dir = _entry_index(spark, sf_dir)
    top = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K)
    out = attach_snippets(
        top, _docs(spark, sf_dir), DOC_QUERIES, window=SNIPPET_WINDOW
    )
    return out.withColumn("score", F.round("score", 6))


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F field-weighted ranking (VERDICT r04 next-round #7): title =
    first TITLE_TOKENS tokens at weight 2, body at weight 1, folded into
    weighted tf / weighted dl before one saturation pass (Robertson &
    Zaragoza 2009 §3.3 simple BM25F). Integer weights keep every weighted
    sum exact in f64, so engine and oracle agree bit-for-bit pre-rounding.
    Oracle: identical composition over list-sliced fields.

    Round 6: served FROM THE INDEX — per-field tf derives from the
    positional stream (index_query.index_bm25f_search), so field-boosted
    ranking no longer re-reads the corpus at query time; the corpus-scan
    path (bm25f.bm25f_score_topk) remains the engine-side cross-check."""
    from sparkbm25.index_query import index_bm25f_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_bm25f_search(Index(spark, ix_dir), DOC_QUERIES, k=K)
    return out.withColumn("score", F.round("score", 6))


def q_bm25_and_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive retrieval (mode='and'): only docs containing EVERY
    distinct query token rank (Lucene BooleanQuery-MUST analog). Scores
    are the same full BM25 sums — coverage is a group-local test in the
    doc-range-sharded kernel, both routes. Query 3's absent token makes
    its conjunction unsatisfiable (no rows), same as the oracle."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K, mode="and",
                       strategy="blockmax")
    return out.withColumn("score", F.round("score", 6))


MSM = 2  # minimum-should-match threshold for the driver query


def q_bm25_msm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-should-match retrieval (Lucene BooleanQuery
    minimumNumberShouldMatch analog): only docs matching >= MSM distinct
    query tokens rank; scores stay the full OR sums. Single-token q6 and
    q3 (one corpus-present token) are unsatisfiable at MSM=2 — no rows,
    same as the oracle's HAVING threshold."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K,
                       min_match=MSM, strategy="blockmax")
    return out.withColumn("score", F.round("score", 6))


# MUST_NOT token sets per query: a head term (0), a term excluded here but
# scored by another query (7 excludes 'group', scored in query 5 — the
# both-roles kernel path), a corpus-absent exclusion no-op (5), and an
# exclusion on a query whose positive terms partly miss the corpus (3)
NOT_EXCLUDE: dict[int, str] = {
    0: "table",
    3: "row",
    5: "zzabsentzz",
    7: "group batch",
}


def q_bm25_not_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean MUST_NOT retrieval: docs containing any excluded token are
    dropped from that query's ranking (surviving scores bitwise
    unchanged — exclusion narrows candidates, idf/avgdl stay global).
    Exclusion blocks ride the same fetch; presence-only in the kernel."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_search(Index(spark, ix_dir), DOC_QUERIES, k=K,
                       exclude=NOT_EXCLUDE, strategy="blockmax")
    return out.withColumn("score", F.round("score", 6))


# trailing-wildcard query set over the documents vocabulary: stem sizes
# from 1 expansion to >cap (the deterministic df-desc cap must bind), an
# absent stem, and an exact+prefix duplicate of the same stem
DOC_PREFIX_QUERIES: list[tuple[int, str]] = [
    (0, "spark mer*"),
    (1, "wind*"),
    (2, "s*"),             # broad stem — the expansion cap binds here
    (3, "customer zz*"),   # absent stem: exact term still scores
    (4, "batch bat*"),     # exact + prefix over the same stem
]
PREFIX_MAX_EXP = 8


def q_bm25_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-wildcard search (Lucene PrefixQuery analog): 'mer*'
    expands against the vocabulary artifact driver-side (capped to the
    PREFIX_MAX_EXP highest-df terms per stem, df desc / term asc —
    deterministic, so the oracle replicates it with a window), each
    expansion scoring with its own idf through the unchanged kernels."""
    from sparkbm25.index_query import index_prefix_search
    from sparkbm25.jobs import Index

    ix_dir = _entry_index(spark, sf_dir)
    out = index_prefix_search(Index(spark, ix_dir), DOC_PREFIX_QUERIES,
                              k=K, max_expansions=PREFIX_MAX_EXP)
    return out.withColumn("score", F.round("score", 6))


# --- training-data pipeline ops (dedup / similarity / text analysis) -------

JACCARD_T = 0.5  # every real near-dup pair in the data is >= 0.5 — the
# MEASURED minimum true-pair Jaccard is 0.9 at sf0.01 and 0.8 at sf0.1
JACCARD_BANDS = 32  # r=2, b=32 = 64 hashes — half the signature kernel
# cost of the b=64 default. Miss probability per TRUE pair at the measured
# minimum J=0.8: (1 - 0.64)^32 ~ 6.5e-15 (worst-case at the J=0.5
# threshold contract: 1e-4); verification removes all false positives, so
# the exact-Jaccard oracle comparison is sound at this geometry.
JACCARD_MAX_DF = 1024  # stop-shingle cap: bounds the inverted-index self-
# join fan-out to max_df^2/2 rows per shingle at 100 TB; exact on the
# testdata (measured max shingle df: 7 at sf0.01, 25 at sf0.1)
COS_PAIR_T = 0.4
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
# hybrid retrieval: each DOC_QUERY text paired with a probe vector from the
# aligned embeddings table (vec_id == doc_id domain; the container has no
# embedding model, so query vectors are row lookups — the ann convention)
HYBRID_QUERIES: list[tuple[int, str, int]] = [
    (qid, text, qid) for qid, text in DOC_QUERIES
]
HYBRID_N_EACH = 50  # per-leg top-n cut before fusion


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkbm25.pipeline.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs with the stop-shingle guard pinned: a
    boilerplate shingle can no longer quadratically dominate the self-join
    (conservative approximation, exact at the measured testdata dfs)."""
    from sparkbm25.pipeline.dedup import jaccard_pairs

    return jaccard_pairs(_docs(spark, sf_dir), JACCARD_T, max_df=JACCARD_MAX_DF)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates, exact-verified — compared against the exact
    Jaccard oracle (b=32 geometry: miss probability ~6.5e-15 at the
    measured true-pair minimum J=0.8; see JACCARD_BANDS)."""
    from sparkbm25.pipeline.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), JACCARD_T,
                             n_bands=JACCARD_BANDS)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs folded into dedup GROUPS: connected components over
    the MinHash-LSH edge list — the near-linear scale path (banded
    candidate join + exact verification), not the quadratic shingle
    self-join. The DuckDB oracle stays the recursive-CTE transitive closure
    over EXACT Jaccard pairs: sound because at the measured true-pair
    minimum J=0.8 the r=2,b=32 banding misses a true edge w.p. ~6.5e-15
    and verification removes false edges, so the edge lists (hence
    components) coincide. Label propagation is the right variant HERE
    (near-dup clusters are clique-ish, diameter 1-3 = 1-3 rounds);
    connected_components_star is the drop-in for long-chain graphs."""
    from sparkbm25.pipeline.dedup import connected_components, minhash_lsh_pairs

    ensure_shipped(spark)
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), JACCARD_T,
                              n_bands=JACCARD_BANDS)
    return connected_components(pairs)


MIN_QUALITY = 0.75  # inside the data's quality range (measured 0.62-0.95
# at both gate scales) so kept has a real mix; the compare is on the
# 6dp-ROUNDED quality column both engines already hash-match exactly
CURATE_LANGS = ("en",)


def q_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The integrative curation decision table: exact-dedup keep-one +
    near-dup-cluster keep-one (LSH edges at the pinned b=32 geometry) +
    quality floor + language filter, one flags row per document."""
    from sparkbm25.pipeline.curate import curate

    ensure_shipped(spark)
    return curate(_docs(spark, sf_dir), JACCARD_T, MIN_QUALITY,
                  CURATE_LANGS, n_bands=JACCARD_BANDS)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkbm25.pipeline.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkbm25.pipeline.similarity import cosine_topk

    ensure_shipped(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, ANN_QUERY_IDS, k=K)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold pair join via the ROUTER: cos 0.4 is a bulk threshold (no
    angular margin -> LSH degenerates), so this runs the exact tile join
    with n_blocks auto-derived from (count, dim) — per-task memory stays
    inside the task budget at any corpus size; margin thresholds (>=0.7)
    would route to the near-linear LSH path automatically."""
    from sparkbm25.pipeline.similarity import cosine_pairs_auto

    ensure_shipped(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_pairs_auto(emb, COS_PAIR_T)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN via the PERSISTED index artifact (vectors partitioned by
    centroid_id → partition-pruned probes). Run at full probe here so the
    result is exact and value-checkable against the SQL oracle; the
    partial-probe recall path is gated in tests/test_ann_index_skew.py."""
    import hashlib

    from pyspark.sql import functions as F

    from sparkbm25.pipeline.similarity import ann_index_search, build_ann_index

    import sparkbm25

    import json
    import os

    ensure_shipped(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tag = hashlib.sha1(f"{sf_dir}@{sparkbm25.__version__}".encode()).hexdigest()[:10]
    d = f"/tmp/sparkbm25_entry/ann_{tag}"
    if not os.path.exists(f"{d}/manifest.json"):
        # n_centroids auto-derived: max(16, floor(sqrt(n))) — the
        # reference's n_lists rule (index_builder_utils.py:29-41)
        build_ann_index(emb, d)
    qvecs = {
        r.vec_id: list(r.embedding)
        for r in emb.filter(F.col("vec_id").isin(ANN_QUERY_IDS)).collect()
    }
    with open(f"{d}/manifest.json") as f:
        n_centroids = int(json.load(f)["n_centroids"])
    return ann_index_search(spark, d, qvecs, k=K, n_probe=n_centroids)


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval: BM25 and cosine top-n legs fused
    with reciprocal-rank fusion (rrf_score = sum 1/(60+rank), rank-only —
    no score normalization, so the fold is bit-exact vs the SQL oracle).
    The correctness-reference composition (corpus-scan BM25 + exact
    cosine); the artifact-served path (posting index + IVF) is
    rank-identity-gated in tests/test_hybrid.py."""
    from sparkbm25.hybrid import hybrid_rrf_topk

    ensure_shipped(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return hybrid_rrf_topk(docs, emb, HYBRID_QUERIES, k=K,
                           n_each=HYBRID_N_EACH)


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkbm25.pipeline.textstats import token_counts

    return token_counts(_docs(spark, sf_dir))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkbm25.pipeline.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkbm25.pipeline.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 bigrams by occurrence count (vocabulary analysis)."""
    from sparkbm25.pipeline.textstats import top_ngrams

    return top_ngrams(_docs(spark, sf_dir), n=2, k=50)


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkbm25.pipeline.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup over the events stream table (batch form;
    the streaming form with watermark is tested in tests/test_events.py)."""
    from sparkbm25.pipeline.events import hourly_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hourly_rollup(ev)


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) per user."""
    from sparkbm25.pipeline.events import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, 30)


def _entry_text_index(spark: SparkSession, sf_dir: str) -> str:
    """store_text=True sibling of the entry index (idempotent, /tmp-
    cached, version-keyed) — serves the stored-field fetch query AND the
    significant-terms aggregation (both need the text in the artifact)."""
    import hashlib

    from sparkbm25.build import BuildParams
    from sparkbm25.jobs import build_index

    import sparkbm25

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tag = hashlib.sha1(
        f"{sf_dir}@{sparkbm25.__version__}@text".encode()
    ).hexdigest()[:10]
    ix_dir = f"/tmp/sparkbm25_entry/ixt_{tag}"
    params = BuildParams(num_shards=8, salt_factor=2, num_term_buckets=16,
                         lineage_groups=1, store_text=True)
    build_index(docs, ix_dir, params, source_fingerprint=sf_dir)
    return ix_dir


def q_bm25_topk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k + stored-field fetch: a store_text=True index serves the
    search AND the document text from its own artifact (the inverse of the
    reference's skip-stored-vectors, SURVEY §2.2 P6) — the fetched text
    must equal the source table's, value-hashed against the SQL top-k
    joined to documents."""
    from sparkbm25.index_query import index_search
    from sparkbm25.jobs import Index

    ix = Index(spark, _entry_text_index(spark, sf_dir))
    out = ix.fetch_text(index_search(ix, DOC_QUERIES, k=K))
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 6).alias("score"),
        "text",
    )


SIG_K_HITS, SIG_MAX_TERMS, SIG_MIN_DF = 30, 8, 2


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Significant-terms aggregation (OpenSearch significant_terms under
    its sampler shape): per query, the terms over-represented in its top
    SIG_K_HITS result docs vs the background corpus, scored by the JLH
    heuristic over distinct-doc rates — pure rational arithmetic, so the
    engine and the SQL oracle agree bitwise; foreground equality follows
    from top-k rank identity. Artifact-served: stored text supplies the
    foreground terms, term_stats the background df (no corpus re-scan)."""
    from sparkbm25.jobs import Index
    from sparkbm25.sigterms import index_significant_terms

    ix = Index(spark, _entry_text_index(spark, sf_dir))
    out = index_significant_terms(
        ix, DOC_QUERIES, k_hits=SIG_K_HITS, max_terms=SIG_MAX_TERMS,
        min_df=SIG_MIN_DF,
    )
    return out.withColumn("score", F.round("score", 6))


def q_events_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type, top-3 users by event count (grouped-top-k window)."""
    from sparkbm25.pipeline.events import user_topk

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return user_topk(ev, 3)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns + Arrow feature kernel (decode stubbed —
    deterministic byte histogram). The (doc_id, media_type, n_bytes)
    projection is value-hashed against a DuckDB oracle; the histogram
    features are value-checked against a numpy recompute in
    tests/test_pipeline.py (bytes aren't portable ANSI SQL)."""
    from sparkbm25.pipeline.multimodal import attach_fake_media, fake_features

    media = attach_fake_media(_docs(spark, sf_dir))
    return fake_features(media).select("doc_id", "media_type", "n_bytes")


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan over video rows (pure Catalyst explode)."""
    from sparkbm25.pipeline.multimodal import attach_fake_media, frame_sample

    return frame_sample(attach_fake_media(_docs(spark, sf_dir)), every=5)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "bm25_topk_indexed": q_bm25_topk_indexed,
        "bm25_topk_filtered": q_bm25_topk_filtered,
        "bm25_topk_tuned": q_bm25_topk_tuned,
        "phrase_topk": q_phrase_topk,
        "phrase_near_topk": q_phrase_near_topk,
        "search_facets": q_search_facets,
        "search_snippets": q_search_snippets,
        "score_explain": q_score_explain,
        "bm25_fuzzy_topk": q_bm25_fuzzy_topk,
        "mlt_topk": q_mlt_topk,
        "bm25f_topk": q_bm25f_topk,
        "bm25_and_topk": q_bm25_and_topk,
        "bm25_msm_topk": q_bm25_msm_topk,
        "bm25_not_topk": q_bm25_not_topk,
        "bm25_prefix_topk": q_bm25_prefix_topk,
        "bm25_page2_topk": q_bm25_page2_topk,
        "bm25_collapse_topk": q_bm25_collapse_topk,
        "search_histogram": q_search_histogram,
        "search_stats": q_search_stats,
        "significant_terms": q_significant_terms,
        "search_cardinality": q_search_cardinality,
        "search_count": q_search_count,
        "term_suggest": q_term_suggest,
        "doc_stats": q_doc_stats,
        "term_stats": q_term_stats,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "curate": q_curate,
        "ann_cosine_topk": q_ann_cosine_topk,
        "hybrid_rrf_topk": q_hybrid_rrf_topk,
        "embedding_neardup": q_embedding_neardup,
        "ann_ivf_topk": q_ann_ivf_topk,
        "token_counts": q_token_counts,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "top_ngrams": q_top_ngrams,
        "bm25_topk_text": q_bm25_topk_text,
        "events_hourly": q_events_hourly,
        "events_sessionize": q_events_sessionize,
        "events_user_topk": q_events_user_topk,
        "multimodal_features": q_multimodal_features,
        "multimodal_frames": q_multimodal_frames,
    }


def oracle_sql() -> dict[str, str]:
    from sparkbm25 import hybrid as HY
    from sparkbm25 import mlt as MLT
    from sparkbm25.pipeline import curate as CU
    from sparkbm25.pipeline import dedup as DD
    from sparkbm25.pipeline import events as EV
    from sparkbm25.pipeline import multimodal as MM
    from sparkbm25.pipeline import similarity as SIM
    from sparkbm25.pipeline import textstats as TS

    return {
        "bm25_topk": sqlgen.bm25_topk_sql(DOC_QUERIES, k=K),
        "bm25_topk_indexed": sqlgen.bm25_topk_sql(DOC_QUERIES, k=K),
        "bm25_topk_filtered": sqlgen.bm25_topk_sql(
            DOC_QUERIES, k=K, filter_where=f"lang = '{FILTER_LANG}'"
        ),
        "bm25_topk_tuned": sqlgen.bm25_topk_sql(
            DOC_QUERIES, k=K, k1=TUNED_K1, b=TUNED_B
        ),
        "phrase_topk": sqlgen.phrase_topk_sql(DOC_PHRASES, k=K),
        "phrase_near_topk": sqlgen.phrase_topk_sql(
            DOC_NEAR_PHRASES, k=K, slop=NEAR_SLOP
        ),
        "search_facets": sqlgen.facets_sql(DOC_QUERIES, by="lang"),
        "search_snippets": sqlgen.snippets_sql(
            DOC_QUERIES, k=K, window=SNIPPET_WINDOW
        ),
        "score_explain": sqlgen.explain_sql(DOC_QUERIES, k=EXPLAIN_K),
        "bm25_fuzzy_topk": sqlgen.fuzzy_topk_sql(
            DOC_FUZZY_QUERIES, k=K, max_dist=FUZZY_DIST,
            max_expansions=FUZZY_MAX_EXP,
        ),
        "mlt_topk": MLT.more_like_this_sql(
            MLT_LIKE_IDS, k=K, max_terms=MLT_MAX_TERMS
        ),
        "bm25f_topk": _bm25f_topk_sql(DOC_QUERIES, k=K),
        "bm25_and_topk": sqlgen.bm25_topk_sql(DOC_QUERIES, k=K, mode="and"),
        "bm25_msm_topk": sqlgen.bm25_topk_sql(
            DOC_QUERIES, k=K, min_match=MSM
        ),
        "bm25_not_topk": sqlgen.bm25_topk_sql(
            DOC_QUERIES, k=K, exclude=NOT_EXCLUDE
        ),
        "bm25_prefix_topk": sqlgen.prefix_topk_sql(
            DOC_PREFIX_QUERIES, k=K, max_expansions=PREFIX_MAX_EXP
        ),
        "bm25_page2_topk": sqlgen.bm25_topk_sql(
            DOC_QUERIES, k=K, page_after_rank=K
        ),
        "bm25_collapse_topk": sqlgen.bm25_topk_sql(
            DOC_QUERIES, k=K, collapse_by="source"
        ),
        "search_histogram": sqlgen.histogram_sql(
            DOC_QUERIES, on="n_chars", width=HIST_WIDTH
        ),
        "search_stats": sqlgen.stats_sql(DOC_QUERIES, on="n_chars"),
        "significant_terms": _sig_terms_sql(
            DOC_QUERIES, k_hits=SIG_K_HITS, max_terms=SIG_MAX_TERMS,
            min_df=SIG_MIN_DF,
        ),
        "search_cardinality": sqlgen.cardinality_sql(
            DOC_QUERIES, on="source"
        ),
        "search_count": sqlgen.match_count_sql(DOC_QUERIES),
        "term_suggest": _suggest_sql(
            SUGGEST_TOKENS, max_dist=SUGGEST_DIST, n=SUGGEST_N
        ),
        "doc_stats": sqlgen.doc_stats_sql(),
        "term_stats": sqlgen.term_stats_sql(),
        "dedup_exact": DD.exact_dedup_sql(),
        "dedup_ngram_jaccard": DD.jaccard_pairs_sql(JACCARD_T),
        "dedup_minhash": DD.jaccard_pairs_sql(JACCARD_T),
        "dedup_clusters": DD.dedup_clusters_sql(JACCARD_T),
        "dedup_simhash": DD.simhash_pairs_sql(3),
        "curate": CU.curate_sql(JACCARD_T, MIN_QUALITY, CURATE_LANGS),
        "ann_cosine_topk": SIM.cosine_topk_sql(ANN_QUERY_IDS, k=K),
        "hybrid_rrf_topk": HY.hybrid_rrf_sql(
            HYBRID_QUERIES, k=K, n_each=HYBRID_N_EACH),
        "embedding_neardup": SIM.cosine_pairs_sql(COS_PAIR_T),
        # full-probe IVF from the artifact is exact -> same oracle as brute
        "ann_ivf_topk": SIM.cosine_topk_sql(ANN_QUERY_IDS, k=K),
        "token_counts": TS.token_counts_sql(),
        "text_quality": TS.quality_score_sql(),
        "lang_id": TS.lang_id_sql(),
        "fingerprint": TS.fingerprint_sql(),
        "top_ngrams": TS.top_ngrams_sql(2, 50),
        "bm25_topk_text": (
            "WITH base AS ({}) SELECT base.query_id, base.rank, base.doc_id, "
            "base.score, d.text FROM base JOIN documents d "
            "ON base.doc_id = d.doc_id".format(
                sqlgen.bm25_topk_sql(DOC_QUERIES, k=K)
            )
        ),
        "events_hourly": EV.hourly_rollup_sql(),
        "events_sessionize": EV.sessionize_sql(30),
        "events_user_topk": EV.user_topk_sql(3),
        "multimodal_features": MM.media_summary_sql(),
        "multimodal_frames": MM.frame_sample_sql(5),
    }
