"""ANSI-SQL generators for the DuckDB oracle side of the driver checks.

For every driver-checked engine query there is a generator here producing
the semantically identical DuckDB SQL over the pre-registered parquet views.
The BM25 arithmetic strings come from sparkbm25.bm25 so engine and oracle
share one formula definition.
"""

from __future__ import annotations

from .analysis import DUCKDB_TOKENS
from .bm25 import idf_sql, tf_norm_sql


def _values_clause(queries: list[tuple[int, str]]) -> str:
    rows = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''")) for qid, text in queries
    )
    return f"(VALUES {rows}) AS q(query_id, query_text)"


def bm25_topk_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
    filter_where: str | None = None,
    k1: float | None = None,
    b: float | None = None,
    mode: str = "or",
    min_match: int | None = None,
    exclude: dict[int, str] | None = None,
    page_after_rank: int | None = None,
    collapse_by: str | None = None,
) -> str:
    """Full BM25 top-k in one DuckDB query (rank over raw score, score
    rounded only in the projection — the Spark side does the same).

    This oracle sums qtf-weighted contributions; the engine folds per
    query-term OCCURRENCE in token order (query.canonical_score_sum, the
    bit-exact-tie contract proven against the pure-Python oracle). The two
    accumulations can differ in the last ulp, which the shared round-to-6dp
    projection absorbs; exact ties rank identically in both because tied
    docs have identical per-term (tf, dl) compositions, so both
    accumulations yield them bitwise-equal scores and the shared
    (score DESC, doc_id ASC) tie-break decides.

    ``filter_where`` restricts the CANDIDATE docs (a SQL predicate over
    ``{table}``'s columns) while idf/avgdl stay computed over the whole
    corpus — the oracle for the engine's filtered search (`where=`).

    ``mode='and'`` keeps only docs matching EVERY distinct query token
    (conjunctive retrieval): the per-doc matched-distinct-term count
    must equal the query's distinct-token count — a token absent from
    the corpus therefore empties that query, exactly like the engine.

    ``min_match`` (minimum-should-match) keeps docs matching >= that
    many distinct query tokens; a query with fewer corpus-present
    distinct tokens than the threshold returns no rows (no doc can
    reach it), exactly like the engine's driver-side drop.

    ``exclude`` ({query_id: "tokens ..."}) drops docs containing ANY of
    that query's excluded tokens (MUST_NOT), via an anti-join on a
    second per-query token list — scores of the surviving docs are
    untouched.

    ``page_after_rank`` returns the NEXT page: rows ranked
    ``page_after_rank+1 .. page_after_rank+k`` of the same total order,
    re-ranked 1..k — the oracle for the engine's cursor pagination
    (``search_after``), whose after-cursor top-k equals the rank window
    by rank-identity of the shared (score DESC, doc_id ASC) order.

    ``collapse_by`` is the FIELD-COLLAPSING oracle (engine
    ``collapse=``): join each scored doc to its ``{table}`` attribute,
    keep only the best doc per (query, attribute value) under the total
    order (row_number partition — NULL attrs form one group in both
    DuckDB and Spark), then rank the group representatives 1..k. Adds a
    ``value`` column (attribute cast to VARCHAR) to the projection."""
    from .analysis import tokenize_py
    toks = DUCKDB_TOKENS.format(col=text_col)
    idf = idf_sql("tdf.df", "cs.n")
    kw = {}
    if k1 is not None:
        kw["k1"] = k1
    if b is not None:
        kw["b"] = b
    tfn = tf_norm_sql("tf.tf", "dstats.dl", "cs.avgdl", **kw)
    # candidate restriction only when a filter exists — the unfiltered
    # oracles keep their original (semi-join-free) shape
    if filter_where:
        cand_cte = (
            f"\ncand AS (SELECT {id_col} AS doc_id FROM {table} "
            f"WHERE {filter_where}),"
        )
        cand_filter = "\n  WHERE tf.doc_id IN (SELECT doc_id FROM cand)"
    else:
        cand_cte = ""
        cand_filter = ""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if mode == "and" and min_match is not None:
        raise ValueError("min_match composes with mode='or' only")
    if min_match is not None and (
        not isinstance(min_match, int) or min_match < 1
    ):
        # same validation as index_search: the oracle must refuse what
        # the engine refuses, or the parity harness compares mismatched
        # semantics instead of flagging the bad parameter
        raise ValueError(f"min_match must be an int >= 1, got {min_match!r}")
    need_cte = ""
    nmatched_col = ""
    and_join = ""
    ranked_preds = []
    if mode == "and":
        # qt has one row per distinct (query, token): its count per query
        # is the conjunction's requirement
        need_cte = (
            "\nqneed AS (SELECT query_id, count(*) AS need FROM qt "
            "GROUP BY 1),"
        )
        nmatched_col = ",\n         count(DISTINCT tf.term) AS nmatched"
        and_join = (
            "\n  JOIN qneed ON qneed.query_id = scores.query_id "
            "AND scores.nmatched = qneed.need"
        )
    elif min_match is not None and min_match > 1:
        nmatched_col = ",\n         count(DISTINCT tf.term) AS nmatched"
        ranked_preds.append(f"scores.nmatched >= {int(min_match)}")
    ex_rows = sorted(
        {
            (qid, t)
            for qid, txt in (exclude or {}).items()
            for t in tokenize_py(txt)
        }
    )
    if ex_rows:
        # terms are tokenizer output ([a-z0-9]+): inline-safe
        vals = ", ".join(f"({qid}, '{t}')" for qid, t in ex_rows)
        xt_cte = f"\nxt AS (SELECT * FROM (VALUES {vals}) AS x(query_id, term)),"
        tf_term_src = "SELECT term FROM qt UNION SELECT term FROM xt"
        ranked_preds.append(
            "NOT EXISTS (SELECT 1 FROM tf x JOIN xt "
            "ON xt.term = x.term AND xt.query_id = scores.query_id "
            "WHERE x.doc_id = scores.doc_id)"
        )
    else:
        xt_cte = ""
        tf_term_src = "SELECT term FROM qt"
    ranked_where = (
        "\n  WHERE " + "\n    AND ".join(ranked_preds) if ranked_preds else ""
    )
    if page_after_rank is not None:
        if not isinstance(page_after_rank, int) or page_after_rank < 1:
            raise ValueError(
                f"page_after_rank must be an int >= 1, got {page_after_rank!r}"
            )
        off = int(page_after_rank)
        rank_proj = f"rank - {off}"
        page_pred = f"rank > {off} AND rank <= {off + k}"
    else:
        rank_proj = "rank"
        page_pred = f"rank <= {k}"
    if collapse_by is not None:
        # collapse: group-best selection between scoring and ranking —
        # the ranked CTE re-ranks only the rn_g=1 representatives
        collapse_cte = f"""
grouped AS (
  SELECT scores.query_id, scores.doc_id AS doc_id, score,
         CAST(cd.{collapse_by} AS VARCHAR) AS value,
         row_number() OVER (
           PARTITION BY scores.query_id, cd.{collapse_by}
           ORDER BY score DESC, scores.doc_id ASC) AS rn_g
  FROM scores
  JOIN {table} cd ON cd.{id_col} = scores.doc_id{and_join}{ranked_where}
),"""
        ranked_src = "grouped WHERE rn_g = 1"
        ranked_extra = ", value"
        src = "grouped"
        # boolean/exclusion predicates moved into `grouped`
        and_join = ""
        ranked_where = ""
        val_proj = ", value"
    else:
        collapse_cte = ""
        ranked_src = "scores"
        ranked_extra = ""
        src = "scores"
        val_proj = ""
    return f"""
WITH q AS (SELECT * FROM {_values_clause(queries)}),
qt AS (
  SELECT query_id, t.term, count(*) AS qtf
  FROM q, unnest({DUCKDB_TOKENS.format(col='query_text')}) AS t(term)
  GROUP BY 1, 2
),
toks AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
dstats AS (SELECT doc_id, len(ts) AS dl FROM toks),
cs AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dstats),
tf AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM toks, unnest(ts) AS t(term)
  WHERE t.term IN ({tf_term_src})
  GROUP BY 1, 2
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),{cand_cte}{need_cte}{xt_cte}
scores AS (
  SELECT qt.query_id, tf.doc_id,
         sum(qt.qtf * {idf} * {tfn}) AS score{nmatched_col}
  FROM tf
  JOIN qt ON qt.term = tf.term
  JOIN tdf ON tdf.term = tf.term
  JOIN dstats ON dstats.doc_id = tf.doc_id
  CROSS JOIN cs{cand_filter}
  GROUP BY 1, 2
),{collapse_cte}
ranked AS (
  SELECT {src}.query_id, doc_id, score{ranked_extra},
         row_number() OVER (PARTITION BY {src}.query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM {ranked_src}{and_join}{ranked_where}
)
SELECT query_id, {rank_proj} AS rank, doc_id,
       round(score, {round_dp}) AS score{val_proj}
FROM ranked WHERE {page_pred}
"""


def phrase_topk_sql(
    phrases: list[tuple[int, str]],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
    slop: int = 0,
) -> str:
    """DuckDB oracle for PHRASE top-k: per doc, count exact token-sequence
    occurrences positionally (``list_filter`` over candidate start
    offsets), then BM25-weight the phrase as one composite term —
    score = idf(df_phrase) * tf_norm(phrase_tf, dl) — matching
    index_phrase_search. Phrases tokenizing to nothing contribute no rows
    (same as the engine).

    ``slop`` > 0 is ordered proximity (index_phrase_search(slop=)):
    consecutive terms separated by a gap in [1, slop+1]; ptf counts the
    distinct first-term positions beginning >= 1 valid chain. Expressed
    by unrolling every gap combination into an OR inside the start
    filter — exact, and bounded by (slop+1)^(n-1) <= 256 arms per phrase
    (refuses beyond that; the engine itself has no such bound)."""
    from itertools import product

    from .analysis import tokenize_py
    from .bm25 import idf_sql, tf_norm_sql

    if not isinstance(slop, int) or slop < 0:
        raise ValueError(f"slop must be an int >= 0, got {slop!r}")
    toks = DUCKDB_TOKENS.format(col=text_col)
    arms = []
    for qid, text in phrases:
        terms = [t.replace("'", "''") for t in tokenize_py(text)]
        if not terms:
            continue
        n = len(terms)
        if slop == 0:
            conds = " AND ".join(
                f"ts[i+{j}] = '{t}'" for j, t in enumerate(terms)
            )
            rng = f"range(1, greatest(len(ts) - {n - 1}, 0) + 1)"
        else:
            n_combos = (slop + 1) ** (n - 1)
            if n_combos > 256:
                raise ValueError(
                    f"slop={slop} over a {n}-term phrase unrolls to "
                    f"{n_combos} gap combinations (> 256): the SQL oracle "
                    "refuses; shorten the phrase or lower slop"
                )
            head = f"ts[i] = '{terms[0]}'"
            if n == 1:
                conds = head
            else:
                combo_arms = []
                for gaps in product(range(1, slop + 2), repeat=n - 1):
                    off, parts = 0, []
                    for g, t in zip(gaps, terms[1:]):
                        off += g
                        parts.append(f"ts[i+{off}] = '{t}'")
                    combo_arms.append("(" + " AND ".join(parts) + ")")
                conds = head + " AND (" + " OR ".join(combo_arms) + ")"
            # out-of-range list indexing yields NULL -> lambda not TRUE,
            # so the full start range is safe
            rng = "range(1, len(ts) + 1)"
        arms.append(
            f"SELECT {qid} AS query_id, doc_id, len(ts) AS dl,\n"
            f"  len(list_filter({rng},"
            f" i -> {conds})) AS ptf\nFROM toks"
        )
    if not arms:
        return (
            "SELECT CAST(NULL AS INT) AS query_id, CAST(NULL AS INT) AS "
            "rank, CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) "
            "AS score WHERE FALSE"
        )
    pm = "\nUNION ALL\n".join(arms)
    idf = idf_sql("dfq.df", "cs.n")
    tfn = tf_norm_sql("m.ptf", "m.dl", "cs.avgdl")
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
cs AS (SELECT count(*) AS n, avg(len(ts)) AS avgdl FROM toks),
pm AS (
{pm}
),
matches AS (SELECT * FROM pm WHERE ptf > 0),
dfq AS (SELECT query_id, count(*) AS df FROM matches GROUP BY 1),
scores AS (
  SELECT m.query_id, m.doc_id, {idf} * {tfn} AS score
  FROM matches m JOIN dfq ON dfq.query_id = m.query_id CROSS JOIN cs
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, round(score, {round_dp}) AS score
FROM ranked WHERE rank <= {k}
"""


def prefix_topk_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> str:
    """DuckDB oracle for trailing-wildcard (prefix) top-k: queries are
    pre-parsed with the engine's own parser (analysis.parse_prefix_query)
    into (stem, is_prefix) occurrence counts, wildcard stems join the
    corpus vocabulary on LIKE 'stem%', and every matched term scores as
    an ordinary query term with its own idf — the same disjunctive
    expansion index_prefix_search folds. ``max_expansions`` replicates
    the engine's deterministic per-stem cap (df DESC, term ASC) via a
    window over the expansion join."""
    from .analysis import parse_prefix_query

    toks = DUCKDB_TOKENS.format(col=text_col)
    rows = []
    for qid, text in queries:
        counts: dict[tuple[str, bool], int] = {}
        for stem, is_pref in parse_prefix_query(text):
            counts[(stem, is_pref)] = counts.get((stem, is_pref), 0) + 1
        for (stem, is_pref), qtf in counts.items():
            rows.append(
                "({}, '{}', {}, {})".format(
                    qid, stem.replace("'", "''"),
                    "TRUE" if is_pref else "FALSE", qtf,
                )
            )
    if not rows:
        return (
            "SELECT CAST(NULL AS INT) AS query_id, CAST(NULL AS INT) AS "
            "rank, CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) "
            "AS score WHERE FALSE"
        )
    qp_values = ", ".join(rows)
    idf = idf_sql("qt.df", "cs.n")
    tfn = tf_norm_sql("tf.tf", "dstats.dl", "cs.avgdl")
    cap_where = (
        ""
        if max_expansions is None
        else f"\n  WHERE (NOT is_prefix) OR rn <= {max_expansions}"
    )
    return f"""
WITH qp AS (
  SELECT * FROM (VALUES {qp_values})
  AS v(query_id, stem, is_prefix, qtf)
),
toks AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
dstats AS (SELECT doc_id, len(ts) AS dl FROM toks),
cs AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dstats),
tf AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM toks, unnest(ts) AS t(term)
  WHERE EXISTS (
    SELECT 1 FROM qp
    WHERE (qp.is_prefix AND t.term LIKE qp.stem || '%')
       OR (NOT qp.is_prefix AND t.term = qp.stem)
  )
  GROUP BY 1, 2
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
expanded AS (
  SELECT qp.query_id, tdf.term, tdf.df, qp.qtf, qp.is_prefix,
         row_number() OVER (
           PARTITION BY qp.query_id, qp.stem, qp.is_prefix
           ORDER BY tdf.df DESC, tdf.term ASC
         ) AS rn
  FROM qp JOIN tdf
    ON (qp.is_prefix AND tdf.term LIKE qp.stem || '%')
    OR (NOT qp.is_prefix AND tdf.term = qp.stem)
),
qt AS (
  SELECT query_id, term, any_value(df) AS df, sum(qtf) AS qtf
  FROM expanded{cap_where}
  GROUP BY 1, 2
),
scores AS (
  SELECT qt.query_id, tf.doc_id,
         sum(qt.qtf * {idf} * {tfn}) AS score
  FROM tf
  JOIN qt ON qt.term = tf.term
  JOIN dstats ON dstats.doc_id = tf.doc_id
  CROSS JOIN cs
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, round(score, {round_dp}) AS score
FROM ranked WHERE rank <= {k}
"""


def doc_stats_sql(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    return (
        f"SELECT {id_col} AS doc_id, len({toks}) AS doc_len FROM {table}"
    )


def term_stats_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1) -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
tf AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM toks, unnest(ts) AS t(term) GROUP BY 1, 2
)
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf GROUP BY term HAVING count(*) >= {min_df}
"""


def facets_sql(
    queries: list[tuple[int, str]],
    by: str,
    k_facets: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_where: str | None = None,
) -> str:
    """DuckDB oracle for index_facets: per query, count docs sharing >= 1
    distinct token with the query, grouped by the ``by`` attribute (cast
    to VARCHAR like the engine side). ``k_facets`` keeps each query's
    top-N values via the same deterministic order (n_docs DESC, value
    ASC); ``filter_where`` restricts countable docs (the where= analog)."""
    toks = DUCKDB_TOKENS.format(col=text_col)
    qv = _values_clause(queries)
    fw = f"\n  WHERE {filter_where}" if filter_where else ""
    limit = ""
    if k_facets is not None:
        limit = f"\nQUALIFY row_number() OVER (PARTITION BY query_id ORDER BY n_docs DESC, value ASC) <= {int(k_facets)}"
    return f"""
WITH q AS (SELECT * FROM {qv}),
qt AS (
  SELECT DISTINCT query_id, t.term
  FROM q, unnest({DUCKDB_TOKENS.format(col='query_text')}) AS t(term)
),
toks AS (SELECT {id_col} AS doc_id, {by} AS attr, {toks} AS ts FROM {table}{fw}),
dterms AS (
  SELECT DISTINCT doc_id, t.term FROM toks, unnest(ts) AS t(term)
  WHERE t.term IN (SELECT term FROM qt)
),
matches AS (
  SELECT DISTINCT qt.query_id, dterms.doc_id
  FROM dterms JOIN qt ON qt.term = dterms.term
),
counts AS (
  SELECT m.query_id, CAST(d.attr AS VARCHAR) AS value,
         count(*) AS n_docs
  FROM matches m JOIN toks d ON d.doc_id = m.doc_id
  GROUP BY 1, 2
)
SELECT query_id, value, n_docs FROM counts{limit}
"""


def _match_ctes(queries: list[tuple[int, str]], table: str, id_col: str,
                text_col: str, attr: str, filter_where: str | None) -> str:
    """Shared CTE chain for the match-set aggregations (facets /
    histogram / stats): q -> distinct query terms -> per-doc distinct
    terms -> (query_id, doc_id) matches, with the attribute carried on
    the tokenized scan."""
    toks = DUCKDB_TOKENS.format(col=text_col)
    fw = f"\n  WHERE {filter_where}" if filter_where else ""
    return f"""
WITH q AS (SELECT * FROM {_values_clause(queries)}),
qt AS (
  SELECT DISTINCT query_id, t.term
  FROM q, unnest({DUCKDB_TOKENS.format(col='query_text')}) AS t(term)
),
toks AS (SELECT {id_col} AS doc_id, {attr} AS attr, {toks} AS ts FROM {table}{fw}),
dterms AS (
  SELECT DISTINCT doc_id, t.term FROM toks, unnest(ts) AS t(term)
  WHERE t.term IN (SELECT term FROM qt)
),
matches AS (
  SELECT DISTINCT qt.query_id, dterms.doc_id
  FROM dterms JOIN qt ON qt.term = dterms.term
)"""


def histogram_sql(
    queries: list[tuple[int, str]],
    on: str,
    width: float,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_where: str | None = None,
) -> str:
    """DuckDB oracle for index_histogram: per query, doc counts in
    fixed-width buckets (floor(attr/width)*width as BIGINT) of a numeric
    attribute over all docs sharing >= 1 distinct token with the query;
    NULL attrs are ignored (the engine drops them from the side)."""
    w = float(width)
    return f"""{_match_ctes(queries, table, id_col, text_col, on, filter_where)}
SELECT m.query_id,
       CAST(floor(CAST(d.attr AS DOUBLE) / {w}) * {w} AS BIGINT) AS bucket,
       count(*) AS n_docs
FROM matches m JOIN toks d ON d.doc_id = m.doc_id
WHERE d.attr IS NOT NULL
GROUP BY 1, 2
"""


def stats_sql(
    queries: list[tuple[int, str]],
    on: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_where: str | None = None,
) -> str:
    """DuckDB oracle for index_stats: per query, (n_docs, min, max, sum,
    avg) of a numeric attribute over the match set, NULL attrs ignored.
    sum/avg computed in DOUBLE like the engine's f64 partial folds —
    exact (order-free) for integer attributes below 2^53, and avg is the
    division of the same two exact doubles."""
    return f"""{_match_ctes(queries, table, id_col, text_col, on, filter_where)}
SELECT m.query_id,
       count(*) AS n_docs,
       min(CAST(d.attr AS DOUBLE)) AS min_v,
       max(CAST(d.attr AS DOUBLE)) AS max_v,
       CAST(sum(CAST(d.attr AS DOUBLE)) AS DOUBLE) AS sum_v,
       CAST(sum(CAST(d.attr AS DOUBLE)) AS DOUBLE) / count(*) AS avg_v
FROM matches m JOIN toks d ON d.doc_id = m.doc_id
WHERE d.attr IS NOT NULL
GROUP BY 1
"""


def match_count_sql(
    queries: list[tuple[int, str]],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_where: str | None = None,
) -> str:
    """DuckDB oracle for index_count: per query, the number of docs
    sharing >= 1 distinct token with the query."""
    return f"""{_match_ctes(queries, table, id_col, text_col, id_col, filter_where)}
SELECT query_id, count(*) AS n_docs FROM matches GROUP BY 1
"""


def cardinality_sql(
    queries: list[tuple[int, str]],
    on: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_where: str | None = None,
) -> str:
    """DuckDB oracle for index_cardinality: per query, the exact number
    of distinct non-NULL attribute values over the match set."""
    return f"""{_match_ctes(queries, table, id_col, text_col, on, filter_where)}
SELECT m.query_id, count(DISTINCT CAST(d.attr AS VARCHAR)) AS n_values
FROM matches m JOIN toks d ON d.doc_id = m.doc_id
WHERE d.attr IS NOT NULL
GROUP BY 1
"""


def snippets_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    window: int = 3,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
    filter_where: str | None = None,
    k1: float | None = None,
    b: float | None = None,
) -> str:
    """DuckDB oracle for snippet-attached search: the bm25_topk_sql result
    plus a ``snippet`` column — tokens[max(pos-window,1) .. pos+window]
    joined by spaces, pos = the minimum 1-based index of any of the
    query's distinct tokens in the doc (NULL snippet when none occurs).
    Matches snippets.attach_snippets composed over index_search;
    ``filter_where``/``k1``/``b`` forward to the base ranking SQL so the
    oracle covers the same filtered/tuned compositions the engine does."""
    if not isinstance(window, int) or window < 0:
        # engine/oracle refusal parity (attach_snippets validates the same)
        raise ValueError(f"window must be an int >= 0, got {window!r}")
    base = bm25_topk_sql(queries, k=k, table=table, id_col=id_col,
                         text_col=text_col, round_dp=round_dp,
                         filter_where=filter_where, k1=k1, b=b)
    toks = DUCKDB_TOKENS.format(col=text_col)
    qv = _values_clause(queries)
    w = int(window)
    return f"""
WITH topk AS ({base}),
q2 AS (SELECT * FROM {qv}),
qt2 AS (
  SELECT DISTINCT query_id, t.term
  FROM q2, unnest({DUCKDB_TOKENS.format(col='query_text')}) AS t(term)
),
toks2 AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
snip AS (
  SELECT tk.query_id, tk.rank, tk.doc_id, tk.score,
         min(CASE WHEN list_position(toks2.ts, qt2.term) > 0
                  THEN list_position(toks2.ts, qt2.term) END) AS pos,
         any_value(toks2.ts) AS ts
  FROM topk tk
  JOIN toks2 ON toks2.doc_id = tk.doc_id
  JOIN qt2 ON qt2.query_id = tk.query_id
  GROUP BY 1, 2, 3, 4
)
SELECT query_id, rank, doc_id, score,
       CASE WHEN pos IS NOT NULL THEN
         array_to_string(ts[greatest(pos - {w}, 1) : pos + {w}], ' ')
       END AS snippet
FROM snip
"""


def explain_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> str:
    """DuckDB oracle for query.explain_scores: one row per (query, top-k
    hit, matched distinct term) with the contribution inputs — qtf, tf,
    doc_len, df, idf, tf_norm, contrib = qtf*idf*tf_norm — rounded like
    the engine (idf/tf_norm/contrib at ``round_dp``). Ranks come from the
    same summed-score window as bm25_topk_sql."""
    toks = DUCKDB_TOKENS.format(col=text_col)
    idf = idf_sql("tdf.df", "cs.n")
    tfn = tf_norm_sql("tf.tf", "dstats.dl", "cs.avgdl")
    return f"""
WITH q AS (SELECT * FROM {_values_clause(queries)}),
qt AS (
  SELECT query_id, t.term, count(*) AS qtf
  FROM q, unnest({DUCKDB_TOKENS.format(col='query_text')}) AS t(term)
  GROUP BY 1, 2
),
toks AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
dstats AS (SELECT doc_id, len(ts) AS dl FROM toks),
cs AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dstats),
tf AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM toks, unnest(ts) AS t(term)
  WHERE t.term IN (SELECT term FROM qt)
  GROUP BY 1, 2
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, tf.doc_id,
         sum(qt.qtf * {idf} * {tfn}) AS score
  FROM tf
  JOIN qt ON qt.term = tf.term
  JOIN tdf ON tdf.term = tf.term
  JOIN dstats ON dstats.doc_id = tf.doc_id
  CROSS JOIN cs
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT r.query_id, r.rank, r.doc_id, qt.term,
       CAST(qt.qtf AS BIGINT) AS qtf,
       CAST(tf.tf AS BIGINT) AS tf,
       CAST(dstats.dl AS BIGINT) AS doc_len,
       CAST(tdf.df AS BIGINT) AS df,
       round({idf}, {round_dp}) AS idf,
       round({tfn}, {round_dp}) AS tf_norm,
       round(qt.qtf * {idf} * {tfn}, {round_dp}) AS contrib
FROM ranked r
JOIN qt ON qt.query_id = r.query_id
JOIN tf ON tf.doc_id = r.doc_id AND tf.term = qt.term
JOIN tdf ON tdf.term = tf.term
JOIN dstats ON dstats.doc_id = r.doc_id
CROSS JOIN cs
WHERE r.rank <= {k}
"""


def fuzzy_topk_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    max_dist: int = 1,
    max_expansions: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> str:
    """DuckDB oracle for fuzzy top-k (index_fuzzy_search): every query
    token joins the corpus vocabulary on levenshtein(term, token) <=
    max_dist (length-difference prune first), each matched term scores
    as an ordinary query term with its own idf, and ``max_expansions``
    replicates the engine's deterministic per-token cap (df DESC, term
    ASC) via a window over the expansion join."""
    from .analysis import tokenize_py

    if not isinstance(max_dist, int) or max_dist < 0:
        raise ValueError(f"max_dist must be an int >= 0, got {max_dist!r}")
    toks = DUCKDB_TOKENS.format(col=text_col)
    rows = []
    for qid, text in queries:
        counts: dict[str, int] = {}
        for stem in tokenize_py(text):
            counts[stem] = counts.get(stem, 0) + 1
        for stem, qtf in counts.items():
            rows.append(f"({qid}, '{stem}', {qtf})")
    if not rows:
        return (
            "SELECT CAST(NULL AS INT) AS query_id, CAST(NULL AS INT) AS "
            "rank, CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) "
            "AS score WHERE FALSE"
        )
    qp_values = ", ".join(rows)
    idf = idf_sql("qt.df", "cs.n")
    tfn = tf_norm_sql("tf.tf", "dstats.dl", "cs.avgdl")
    cap_where = (
        "" if max_expansions is None else f"\n  WHERE rn <= {max_expansions}"
    )
    match = (
        f"abs(length(t.term) - length(qp.stem)) <= {max_dist} "
        f"AND levenshtein(t.term, qp.stem) <= {max_dist}"
    )
    match_tdf = match.replace("t.term", "tdf.term")
    return f"""
WITH qp AS (
  SELECT * FROM (VALUES {qp_values})
  AS v(query_id, stem, qtf)
),
toks AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
dstats AS (SELECT doc_id, len(ts) AS dl FROM toks),
cs AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dstats),
tf AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM toks, unnest(ts) AS t(term)
  WHERE EXISTS (SELECT 1 FROM qp WHERE {match})
  GROUP BY 1, 2
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
expanded AS (
  SELECT qp.query_id, tdf.term, tdf.df, qp.qtf,
         row_number() OVER (
           PARTITION BY qp.query_id, qp.stem
           ORDER BY tdf.df DESC, tdf.term ASC
         ) AS rn
  FROM qp JOIN tdf ON {match_tdf}
),
qt AS (
  SELECT query_id, term, any_value(df) AS df, sum(qtf) AS qtf
  FROM expanded{cap_where}
  GROUP BY 1, 2
),
scores AS (
  SELECT qt.query_id, tf.doc_id,
         sum(qt.qtf * {idf} * {tfn}) AS score
  FROM tf
  JOIN qt ON qt.term = tf.term
  JOIN dstats ON dstats.doc_id = tf.doc_id
  CROSS JOIN cs
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, round(score, {round_dp}) AS score
FROM ranked WHERE rank <= {k}
"""
