"""Result snippets: the token window around a document's FIRST query-term
match — the one-line preview a search UI renders under each hit.

Reference provenance: the reference returns bare neighbor ids
(benchmarking/search/search_indices.py:30-39); a fulltext-tier user needs
the hit contextualized. Pure Catalyst end to end (array_position /
filter / slice / array_join on the shared tokenizer), so the plan is
map-only after the result-to-source join and the DuckDB oracle composes
the same expressions (sqlgen.snippets_sql).

Semantics (deterministic, engine == oracle):
- match position = the minimum 1-based token index holding ANY of the
  query's distinct tokens (the first match in reading order);
- snippet = tokens[max(pos - window, 1) .. pos + window] joined with
  single spaces (tokenizer output, i.e. lowercased [a-z0-9]+ runs —
  normalized like every other cross-engine text artifact here);
- a result row whose doc contains none of the query's tokens (possible
  under prefix expansion or phrase scoring, where the ranked token set
  differs from the raw query text) gets a NULL snippet rather than an
  arbitrary window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .localrel import local_df
from .analysis import tokenize_py, tokens_col


def attach_snippets(
    results: DataFrame,
    source: DataFrame,
    queries: list[tuple[int, str]],
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """results (query_id, rank, doc_id, score) + source (doc_id, text) ->
    the same rows with a ``snippet`` string column appended.

    The join runs results-side small (top-k rows per query) against the
    source table on doc_id — at scale that is a broadcast of the results
    onto the source scan, never a source shuffle. ``window`` tokens are
    kept on each side of the first match."""
    if not isinstance(window, int) or window < 0:
        raise ValueError(f"window must be an int >= 0, got {window!r}")
    # duplicate query_ids merge their token sets — the same contract as
    # index_search (and the oracle's DISTINCT), so a dup-qid query list
    # cannot fan result rows out through the join
    merged: dict[int, set[str]] = {}
    for qid, text in queries:
        merged.setdefault(qid, set()).update(tokenize_py(text))
    qdf = local_df(
        results.sparkSession,
        [(q, sorted(t)) for q, t in merged.items() if t],
        "query_id int, qtoks array<string>",
    )
    dtoks = tokens_col(text_col)
    # first (minimum) 1-based position of any query token; empty filter
    # result -> array_min(NULL-safe) -> NULL snippet
    positions = F.filter(
        F.transform(
            F.col("qtoks"), lambda t: F.array_position(F.col("dtoks"), t)
        ),
        lambda p: p > 0,
    )
    pos = F.array_min(positions)
    start = F.greatest(pos - window, F.lit(1))
    # slice(start, length): window on both sides, clipped at the front
    length = pos + window - start + 1
    snippet = F.when(
        pos.isNotNull(),
        F.array_join(F.slice(F.col("dtoks"), start, length), " "),
    )
    src = source.select(
        F.col(id_col).alias("doc_id"), dtoks.alias("dtoks")
    )
    # explicit broadcast of the (top-k-sized) result rows: the kernel
    # output's size estimate is unknown to Catalyst, which would
    # otherwise plan a sort-merge join shuffling the whole source scan
    left = results.join(F.broadcast(qdf), "query_id", "left")
    return src.join(F.broadcast(left), "doc_id").select(
        *[c for c in results.columns],
        snippet.alias("snippet"),
    )
