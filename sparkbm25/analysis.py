"""Tokenization — the engine's text normalization stage.

Transposes the reference's input normalization (reference:
benchmarking/dataset/dataset_utils.py:83-86 and
e2e/api/vector_dataset_generator.py:83-84 L2-normalize vectors before
indexing; our analog normalizes text before indexing).

Three implementations of ONE tokenizer contract — they must agree bit-for-bit
because rank-identity of BM25 results depends on it (SURVEY.md §7 "hard parts"):

1. ``tokens_col``      — pure Catalyst expression (lower + regexp_extract_all).
   JVM-side, whole-stage-codegen, zero Python. This is the default build path.
2. ``tokenize_pandas_udf`` — Arrow-vectorized pandas UDF (the north rule's
   "vectorized Arrow UDF" surface; used where a Python kernel already owns the
   batch, e.g. per-doc tf counting).
3. ``tokenize_py``     — plain Python for the oracle.

Contract: lowercase, then extract maximal runs of ``[a-z0-9]+``. ASCII-only
token alphabet keeps Python/JVM/DuckDB regex semantics identical; non-ASCII
characters act as separators in all three engines.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# DuckDB-side equivalent expression (used by oracle_sql generators).
DUCKDB_TOKENS = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def tokens_col(col: str | Column = "text") -> Column:
    """array<string> token column, pure Catalyst (codegen, no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    # null text tokenizes to [] (matches tokenize_py), not null
    return F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit(TOKEN_PATTERN), 0
    )


def ngrams_col(text_col: str = "text", n: int = 3) -> Column:
    """Space-joined token n-grams PER OCCURRENCE, [] when < n tokens —
    shared by dedup shingles (which wrap it in array_distinct) and the
    top_ngrams counter (which counts occurrences).

    O(total tokens): n shifted slices zipped pairwise. (The obvious
    transform(sequence(...), i -> slice(toks, i, n)) is O(len²) per doc —
    each slice copies O(len) — and measured 10s for 5000 long docs.)
    Guarded with `when`: Spark's sequence(1, 0) yields a DESCENDING [1, 0],
    and slice(toks, k, m) needs size >= n, so short docs short-circuit to []."""
    toks = tokens_col(text_col)
    m = F.size(toks) - (n - 1)  # number of n-grams
    sh = F.slice(toks, 1, m)
    for j in range(1, n):
        nxt = F.slice(toks, j + 1, m)
        sh = F.zip_with(sh, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(toks) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )


def tokenize_py(text: str | None) -> list[str]:
    """Oracle tokenizer. Must match tokens_col exactly."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


def parse_prefix_query(qtext: str) -> list[tuple[str, bool]]:
    """Tokenize a query that may contain trailing-wildcard tokens:
    returns [(token, is_prefix), ...] in query order. A whitespace chunk
    ending in '*' marks its LAST tokenizer token as a prefix stem (the
    search-as-you-type shape: 'merge jo*'); every other token is an
    exact occurrence. Chunks tokenizing to nothing are skipped, so '*'
    alone matches nothing (an unconstrained full-vocabulary scan is
    refused, not served). Shared by the engine (index_prefix_search)
    and the oracle generator (sqlgen.prefix_topk_sql) so both sides
    parse identically."""
    out: list[tuple[str, bool]] = []
    for chunk in qtext.split():
        is_pref = chunk.endswith("*")
        toks = tokenize_py(chunk.rstrip("*"))
        if not toks:
            continue
        if is_pref:
            out.extend((t, False) for t in toks[:-1])
            out.append((toks[-1], True))
        else:
            out.extend((t, False) for t in toks)
    return out


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch tokenizer over a pandas Series of strings."""
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)


def tokenize_flat_arrow(arr):
    """FLAT batch tokenizer: (flat tokens as a pyarrow StringArray,
    per-doc token counts as int64 ndarray) — token stream identical to
    per-doc ``tokenize_py``/``tokenize_series`` concatenation.

    Fast path (Arrow compute, no per-token Python objects): ascii_lower +
    split on the complement class ``[^a-z0-9]+`` with empty tokens
    filtered — equal to ``findall('[a-z0-9]+')`` by construction. Guarded
    to ASCII batches: non-ASCII text falls back to the Python regex
    (utf8proc's and CPython's Unicode lowercasing can disagree on exotic
    code points, and only lowercasing can manufacture ASCII-alnum chars).
    Either way the RETURNED tokens are pure ASCII ``[a-z0-9]+``, so
    downstream byte-order string sorts equal Python str order.

    Why flat: the build/tf kernels need (flat_tokens, lens) anyway, and
    the pandas route materializes a Python str object per token — ~40% of
    the measured stage-1 kernel time at sf0.1 (r07) — where the Arrow
    route keeps the whole stream as one contiguous buffer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.Array.from_pandas(arr, type=pa.string())
    if len(arr) == 0:
        return pa.array([], type=pa.string()), np.zeros(0, dtype=np.int64)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pc.all(pc.string_is_ascii(arr)).as_py():
        split = pc.split_pattern_regex(
            pc.ascii_lower(arr), "[^a-z0-9]+"
        )
        flat = split.flatten()
        raw_counts = np.diff(np.asarray(split.offsets, dtype=np.int64))
        nonempty = np.asarray(pc.binary_length(flat)) > 0
        if nonempty.all():
            return flat, raw_counts
        doc_idx = np.repeat(
            np.arange(len(arr), dtype=np.int64), raw_counts
        )
        lens = np.bincount(
            doc_idx[nonempty], minlength=len(arr)
        ).astype(np.int64)
        return pc.filter(flat, pa.array(nonempty)), lens
    toks = pd.Series(arr.to_pandas()).str.lower().str.findall(_TOKEN_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if not lens.sum():
        return pa.array([], type=pa.string()), lens
    flat_obj = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    return pa.array(flat_obj, type=pa.string()), lens


def tokenize_pandas_udf():
    """Arrow-vectorized tokenizer UDF: string -> array<string>.

    Registered lazily (pandas_udf construction needs an active session on
    some Spark versions).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts)

    return _tok


def levenshtein_py(a: str, b: str) -> int:
    """Classic unit-cost edit distance — the same function Spark's
    F.levenshtein and DuckDB's levenshtein() compute, so the driver-side
    vocabulary cache path of fuzzy expansion agrees with both plan-side
    and oracle-side matching."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(
                prev[j] + 1,          # deletion
                cur[j - 1] + 1,       # insertion
                prev[j - 1] + (ca != cb),  # substitution
            ))
        prev = cur
    return prev[-1]
