"""Deterministic synthetic transcript corpora + query sets (seed 42).

The analog of the reference's seeded synthetic dataset generator
(reference: e2e/api/vector_dataset_generator.py:57-101, config seed=42 at
e2e/api/test-datasets.yml:35-38 — np.random.normal vectors in 100k batches).
Ours generates the BASELINE.json `input_hint` transcript shape:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

with a Zipf(s=1.1) vocabulary so head-term skew is present (FIXTURES.md §1),
plus a mixed-difficulty query set (FIXTURES.md §2).

Generation is pure numpy on the driver for unit/correctness scales, and a
distributed `spark.range`-based generator for bench scale (no driver-side
materialization), both producing identical rows for identical parameters.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
BASE_TS = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
ROLES = ["user", "assistant", "tool"]
TOOLS = [
    "search", "browser", "python", "bash", "calculator", "sql",
    "email", "calendar", "files", "maps", "weather", "translate",
]

# a few tokens that exercise normalization (mixed case / punctuation)
SPICE = ["Hello,", "WORLD!", "FooBar", "x42", "Ok."]


def vocab() -> list[str]:
    """Deterministic vocabulary: w0000..w4999 (lowercase ascii)."""
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def _zipf_probs(n: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def _conv_rows(c: int, seed: int, words: np.ndarray, probs: np.ndarray) -> list:
    """One conversation's turns — seeded per conversation id so the
    driver-side and distributed generators produce IDENTICAL rows and
    output is independent of partitioning."""
    rng = np.random.default_rng(seed + c)
    conv_id = f"conv-{c:08d}"
    n_turns = int(rng.integers(2, 21))
    rows = []
    for t in range(n_turns):
        role = ROLES[(c + t) % 3]
        n_tok = int(rng.integers(5, 121))
        text = " ".join(rng.choice(words, size=n_tok, p=probs).tolist())
        if (c * 7 + t) % 13 == 0:
            text = SPICE[(c + t) % len(SPICE)] + " " + text
        tool = TOOLS[(c + t) % len(TOOLS)] if role == "tool" else None
        ts = BASE_TS + dt.timedelta(hours=c, minutes=t)
        rows.append((conv_id, t, role, text, tool, ts))
    return rows


def make_transcripts_pdf(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Driver-side generator (use for unit/correctness scales <= ~50k turns).
    Row-identical to make_transcripts_df for the same parameters."""
    words = np.array(vocab())
    probs = _zipf_probs()
    rows: list = []
    for c in range(n_convs):
        rows.extend(_conv_rows(c, seed, words, probs))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def make_transcripts_df(spark, n_convs: int, seed: int = SEED):
    """Distributed generator for bench scale.

    Same schema and distributional shape; generated per-partition with
    mapInPandas so no driver materialization (scales to arbitrary n_convs).
    Seeded per conversation id, so output is independent of partitioning.
    """
    from pyspark.sql import functions as F

    words = vocab()
    probs = _zipf_probs()

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    def gen(batches):
        from sparkbm25.fixtures import _conv_rows

        warr = np.array(words)
        parr = np.asarray(probs)
        for pdf in batches:
            out_rows = []
            for c in pdf["id"].to_numpy():
                out_rows.extend(_conv_rows(int(c), seed, warr, parr))
            yield pd.DataFrame(
                out_rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            )

    n_parts = max(8, n_convs // 2000)
    return (
        spark.range(0, n_convs, numPartitions=n_parts)
        .mapInPandas(gen, schema=schema)
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )


def make_queries(n_queries: int = 100, seed: int = SEED) -> list[tuple[int, str]]:
    """Mixed-difficulty query set (FIXTURES.md §2): head terms, mid terms,
    rare terms, an absent term, duplicate-term queries."""
    rng = np.random.default_rng(seed + 1)
    words = vocab()
    out: list[tuple[int, str]] = []
    for qid in range(n_queries):
        kind = qid % 5
        if kind == 0:  # head terms
            terms = [words[int(rng.integers(0, 20))] for _ in range(int(rng.integers(1, 4)))]
        elif kind == 1:  # mid-frequency
            terms = [words[int(rng.integers(100, 1000))] for _ in range(int(rng.integers(1, 5)))]
        elif kind == 2:  # rare
            terms = [words[int(rng.integers(3000, VOCAB_SIZE))] for _ in range(int(rng.integers(1, 4)))]
        elif kind == 3:  # contains a term absent from the vocabulary
            terms = [words[int(rng.integers(0, 500))], "zzabsentzz"]
        else:  # duplicate-term query
            w = words[int(rng.integers(0, 200))]
            terms = [w, w, words[int(rng.integers(500, 2000))]]
        out.append((qid, " ".join(terms)))
    return out


# --- 5-turn micro corpus with hand-computable tf/df (FIXTURES.md §5) ------
MICRO_DOCS: list[tuple[int, str]] = [
    (0, "the cat sat on the mat"),
    (1, "the dog"),
    (2, ""),  # empty text
    (3, "cat " * 50),  # tf saturation
    (4, "the cat sat on the mat"),  # identical to doc 0 → tie-break check
]


# --- multilingual fixture corpus (profile lang-id training + eval) --------
# ~10 languages x two dozen very common words each (public knowledge, like
# any stopword list). Includes the 4 stopword-profile languages so the
# heuristic lang_id gets a fair shot on the same data.
MULTILANG_VOCAB: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for",
           "with", "as", "his", "they", "at", "this", "have", "from", "not",
           "word", "what", "some", "time", "people"],
    "de": ["der", "die", "das", "und", "ist", "in", "den", "von", "zu",
           "mit", "sich", "auf", "nicht", "ein", "eine", "als", "auch",
           "werden", "aus", "wort", "zeit", "leute", "haben", "wir"],
    "es": ["el", "la", "los", "que", "es", "de", "en", "un", "una", "por",
           "con", "para", "del", "las", "se", "su", "al", "como", "pero",
           "palabra", "tiempo", "gente", "tiene", "nosotros"],
    "fr": ["le", "les", "des", "et", "est", "la", "de", "un", "une", "dans",
           "pour", "que", "qui", "sur", "avec", "pas", "au", "par", "mais",
           "mot", "temps", "gens", "avoir", "nous"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "con", "del",
           "della", "sono", "non", "si", "come", "anche", "piu", "questo",
           "parola", "tempo", "gente", "avere", "noi", "gli"],
    "pt": ["o", "a", "de", "que", "e", "um", "uma", "para", "com", "do",
           "da", "os", "as", "no", "na", "por", "mais", "como", "palavra",
           "tempo", "pessoas", "ter", "nos", "ele"],
    "nl": ["de", "het", "een", "van", "en", "is", "in", "dat", "op", "te",
           "met", "voor", "niet", "zijn", "aan", "ook", "maar", "als",
           "woord", "tijd", "mensen", "hebben", "wij", "deze"],
    "sv": ["och", "att", "det", "som", "en", "av", "for", "den", "till",
           "med", "inte", "om", "har", "de", "ett", "var", "men", "pa",
           "ord", "tid", "manniskor", "ha", "vi", "detta"],
    "pl": ["i", "w", "nie", "na", "to", "sie", "jest", "do", "z", "co",
           "tak", "jak", "ale", "po", "czy", "przez", "jego", "od",
           "slowo", "czas", "ludzie", "miec", "my", "ten"],
    "tr": ["ve", "bir", "bu", "da", "ne", "icin", "ile", "olarak", "daha",
           "gibi", "ama", "en", "cok", "var", "kadar", "sonra", "onun",
           "diye", "kelime", "zaman", "insanlar", "sahip", "biz", "su"],
}


def make_multilingual_pdf(
    n_per_lang: int = 30, seed: int = SEED, langs: list[str] | None = None
) -> pd.DataFrame:
    """Deterministic multilingual documents: (doc_id, lang, text), each doc
    8-20 words sampled from its language's common-word vocabulary. Used to
    train the n-gram profile classifier (one seed) and to evaluate both
    lang-id variants (another seed)."""
    rng = np.random.default_rng(seed)
    codes = langs or sorted(MULTILANG_VOCAB)
    rows = []
    doc_id = 0
    for code in codes:
        vocab = MULTILANG_VOCAB[code]
        for _ in range(n_per_lang):
            n_words = int(rng.integers(8, 21))
            words = [vocab[int(rng.integers(0, len(vocab)))]
                     for _ in range(n_words)]
            rows.append((doc_id, code, " ".join(words)))
            doc_id += 1
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
