"""Text-analysis expressions for training-data pipelines.

Whitespace tokenization, word-shingling, quality features, a
deterministic language-ID heuristic, and document fingerprinting —
all as native Column expressions (higher-order functions), so the hot
path never crosses into Python.  Each has an exactly-equivalent DuckDB
formulation used by the correctness oracle (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Deterministic mini stopword list for quality scoring.
STOPWORDS = ["the", "a", "and", "of", "to"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty string → empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (single-space joined) from a token array.

    O(len) construction: chain ``zip_with`` over shifted copies of the
    token array, then slice off the ragged tail.  The naive
    transform-over-indices + per-element ``slice`` form is O(len²)
    per document because higher-order functions re-evaluate the sliced
    operand per element — catastrophic on long documents.
    """
    shingle = toks
    for i in range(1, n):
        shifted = F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(0)))
        shingle = F.zip_with(shingle, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(
        F.slice(shingle, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column."""
    return word_shingles_from_tokens(tokens(text), n)


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(STOPWORDS)))


def char_class_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_chars, n_alpha, n_punct) — cheap quality signals."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return n_chars, n_alpha, n_punct


def quality_ok(text: Column, min_tokens: int = 10, max_tokens: int = 10_000) -> Column:
    """Keep-document predicate: length band + at least one stopword —
    the standard cheap-heuristic pre-filter for web corpora."""
    n = token_count(text)
    return (n >= min_tokens) & (n <= max_tokens) & (stopword_count(text) > 0)


def langid_heuristic(text: Column) -> Column:
    """Deterministic n-gram-flavored language guess.

    Real language ID needs character-ngram models; the engine's
    deterministic stand-in scores the two strongest English function
    words and falls back to 'unk'.  (Exactly reproducible in SQL for
    the oracle; swap in a Pandas-UDF model for production.)
    """
    toks = tokens(text)
    n = F.size(toks)
    the_n = F.size(F.filter(toks, lambda t: t == "the"))
    a_n = F.size(F.filter(toks, lambda t: t == "a"))
    return (
        F.when(n == 0, F.lit("unk"))
        .when((the_n + a_n) * 20 >= n, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


#: "BPE-ish" pre-tokenizer: word runs or single non-space punctuation.
BPE_ISH_PATTERN = r"\w+|[^\w\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-style pre-tokenization regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def rolling_hash(text: Column, mult: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the character codes:
    h = fold(h*31 + code) mod 2^31-1 — the classic Rabin-Karp
    fingerprint, with modular arithmetic that never leaves int64 so
    the SQL oracle computes the identical value."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * mult + c) % mod,
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — stable across engines, usable as an exact-dedup key."""
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(norm)
