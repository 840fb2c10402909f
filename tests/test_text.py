"""Edge-case unit tests for the text expression library."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_cpc_schema_spark.functions import text as TX


def _one(spark, text, expr_fn):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(expr_fn(F.col("t")).alias("v")).first()["v"]


def test_empty_and_whitespace_strings(spark):
    for s in ["", "   "]:
        assert _one(spark, s, TX.token_count) == 0
        assert _one(spark, s, TX.word_shingles) == []
        assert _one(spark, s, TX.langid_heuristic) == "unk"
        assert _one(spark, s, TX.stopword_count) == 0
        assert _one(spark, s, TX.quality_ok) is False
    # rolling hash is character-level (no trim): '' is 0, whitespace
    # hashes its spaces — matching the SQL oracle exactly.
    assert _one(spark, "", TX.rolling_hash) == 0
    assert _one(spark, "   ", TX.rolling_hash) == 32 * (31 * 31 + 31 + 1)


def test_short_doc_shingles(spark):
    assert _one(spark, "a b", TX.word_shingles) == []          # < n tokens
    assert _one(spark, "a b c", TX.word_shingles) == ["a b c"]
    assert sorted(_one(spark, "a b c d", TX.word_shingles)) == ["a b c", "b c d"]
    # duplicates collapse (distinct shingle set)
    assert _one(spark, "x y x y x y x", TX.word_shingles) == ["x y x", "y x y"]


def test_fingerprint_normalization(spark):
    a = _one(spark, "  Hello   World ", TX.fingerprint)
    b = _one(spark, "hello world", TX.fingerprint)
    assert a == b == hashlib.md5(b"hello world").hexdigest()


def test_bpe_ish_counts_words_and_punct(spark):
    assert _one(spark, "ab, cd!", TX.bpe_ish_token_count) == 4  # ab , cd !
    assert _one(spark, "", TX.bpe_ish_token_count) == 0


def test_rolling_hash_matches_python_model(spark):
    def model(s: str, mult=31, mod=2147483647) -> int:
        h = 0
        for ch in s:
            h = (h * mult + ord(ch)) % mod
        return h

    for s in ["abc", "the quick brown fox", "a"]:
        assert _one(spark, s, TX.rolling_hash) == model(s)
