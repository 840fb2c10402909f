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


def test_scrub_pii_redacts_all_shapes(spark):
    from etl_cpc_schema_spark.functions.text import scrub_pii
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [
            ("write bob.smith+x@sub.example.co.uk today",),
            ("host 10.0.255.3 port open",),
            ("call 555-123-4567 or +4915123456789 now",),
            ("no pii here at all",),
        ],
        "text string",
    ).select(scrub_pii(F.col("text")).alias("clean"))
    got = [r["clean"] for r in rows.collect()]
    assert got == [
        "write <EMAIL> today",
        "host <IP> port open",
        "call <PHONE> or <PHONE> now",
        "no pii here at all",
    ]


def test_url_domains_distinct_sorted(spark):
    from etl_cpc_schema_spark.functions.text import url_domains
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [
            ("see https://b.org/x and http://a.com/y and https://b.org/z",),
            ("no links",),
        ],
        "text string",
    ).select(url_domains(F.col("text")).alias("d"))
    got = [list(r["d"]) for r in rows.collect()]
    assert got == [["a.com", "b.org"], []]


def test_ngram_repetition_stats_flags_loops(spark):
    from etl_cpc_schema_spark.functions.text import ngram_repetition_stats
    from pyspark.sql import functions as F

    n, mx = ngram_repetition_stats(F.col("text"), n=3)
    rows = spark.createDataFrame(
        [
            ("spam spam spam spam spam spam",),  # 4 trigrams, all identical
            ("one two three four five six",),    # 4 distinct trigrams
            ("",),                                # empty: 0 ngrams
        ],
        "text string",
    ).select(n.alias("n"), mx.alias("mx"))
    got = [(r["n"], r["mx"]) for r in rows.collect()]
    assert got == [(4, 4), (4, 1), (0, 0)]


def test_unicode_parity_with_duckdb(spark):
    """Rolling hash (codepoints), fingerprint (utf8 md5), and token
    counts agree with DuckDB on non-ASCII text — accents, CJK, and an
    astral-plane emoji (JVM surrogate pairs must not split)."""
    import duckdb
    from pyspark.sql import functions as F

    from etl_cpc_schema_spark.functions.text import fingerprint, rolling_hash, tokens

    from etl_cpc_schema_spark.functions.text import bpe_ish_token_count

    cases = ["café naïve", "日本語 テスト!", "emoji 🙂 here.", "Ünïcödé  mix\tends"]
    df = spark.createDataFrame([(c,) for c in cases], "text string").select(
        "text",
        rolling_hash(F.col("text")).alias("rh"),
        fingerprint(F.col("text")).alias("fp"),
        F.size(tokens(F.col("text"))).alias("nt"),
        bpe_ish_token_count(F.col("text")).alias("nb"),
    )
    srows = {
        r["text"]: (r["rh"], r["fp"], r["nt"], r["nb"]) for r in df.collect()
    }
    con = duckdb.connect()
    for c in cases:
        got = con.execute(
            r"""
            SELECT list_reduce([CAST(0 AS BIGINT)] ||
                     list_transform(list_filter(split(?, ''), c -> c <> ''),
                                    c -> CAST(ord(c) AS BIGINT)),
                     (a,b) -> (a*31+b) % 2147483647),
                   md5(lower(trim(regexp_replace(?, '\s+', ' ', 'g')))),
                   len(list_filter(string_split_regex(trim(?), '\s+'), x -> x <> '')),
                   len(regexp_extract_all(?, '\w+|[^\w\s]'))
            """,
            [c, c, c, c],
        ).fetchone()
        assert srows[c] == got, f"{c!r}: spark={srows[c]} duck={got}"
