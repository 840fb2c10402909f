"""Cross-engine portability tests for the md5-derived hash family."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import functions as F

from etl_cpc_schema_spark.functions import hashing as H


def _py_hash(s: str, seed) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def test_portable_hash_matches_python_and_duckdb(spark):
    df = spark.createDataFrame([("abc",), ("spark engine",)], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", H.portable_hash64(F.col("s"), seed=7).alias("h")).collect()
    }
    for s, h in got.items():
        assert h == _py_hash(s, 7)
        duck = duckdb.sql(
            "SELECT " + H.portable_hash64_sql(f"'{s}'", 7)
        ).fetchone()[0]
        assert h == duck


def test_minhash_signature_values(spark):
    df = spark.createDataFrame([(["a b c", "b c d"],)], "sh array<string>")
    sig = df.select(H.minhash_signature(F.col("sh"), 4).alias("sig")).first()["sig"]
    for i, v in enumerate(sig):
        assert v == min(_py_hash("a b c", i), _py_hash("b c d", i))


def test_band_keys_shape(spark):
    df = spark.createDataFrame([([1, 2, 3, 4],)], "sig array<bigint>")
    keys = df.select(H.band_keys(F.col("sig"), 2, 2).alias("bk")).first()["bk"]
    assert len(keys) == 2
    assert keys[0] == hashlib.md5(b"0,1,2").hexdigest()
    assert keys[1] == hashlib.md5(b"1,3,4").hexdigest()
