"""Edge-semantics tests for the as-of join operator."""

from __future__ import annotations

from etl_cpc_schema_spark.operators.asof import asof_join


def test_asof_basic_tie_and_missing(spark):
    left = spark.createDataFrame(
        [(1, 5, "e1"), (1, 3, "e2"), (2, 1, "e3"), (3, 7, "e4")],
        "k int, t int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 3, "r3"), (1, 4, "r4"), (2, 2, "r2")],
        "k int, rt int, v string",
    )
    out = {
        r["tag"]: r["vv"]
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            value_col="v", out_col="vv",
        ).collect()
    }
    assert out["e1"] == "r4"   # latest at-or-before t=5
    assert out["e2"] == "r3"   # tie: right row at the same instant wins (>=)
    assert out["e3"] is None   # no right row at-or-before t=1
    assert out["e4"] is None   # key with no right rows at all


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame([(1, i, f"e{i}") for i in range(10)], "k int, t int, tag string")
    right = spark.createDataFrame([(1, 5, "x")], "k int, rt int, v string")
    out = asof_join(left, right, "k", "t", "rt", "v")
    assert out.count() == 10
    got = {r["tag"]: r["v"] for r in out.collect()}
    assert got["e4"] is None and got["e5"] == "x" and got["e9"] == "x"


def test_asof_null_value_row_matches_as_null(spark):
    """A matched right row whose value is NULL must yield NULL (SQL ASOF
    semantics), not leak the previous non-null value through
    last(ignorenulls) — code-review regression."""
    from etl_cpc_schema_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 12)], "k bigint, lt bigint")
    right = spark.createDataFrame(
        [(1, 5, 7), (1, 10, None)], "k bigint, rt bigint, v int"
    )
    out = asof_join(left, right, "k", "lt", "rt", "v", out_col="asof_v").collect()
    assert out[0]["asof_v"] is None  # the t=10 NULL row matched, not t=5's 7


def test_asof_out_col_collision_raises(spark):
    import pytest

    from etl_cpc_schema_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 12, 0)], "k bigint, lt bigint, v int")
    right = spark.createDataFrame([(1, 5, 7)], "k bigint, rt bigint, v int")
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, "k", "lt", "rt", "v")
