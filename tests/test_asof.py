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
