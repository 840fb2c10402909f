"""Interval join must equal the naive cross-join formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cpc_schema_spark.operators.rangejoin import interval_join
from etl_cpc_schema_spark.sources.readers import read_events


def test_interval_join_matches_naive(spark, sf_dir):
    e = read_events(spark, sf_dir).select("user_id", "ts", "event_id")
    # deterministic sample: an unordered limit can pick different rows
    # for the two independent actions below
    left = e.filter(F.col("event_id") < 200)
    right = (
        e.select(
            "user_id",
            F.col("ts").alias("rts"),
            F.col("event_id").alias("rid"),
        )
    )
    gap_us = 30 * 60 * 1_000_000  # 30 minutes

    fast = {
        (r["event_id"], r["rid_r"])
        for r in interval_join(
            left, right, key="user_id", left_time="ts", right_time="rts",
            max_gap_us=gap_us,
        ).collect()
    }
    naive = {
        (r["event_id"], r["rid"])
        for r in left.join(right, "user_id")
        .filter(
            F.abs(F.unix_micros("ts") - F.unix_micros("rts")) <= gap_us
        )
        .collect()
    }
    assert fast == naive
    assert len(fast) > 0

def test_interval_join_rejects_nonpositive_gap(spark):
    import pytest

    from etl_cpc_schema_spark.operators.rangejoin import interval_join

    df = spark.createDataFrame([(1,)], "k bigint").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["F"]).current_timestamp()
    )
    with pytest.raises(ValueError, match="positive"):
        interval_join(df, df, "k", "ts", "ts", max_gap_us=0)
