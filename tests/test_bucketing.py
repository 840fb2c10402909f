"""Bucketing: a join of two same-bucketed tables must be shuffle-free."""

from __future__ import annotations

import re

from etl_cpc_schema_spark.operators import bucketing as B


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # saveAsTable writes to the session's (static) warehouse dir; the
    # tables are dropped below and the dir is gitignored.
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    B.write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "orders_b", "custkey", buckets=4,
    )
    B.write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "customer_b", "custkey", buckets=4,
    )

    try:
        joined = B.bucketed_join(spark, "orders_b", "customer_b", "custkey")
        plan = B.physical_plan(joined)
        assert "SortMergeJoin" in plan
        # no shuffle on either side: bucketed scans align 1:1
        assert not re.search(r"\bExchange\b", plan), plan

        # and the result is correct
        assert joined.count() == orders.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "custkey"
    )
    plan = B.physical_plan(orders.hint("merge").join(customer, "custkey"))
    assert "Exchange" in plan  # the contrast case