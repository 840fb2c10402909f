"""Salted join / two-stage agg must equal their unsalted twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cpc_schema_spark.operators import skew as SK


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "custkey"
    )
    plain = (
        orders.join(customer, "custkey")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
        .collect()
    )
    salted = (
        SK.salted_join(orders, customer, "custkey", salt_from="o_orderkey", factor=4)
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
        .collect()
    )
    assert plain == salted


def test_two_stage_agg_equals_plain_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r["l_orderkey"]: r["n"]
        for r in li.groupBy("l_orderkey").agg(F.count("*").alias("n")).collect()
    }
    staged = {
        r["l_orderkey"]: r["count_l_quantity"]
        for r in SK.two_stage_agg(
            li, "l_orderkey", "l_quantity", salt_from="l_linenumber", agg="count"
        ).collect()
    }
    assert plain == staged


def test_salted_join_rejects_small_side_preserving_joins(spark):
    import pytest

    from etl_cpc_schema_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 10)], "k bigint, id bigint")
    small = spark.createDataFrame([(1, "x")], "k bigint, v string")
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="big-side-preserving"):
            salted_join(big, small, key="k", salt_from="id", how=how)
