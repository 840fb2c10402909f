"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship composite pipeline query at
sf0.001; ``queries()``/``oracle_sql()`` expose the declared
correctness set from ``etl_cpc_schema_spark.queries`` (SURVEY.md §2.9
Q1-Q16 plus dedup / similarity / text / multimodal / streaming
extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_cpc_schema_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.SPARK_QUERIES["q14_pipeline_composite"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — EVERY declared query has one
    (round 2: streaming queries use their batch twins' SQL; float/sketch
    queries emit tolerance flags the exact SQL asserts)."""
    return Q.oracle_sql()
