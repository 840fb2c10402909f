"""Bucketed-table helpers: co-locate repeated joins/aggregations.

At 100 TB, re-shuffling a fact table for every join on the same key is
the dominant cost.  Writing it bucketed (hash-partitioned into a fixed
number of files per key, sorted within buckets) lets every later
equi-join or aggregation on that key run with NO exchange: Spark reads
matching buckets pairwise.  The test suite asserts the shuffle-free
plan (no ``Exchange`` operator) for a bucketed-bucketed join.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two same-bucketed tables; plan contains no shuffle."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    # MERGE hint: demonstrate the co-located sort-merge path rather
    # than letting a small test table take the broadcast shortcut.
    return left.hint("merge").join(right, key)


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
