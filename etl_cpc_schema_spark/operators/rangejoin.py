"""Interval (range) join — another operator Spark lacks natively.

Naive formulations (cross join + filter, or a non-equi theta join)
explode at scale.  The standard composition: bucketize the range key
on both sides with bucket width = the join radius, equi-join on
(key, bucket) for each of the 3 adjacent bucket offsets, then apply
the exact range predicate.  Each row joins against at most 3 buckets,
so the shuffle is equi-join-shaped and the candidate fan-out is
bounded by bucket occupancy rather than |left|×|right|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    max_gap_us: int,
) -> DataFrame:
    """Pairs (left row, right row) with same key and
    ``|left_time - right_time| <= max_gap_us`` (times in microseconds
    via unix_micros; pass timestamp columns).

    Output: all left columns + right columns suffixed ``_r``.
    """
    if max_gap_us <= 0:
        raise ValueError(
            f"max_gap_us must be positive (got {max_gap_us}); a zero gap "
            "would floor-divide by zero into NULL buckets and silently "
            "match nothing — use an equi-join on the timestamp instead"
        )
    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))

    l = left.withColumn("__t", lt).withColumn(
        "__bucket", F.floor(F.col("__t") / max_gap_us)
    )
    r = (
        right.select(
            F.col(key),
            rt.alias("__rt"),
            *[
                F.col(c).alias(f"{c}_r")
                for c in right.columns
                if c != key
            ],
        )
        .withColumn("__rbucket", F.floor(F.col("__rt") / max_gap_us))
        # each right row posts to its own and both neighbor buckets
        .withColumn(
            "__bucket",
            F.explode(
                F.array(
                    F.col("__rbucket") - 1, F.col("__rbucket"), F.col("__rbucket") + 1
                )
            ),
        )
        .drop("__rbucket")
    )
    return (
        l.join(r, [key, "__bucket"])
        .filter(F.abs(F.col("__t") - F.col("__rt")) <= max_gap_us)
        .drop("__t", "__rt", "__bucket")
    )
