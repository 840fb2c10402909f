"""As-of (most-recent-match) join — an operator Spark lacks natively.

Implemented as the classic scalable union + window composition rather
than per-group Python merges:

1. tag right rows (priority 0) and left rows (priority 1),
2. union on (key, time, priority),
3. one window per key ordered by (time, priority) carrying
   ``last(value, ignorenulls=True)`` forward,
4. keep the left rows — each now holds the latest right value with
   ``right.time <= left.time`` (ties: the right row at the same
   instant wins, matching SQL ASOF ``>=`` semantics).

Cost at scale: ONE shuffle on the join key and a single sort within
partitions — no range explosion, no per-row lookups.  Skewed keys are
handled by AQE; for extreme skew pre-bucket the time axis.

The right side must be unique per (key, time); deduplicate first
(``lookups.last_write_wins``) or results are ambiguous in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_col: str,
    out_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """left rows + the latest ``value_col`` from right where
    ``right_time <= left_time`` (NULL when no earlier right row).

    ``direction="forward"`` flips the match: the EARLIEST right row
    with ``right_time >= left_time`` — the same union+window plan with
    the time ordering reversed (ties at the same instant still match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    out_col = out_col or value_col
    left_cols = [c for c in left.columns if c != key]
    if out_col == key or out_col in left_cols:
        raise ValueError(
            f"out_col {out_col!r} collides with a left column; pass an "
            "explicit out_col"
        )

    # The carried value rides inside a struct marker: the marker is
    # non-null for every RIGHT row even when the value itself is NULL,
    # so a matched right row with a NULL value yields NULL (SQL ASOF
    # semantics) instead of leaking an older value through
    # last(ignorenulls).
    from pyspark.sql import types as T

    marker_type = T.StructType(
        [T.StructField("v", right.schema[value_col].dataType)]
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__pri"),
        F.struct(F.col(value_col).alias("v")).alias("__vm"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__pri"),
        F.lit(None).cast(marker_type).alias("__vm"),
        *left_cols,
    )
    order = (
        [F.col("__t").asc(), F.col("__pri").asc()]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__pri").asc()]
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l.unionByName(r)
        .withColumn("__asof", F.last("__vm", ignorenulls=True).over(w))
        .filter(F.col("__pri") == 1)
        .select(
            F.col("__k").alias(key),
            *left_cols,
            F.col("__asof.v").alias(out_col),
        )
    )
