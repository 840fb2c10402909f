"""Slowly-changing-dimension (SCD2) merge without a lakehouse format.

Delta/Iceberg's MERGE INTO is not available in a plain-parquet
deployment; the same upsert-with-history semantics compose from
anti-join + union + window:

* incoming rows CLOSE the current version of matching keys
  (set ``valid_to`` and ``is_current=false``),
* unmatched current rows pass through untouched,
* incoming rows append as the new current version.

One broadcastable join against the incoming batch (dimension-sized by
definition of SCD) + one narrow union: no full-table shuffle.  The
reference's analog is the last-write-wins dict overwrite
(validator.py:93-131) — this operator is its history-keeping upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    incoming: DataFrame,
    key: str,
    effective_col: str,
) -> DataFrame:
    """Apply an incoming batch to an SCD2 table.

    ``current`` schema: key, attributes…, valid_from, valid_to (NULL =
    open), is_current.  ``incoming`` schema: key, attributes…,
    ``effective_col`` (the new version's valid_from).

    A batch may carry several versions of one key; only the LATEST by
    ``effective_col`` is applied (last-write-wins within the batch —
    without this, the inner join against a duplicated key would emit
    duplicate closed rows and two open ``is_current`` rows, corrupting
    the dimension).  Ties on ``effective_col`` are broken arbitrarily;
    feed a strictly ordered effective column for determinism.
    """
    from .lookups import last_write_wins

    incoming = last_write_wins(incoming, key, effective_col)
    inc_keys = incoming.select(key).distinct()
    inc_effective = incoming.select(
        key, F.col(effective_col).alias("__new_from")
    )

    untouched = current.join(F.broadcast(inc_keys), key, "left_anti")

    closed = (
        current.filter(F.col("is_current"))
        .join(F.broadcast(inc_effective), key, "inner")
        .withColumn("valid_to", F.col("__new_from"))
        .withColumn("is_current", F.lit(False))
        .drop("__new_from")
    )
    expired_history = current.filter(~F.col("is_current")).join(
        F.broadcast(inc_keys), key, "left_semi"
    )

    opened = (
        incoming.withColumnRenamed(effective_col, "valid_from")
        .withColumn("valid_to", F.lit(None).cast(current.schema["valid_to"].dataType))
        .withColumn("is_current", F.lit(True))
    )

    cols = current.columns
    return (
        untouched.select(cols)
        .unionByName(closed.select(cols))
        .unionByName(expired_history.select(cols))
        .unionByName(opened.select(cols))
    )
