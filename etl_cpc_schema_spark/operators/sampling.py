"""Deterministic dataset splitting and sampling for training pipelines.

``randomSplit`` is nondeterministic across runs/partitionings — a
training pipeline needs splits that are stable under re-execution,
backfill, and engine change.  Hash-bucket the stable id with the
portable md5 hash (functions.hashing) and assign by cumulative weight:
the same row lands in the same split everywhere, forever, and the
assignment is a narrow map-only projection (no shuffle, no state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

#: number of hash buckets — weights are expressed in percent.
BUCKETS = 100


def split_column(id_col: Column, weights: dict[str, int]) -> Column:
    """Split label from a stable id: buckets [0,w1) → first label,
    [w1, w1+w2) → second, …  Weights must sum to 100."""
    if sum(weights.values()) != BUCKETS:
        raise ValueError(f"weights must sum to {BUCKETS}: {weights}")
    bucket = portable_hash64(id_col.cast("string"), seed="split") % BUCKETS
    expr: Column | None = None
    upper = 0
    items = list(weights.items())
    for label, w in items[:-1]:
        upper += w
        cond = bucket < upper
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last_label = items[-1][0]
    return (expr.otherwise(F.lit(last_label)) if expr is not None else F.lit(last_label))


def deterministic_split(
    df: DataFrame, id_col: str, weights: dict[str, int]
) -> DataFrame:
    """df + a ``split`` column ('train'/'val'/'test'/…)."""
    return df.withColumn("split", split_column(F.col(id_col), weights))


def split_sql(id_expr: str, weights: dict[str, int]) -> str:
    """DuckDB CASE expression computing the identical split label."""
    from ..functions.hashing import portable_hash64_sql

    bucket = f"({portable_hash64_sql(f'CAST({id_expr} AS VARCHAR)', 'split')} % {BUCKETS})"
    parts = []
    upper = 0
    items = list(weights.items())
    for label, w in items[:-1]:
        upper += w
        parts.append(f"WHEN {bucket} < {upper} THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{items[-1][0]}' END"


def stratified_sample(
    df: DataFrame, stratum_col: str, rates: dict[str, int], id_col: str
) -> DataFrame:
    """Deterministic per-stratum downsampling (language rebalancing).

    ``rates`` maps stratum value → keep-percentage; strata not listed
    are dropped.  Same hash-bucket mechanics as the split: a row's
    keep/drop decision is a map-only projection, stable across runs,
    partitionings, and engines — ``df.sampleBy`` is none of those.
    """
    for v in rates.values():
        if not 0 <= v <= BUCKETS:
            raise ValueError(f"rates must be 0..{BUCKETS} percent: {rates}")
    bucket = portable_hash64(F.col(id_col).cast("string"), seed="strat") % BUCKETS
    rate: Column = F.lit(0)
    for label, pct in rates.items():
        rate = F.when(F.col(stratum_col) == label, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def stratified_sample_sql(
    stratum_expr: str, rates: dict[str, int], id_expr: str
) -> str:
    """DuckDB WHERE predicate computing the identical sample."""
    from ..functions.hashing import portable_hash64_sql

    bucket = f"({portable_hash64_sql(f'CAST({id_expr} AS VARCHAR)', 'strat')} % {BUCKETS})"
    rate = "0"
    for label, pct in rates.items():
        rate = f"CASE WHEN {stratum_expr} = '{label}' THEN {pct} ELSE {rate} END"
    return f"{bucket} < ({rate})"
