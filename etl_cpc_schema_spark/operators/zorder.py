"""Z-order (Morton-curve) clustered writes for multi-column data skipping.

Parquet readers prune files/row-groups with min-max statistics, but the
stats only help when values are clustered: a table sorted by one column
skips scans filtered on THAT column and nothing else.  Interleaving the
bits of several columns (the Morton / Z-order curve) clusters rows so
that every participating column's values are locally narrow — a filter
on ANY of the z-ordered columns prunes most files.  This is the same
lever Delta's OPTIMIZE ZORDER BY pulls; here it is plain Spark:
expression-computed key + range repartition + sorted write.

At 100 TB this is a one-off (or periodic) layout job: one extra
min/max pass + one range shuffle, repaid on every subsequent selective
scan.  The interleave itself is pure Column bit arithmetic — JVM-side,
codegen, no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per column in the interleaved key, capped at runtime so
#: len(cols) × bits ≤ 63 (bit 63 is the long's SIGN bit — landing
#: there would flip half the keys negative and split the curve at the
#: sign wrap): 2 columns keep all 16, 4 columns drop to 15.  65k (or
#: 32k) distinct cells per dimension is far finer than file-level
#: pruning can exploit either way.
ZORDER_BITS = 16


def _scale_to_bits(
    col: Column, lo, hi, bits: int, integral: bool = False
) -> Column:
    """Affine-map a numeric column into [0, 2^bits) as a long.

    Constant-range scaling (not ntile): a window rank would shuffle
    the full table once more just to compute the key, while min/max
    are a cheap one-row aggregate; equal-width cells are exactly what
    min-max file stats can prune against.

    For ``integral`` columns the offset ``col - lo`` is computed in
    the LONG domain before the double division: casting a 64-bit value
    beyond 2^53 (snowflake-style ids) straight to double would round
    away its low bits, skewing cell boundaries and — in the
    narrow-range-at-large-offset degenerate case — collapsing the
    whole affine map to one cell (round-7 ADVICE).  With the exact
    offset, only a SPAN wider than 2^53 still quantizes (boundaries
    then shift by < 1 ulp relative — harmless for file-level
    pruning); a span at or beyond 2^63 falls back to the double path
    since the long subtraction itself would overflow.
    """
    span = hi - lo
    if span <= 0:  # constant column — every row lands in cell 0
        return F.lit(0).cast("long")
    max_cell = (1 << bits) - 1
    if integral and span < (1 << 63):
        offset = col.cast("long") - F.lit(int(lo)).cast("long")
        scaled = offset.cast("double") / F.lit(float(span)) * F.lit(max_cell)
    else:
        scaled = (
            (col.cast("double") - F.lit(float(lo)))
            / F.lit(float(span))
            * F.lit(max_cell)
        )
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)), F.lit(max_cell)
    )


def _interleave(cells: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * n_cols + j.  Unrolled to bits x n_cols constant shift/mask
    expressions — whole-stage-codegen folds them into straight-line
    JVM arithmetic."""
    n = len(cells)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cells):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """Morton key over ``cols`` for ``df``.

    Runs one driver-side min/max aggregate per call (control-plane: a
    single row of 2x|cols| scalars) and embeds the ranges as literals
    so the key itself is a pure expression.  NULLs map to cell 0 —
    they cluster together at the curve's origin.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    # keep the top interleaved bit position (bits*n - 1) below the
    # sign bit of a long
    bits = min(bits, 63 // len(cols))
    from pyspark.sql import types as T

    # numeric view per column: temporal types map to their epoch
    # ordinal (date → days, timestamp → seconds) — z-ordering on a
    # date column is the canonical OPTIMIZE ZORDER BY case
    num = {}
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.DateType,)):
            num[c] = F.datediff(F.col(c), F.lit("1970-01-01"))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            num[c] = F.col(c).cast("double")
        elif isinstance(dt, T.NumericType):
            num[c] = F.col(c)
        else:
            raise TypeError(
                f"zorder_key: column {c!r} has non-orderable-numeric "
                f"type {dt.simpleString()}; cast it to a numeric or "
                "temporal type first"
            )
    aggs = []
    for c in cols:
        aggs += [
            F.min(num[c]).alias(f"__lo_{c}"),
            F.max(num[c]).alias(f"__hi_{c}"),
        ]
    row = df.agg(*aggs).first()
    cells = []
    for c in cols:
        dt = df.schema[c].dataType
        # exact-offset path for whole-number domains (incl. date →
        # epoch days): keeps ids beyond 2^53 from collapsing — see
        # _scale_to_bits
        integral = isinstance(dt, (T.DateType, T.IntegralType))
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        if lo is None:  # all-NULL column
            cells.append(F.lit(0).cast("long"))
            continue
        cells.append(
            _scale_to_bits(
                F.coalesce(num[c], F.lit(lo)), lo, hi, bits, integral
            )
        )
    return _interleave(cells, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    target_files: int = 32,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``.

    ``repartitionByRange`` on the Morton key gives each output file a
    contiguous key range (one range-exchange shuffle — sampled
    boundaries, so skew in the key does not skew the files), and the
    within-partition sort makes row-group stats monotone inside each
    file.  Filters on any of ``cols`` then prune most files from the
    footer stats alone.  Same error-on-exists default as the other
    destructive sinks.
    """
    key = zorder_key(df, cols)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(target_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
