"""Z-order clustered writes: multi-column data-skipping locality.

The assertion model reads the written parquet footers directly: if the
layout works, EVERY z-ordered column's per-file [min, max] span is a
small fraction of its global range (a single-column sort gets one
column narrow and leaves the others at ~full span; a random layout
leaves all at ~full span)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from etl_cpc_schema_spark.operators.zorder import write_zordered, zorder_key


def _mean_span_fraction(files: list[str], col: str) -> float:
    los, his = [], []
    for f in files:
        md = pq.read_metadata(f)
        flo = min(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.row_group(i).num_columns)
                    if md.row_group(i).column(j).path_in_schema == col
                )
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        fhi = max(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.row_group(i).num_columns)
                    if md.row_group(i).column(j).path_in_schema == col
                )
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        los.append(flo)
        his.append(fhi)
    glo, ghi = min(los), max(his)
    if ghi == glo:
        return 0.0
    return sum(h - l for l, h in zip(los, his)) / len(los) / (ghi - glo)


def test_zordered_write_narrows_both_columns(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    dest = str(tmp_path / "li_z")
    write_zordered(li, dest, ["l_partkey", "l_suppkey"], target_files=16)

    back = spark.read.parquet(dest)
    assert back.count() == li.count()  # layout job, not a filter

    files = sorted(glob.glob(f"{dest}/*.parquet"))
    assert len(files) >= 8  # range partitioner actually spread the data
    span_p = _mean_span_fraction(files, "l_partkey")
    span_s = _mean_span_fraction(files, "l_suppkey")
    # 2-D z-order over ~16 files: each file covers ~1/16 of the area,
    # so each dimension's span is ~sqrt(1/16) = 0.25 of global.  A
    # single-column sort would leave the OTHER column at ~1.0.
    assert span_p < 0.6, f"l_partkey mean file span {span_p:.2f}"
    assert span_s < 0.6, f"l_suppkey mean file span {span_s:.2f}"


def test_zorder_key_is_deterministic_expression(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k1 = li.select(
        zorder_key(li, ["l_partkey", "l_suppkey"]).alias("k")
    ).collect()
    k2 = li.select(
        zorder_key(li, ["l_partkey", "l_suppkey"]).alias("k")
    ).collect()
    assert k1 == k2
    assert all(r["k"] >= 0 for r in k1)


def test_zorder_constant_and_null_columns(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (1, None)], "a int, b int"
    )
    rows = df.select(zorder_key(df, ["a", "b"]).alias("k")).collect()
    assert [r["k"] for r in rows] == [0, 0, 0]


def test_zorder_four_columns_stays_nonnegative(spark, sf_dir):
    """4 columns × the default 16 bits would put the top interleaved
    bit at position 63 — the long's SIGN bit — so zorder_key caps bits
    at 63 // n_cols; keys must stay non-negative for every row even
    when all four columns sit at the top of their ranges."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = li.select(
        zorder_key(
            li, ["l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"]
        ).alias("k")
    )
    from pyspark.sql import functions as F

    row = keys.agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).first()
    assert row["lo"] >= 0
    assert row["hi"] < (1 << 60)  # 4 cols x 15 bits


def test_zorder_temporal_column(spark, sf_dir, tmp_path):
    """Z-ordering on a timestamp column (the canonical OPTIMIZE
    ZORDER BY case) maps the temporal value to its epoch ordinal
    instead of crashing in float(); both clustered columns narrow."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from etl_cpc_schema_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).select("event_id", "ts", "user_id")
    dest = str(tmp_path / "ev_z")
    write_zordered(ev, dest, ["ts", "user_id"], target_files=8)
    back = spark.read.parquet(dest)
    assert back.count() == ev.count()
    files = sorted(glob.glob(f"{dest}/*.parquet"))
    assert len(files) >= 4
    assert _mean_span_fraction(files, "user_id") < 0.7

    # non-numeric, non-temporal columns fail loudly, naming the column
    import pytest as _pytest

    with _pytest.raises(TypeError, match="event_type"):
        zorder_key(
            spark.read.parquet(f"{sf_dir}/events.parquet"), ["event_type"]
        )


def test_zorder_snowflake_ids_beyond_2_53(spark):
    """64-bit ids past 2^53 with a narrow range at a large offset: the
    old float path quantized ids to multiples of the double ulp (256
    at 2^60) BEFORE subtracting lo, collapsing 1024 evenly spaced ids
    into ~17 coarse cells.  The integer-offset path (round-7 ADVICE)
    computes (id - lo) exactly in the long domain, so the full cell
    range fills."""
    from pyspark.sql import functions as F

    base = 1 << 60  # snowflake-style epoch-packed id territory
    rows = [(base + i, i % 7) for i in range(0, 4096, 4)]
    df = spark.createDataFrame(rows, "big_id bigint, grp int")
    keys = df.select(zorder_key(df, ["big_id"], bits=8).alias("k"))
    n_cells = keys.select(F.countDistinct("k")).first()[0]
    # 1024 evenly spaced ids into 256 cells: the exact-offset map fills
    # the whole cell range; the ulp-quantized float path managed ~17
    assert n_cells > 200

    # two-column interleave with the huge-offset id still spans cells
    keys2 = df.select(zorder_key(df, ["big_id", "grp"], bits=8).alias("k"))
    assert keys2.select(F.countDistinct("k")).first()[0] > 200
