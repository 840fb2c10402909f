"""Events-ingest contract: Spark's view of events.ts must equal DuckDB's.

The events table has shipped with two physical encodings of ``ts``
(raw INT64 epoch-nanos and logical ``timestamp[us]``); the readers
probe the footer instead of assuming one (readers.probe_events_ts).
This test pins the contract end-to-end — min/max/count through BOTH
the batch reader and the streaming source must match DuckDB on the
same file — so a future testdata re-encoding breaks pytest
immediately instead of a driver correctness round.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from etl_cpc_schema_spark.sources.readers import probe_events_ts, read_events
from etl_cpc_schema_spark.streaming.ingest import events_stream, run_to_memory


def _oracle_bounds(sf_dir: str):
    return duckdb.sql(
        f"SELECT min(ts), max(ts), count(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()


def _spark_bounds(df):
    row = df.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    # session tz is UTC, so naive datetimes compare directly with DuckDB's
    return (row["lo"], row["hi"], row["n"])


def test_probe_detects_current_encoding(sf_dir):
    schema, needs_div = probe_events_ts(f"{sf_dir}/events.parquet")
    # whichever encoding the data ships with, exactly one branch applies
    assert ("ts long" in schema) == needs_div


def test_batch_events_ts_matches_duckdb(spark, sf_dir):
    assert _spark_bounds(read_events(spark, sf_dir)) == _oracle_bounds(sf_dir)


def test_stream_events_ts_matches_duckdb(spark, sf_dir):
    out = run_to_memory(
        events_stream(spark, sf_dir).select("ts", "event_id"),
        "append",
        prefix="ingest_contract",
    )
    assert _spark_bounds(out) == _oracle_bounds(sf_dir)


def test_probe_handles_directory_layout(spark, sf_dir, tmp_path):
    """A future testdata round may ship events as a directory of
    part-files; the footer probe and reader must handle both layouts."""
    events_dir = tmp_path / "events.parquet"
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(3).write.parquet(
        str(events_dir)
    )
    schema_dir, div_dir = probe_events_ts(str(events_dir))
    schema_file, div_file = probe_events_ts(f"{sf_dir}/events.parquet")
    assert div_dir == div_file
    got = read_events(spark, str(tmp_path))
    assert _spark_bounds(got) == _oracle_bounds(sf_dir)


def test_every_table_reads_consistently_with_duckdb(spark, sf_dir):
    """Cross-engine read contract for ALL tables (not just events):
    row counts and column names must agree between Spark's reader and
    DuckDB on the same parquet.  Catches the next silent re-encoding
    (the round-3 events bug's whole class) at pytest time."""
    from etl_cpc_schema_spark.queries import _t
    from conftest import ORACLE_TABLES

    for name in ORACLE_TABLES:
        df = _t(spark, sf_dir, name)
        duck_cols = [
            r[0]
            for r in duckdb.sql(
                f"DESCRIBE SELECT * FROM '{sf_dir}/{name}.parquet'"
            ).fetchall()
        ]
        assert df.columns == duck_cols, f"{name}: column drift"
        n_duck = duckdb.sql(
            f"SELECT count(*) FROM '{sf_dir}/{name}.parquet'"
        ).fetchone()[0]
        assert df.count() == n_duck, f"{name}: row-count drift"


def test_probe_legacy_nanos_encodings(spark, tmp_path):
    """Both legacy encodings — logical timestamp[ns] and raw INT64
    epoch-nanos — must still take the div-1000 branch and produce the
    same instants as the native timestamp[us] read."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    instants = [
        datetime.datetime(2024, 1, 1, 0, 9, 58, 778549),
        datetime.datetime(2024, 1, 30, 23, 26, 16, 220708),
    ]
    nanos = [int(dt.timestamp() * 1_000_000) * 1000 for dt in instants]
    base = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["click", "purchase"],
        "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }
    for label, ts_arr in {
        "ns_logical": pa.array(nanos, type=pa.timestamp("ns")),
        "int64_raw": pa.array(nanos, type=pa.int64()),
    }.items():
        d = tmp_path / label
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": base["event_id"],
                "ts": ts_arr,
                "user_id": base["user_id"],
                "event_type": base["event_type"],
                "value": base["value"],
                "props": base["props"],
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        schema, needs_div = probe_events_ts(str(d / "events.parquet"))
        assert needs_div, f"{label}: expected the nanos div branch"
        got = sorted(
            r["ts"] for r in read_events(spark, str(d)).select("ts").collect()
        )
        assert got == instants, f"{label}: {got}"


def test_probe_rejects_unrecognized_ts_type(tmp_path):
    """ADVICE r4: a ts column that is neither a logical timestamp nor
    INT64 (int32 / string / decimal) must raise instead of silently
    yielding garbage epoch-nanos instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from etl_cpc_schema_spark.sources.readers import probe_events_ts

    p = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([1, 2, 3], type=pa.int32())}), p
    )
    with pytest.raises(TypeError, match="unrecognized parquet type"):
        probe_events_ts(p)

    # strings are equally unrecognizable
    p2 = str(tmp_path / "events2.parquet")
    pq.write_table(pa.table({"ts": pa.array(["2024-01-01"])}), p2)
    with pytest.raises(TypeError, match="refusing to guess"):
        probe_events_ts(p2)
