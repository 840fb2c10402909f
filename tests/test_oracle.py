"""The engine-side twin of the driver's correctness gate: run every
declared query on Spark AND its DuckDB oracle at sf0.001 and compare
row sets exactly (order-insensitive, column-name-sorted)."""

from __future__ import annotations

import duckdb
import pytest

from conftest import ORACLE_TABLES, norm_rows as _rows

from etl_cpc_schema_spark import queries as Q


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(Q.ORACLE_SQL))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = Q.SPARK_QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = _rows(spark_cols, [tuple(r) for r in sdf.collect()])

    res = duck.execute(Q.ORACLE_SQL[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = _rows(duck_cols, res.fetchall())

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first mismatches {mismatches}"


def test_streaming_query_runs(spark, sf_dir):
    df = Q.SPARK_QUERIES["stream_hourly_counts"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["hour_start", "n"]
