"""Oracle parity on EDGE-CASE events the driver's testdata lacks:
exact 1800 s session-boundary gaps, an exact 120 s pair at the
interval join's inclusive boundary (q29), timestamp ties,
NULL / empty / malformed JSON props, NULL and negative values.  Caught live: DuckDB's json_extract_string raises on malformed
JSON where Spark's get_json_object returns NULL (q27 oracle now guards
with json_valid).
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from conftest import norm_rows as _rows

from etl_cpc_schema_spark import queries as Q

# every declared query that reads only events (+ orders for q23)
EVENT_QUERIES = [
    "q15_tumbling_window",
    "q16_dedup_last_wins",
    "q21_running_window",
    "q22_sessionize",
    "q23_asof_join",
    "q24_pivot_counts",
    "q26_distinct_exact",
    "q27_json_extract",
    "q28_unpivot",
    "q43_variant_extract",
    "q29_interval_join",
    "q32_quantiles",
    "q44_asof_forward",
    "q46_nullsafe_join",
    "q48_resample_gapfill",
    "approx_distinct_users",
    "approx_quantiles_bounded",
    "approx_hll_mergeable",
    "stream_hourly_counts",
    "stream_stream_join",
    "stream_user_counts_stateful",
    "stream_sessionize",
    "stream_dedup_counts",
    "stream_windowed_topk",
    "stream_approx_distinct",
    "q55_funnel",
    "q56_cohort_retention",
    # round-7: sliding windows (boundary-timestamp events land in
    # exactly 4 covering windows) and the one-pass profiler (NULL
    # value/props rows exercise the null counters and -1 sentinels)
    "q79_sliding_window",
    "q76_profile_events",
]

# (event_id, ts literal, user_id, event_type, value, props)
EDGE_VALUES = """
  (900001, epoch_ns(TIMESTAMP '2024-02-01 00:00:00'), 9001, 'click', 1.25, '{"k": 7}'),
  (900002, epoch_ns(TIMESTAMP '2024-02-01 00:30:00'), 9001, 'click', -3.5, '{}'),
  (900003, epoch_ns(TIMESTAMP '2024-02-01 01:30:01'), 9001, 'view', 0.0, ''),
  (900004, epoch_ns(TIMESTAMP '2024-02-01 02:00:00'), 9002, 'view', 2.0, '{"x": 1}'),
  (900005, epoch_ns(TIMESTAMP '2024-02-01 02:00:00'), 9002, 'purchase', 2.0, NULL),
  (900006, epoch_ns(TIMESTAMP '2024-02-01 02:00:00.000001'), 9002, 'error', 5.5, 'not json'),
  (900007, epoch_ns(TIMESTAMP '2024-02-01 03:00:00'), 9003, 'click', NULL, '{"k": 1}'),
  (900008, epoch_ns(TIMESTAMP '2024-02-01 03:02:00'), 9003, 'view', 4.0, '{"k": 2}')
"""


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("edge_events")
    con = duckdb.connect()
    # ts lands as INT64 nanos — the exact physical layout read_events
    # and the streaming sources expect (TESTDATA events.parquet shape)
    con.execute(
        f"""
        COPY (
          SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value, props
          FROM '{sf_dir}/events.parquet' WHERE event_id < 300
          UNION ALL
          SELECT * FROM (VALUES {EDGE_VALUES})
            v(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    shutil.copy(f"{sf_dir}/orders.parquet", d / "orders.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW events AS
        SELECT event_id, make_timestamp(ts // 1000) AS ts,
               user_id, event_type, value, props
        FROM '{edge_dir}/events.parquet'
        """
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{edge_dir}/orders.parquet'"
    )
    return con


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_match_oracle(spark, edge_dir, edge_duck, name):
    sdf = Q.SPARK_QUERIES[name](spark, edge_dir)
    spark_rows = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = edge_duck.execute(Q.ORACLE_SQL[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = _rows(duck_cols, res.fetchall())
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert spark_rows == duck_rows, (
        f"{name}: first diffs "
        f"{[(a, b) for a, b in zip(spark_rows, duck_rows) if a != b][:3]}"
    )


def test_boundary_gap_inclusive_both_engines(spark, edge_dir):
    """User 9001's second event is EXACTLY 1800 s after the first: both
    the lag-based batch q22 (strict `> gap` starts new) and the
    streaming session_window (inclusive gap boundary) merge them into
    ONE session — empirically identical semantics."""
    batch = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in Q.SPARK_QUERIES["q22_sessionize"](spark, edge_dir).collect()
        if r["user_id"] == 9001
    }
    stream = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in Q.SPARK_QUERIES["stream_sessionize"](spark, edge_dir).collect()
        if r["user_id"] == 9001
    }
    assert batch[(9001, 1)] == 2
    assert stream[(9001, 1)] == 2
    assert batch == stream
