"""Snapshot-diff operator: insert/delete/change detection incl. NULL
fingerprint safety."""

from __future__ import annotations

from etl_cpc_schema_spark.operators.snapshot_diff import snapshot_diff


def test_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k bigint, v string"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert got == {1: "deleted", 3: "changed", 4: "inserted"}  # 2 unchanged


def test_diff_null_vs_literal_null_string_differ(spark):
    # NULL-tagged fingerprint: a stored NULL must differ from 'NULL'/''
    old = spark.createDataFrame([(1, None), (2, "")], "k bigint, v string")
    new = spark.createDataFrame([(1, "NULL"), (2, None)], "k bigint, v string")
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_diff_separator_in_value_cannot_fake_boundary(spark):
    # length-prefixed encoding: ("a|1:1:b",) vs ("a", "b") must differ
    old = spark.createDataFrame([(1, "a|1:1:b", None)], "k bigint, x string, y string")
    new = spark.createDataFrame([(1, "a", "b")], "k bigint, x string, y string")
    got = snapshot_diff(old, new, "k", ["x", "y"]).collect()
    assert [(r["k"], r["change_type"]) for r in got] == [(1, "changed")]
