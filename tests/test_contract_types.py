"""Driver-contract type gate (VERDICT.md round 1, "Next round" #2).

The external driver hashes Spark results against DuckDB oracle results
after a pandas conversion that renders DECIMAL and HUGEINT as float64.
Round 1 shipped six queries whose values matched but whose declared
output types (DECIMAL(18,2) / window-sum HUGEINT) hash-mismatched.

These tests make the recurrence impossible:
  * every declared query's Spark output schema must be free of
    DecimalType (top-level, nested, and array elements);
  * every declared oracle's DuckDB plan must emit no DECIMAL/HUGEINT
    column.
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as E
from pyspark.sql import functions as F

BANNED_ORACLE_TYPES = ("DECIMAL", "HUGEINT")


def _walk_decimals(dt: T.DataType, name: str, out: list[str]) -> None:
    """Fully recursive: structs, arrays, and maps at ANY nesting depth
    (a map<string, decimal> or array<array<decimal>> must not slip
    through the gate)."""
    if isinstance(dt, T.DecimalType):
        out.append(name)
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            _walk_decimals(f.dataType, f"{name}.{f.name}", out)
    elif isinstance(dt, T.ArrayType):
        _walk_decimals(dt.elementType, name + "[]", out)
    elif isinstance(dt, T.MapType):
        _walk_decimals(dt.keyType, name + "<key>", out)
        _walk_decimals(dt.valueType, name + "<value>", out)


def _decimal_fields(schema: T.StructType) -> list[str]:
    out: list[str] = []
    for f in schema.fields:
        _walk_decimals(f.dataType, f.name, out)
    return out


def test_no_decimal_in_any_declared_spark_schema(spark, sf_dir):
    offenders = {}
    for name, fn in E.queries().items():
        bad = _decimal_fields(fn(spark, sf_dir).schema)
        if bad:
            offenders[name] = bad
    assert not offenders, f"DecimalType in declared outputs: {offenders}"


def test_no_decimal_or_hugeint_in_any_oracle_plan(sf_dir):
    from conftest import ORACLE_TABLES

    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders = {}
    for name, sql in E.oracle_sql().items():
        otypes = [str(t).upper() for t in con.sql(sql).types]
        bad = [t for t in otypes if any(b in t for b in BANNED_ORACLE_TYPES)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"DECIMAL/HUGEINT in oracle plans: {offenders}"


def test_driver_priority_names_enumerate_first():
    """VERDICT r2 #1: the driver samples a subset of the registry per
    round; queries()/oracle_sql() must enumerate the least-driver-
    checked names first so they land in the sample."""
    from etl_cpc_schema_spark import queries as Q

    names = list(E.queries())
    prio = [n for n in Q._DRIVER_PRIORITY if n in names]
    assert names[: len(prio)] == prio
    assert list(E.oracle_sql())[: len(prio)] == [
        n for n in prio if n in E.oracle_sql()
    ]
    # every priority name must actually exist (no typo'd dead entries)
    dead = [n for n in Q._DRIVER_PRIORITY if n not in Q.SPARK_QUERIES]
    assert not dead, f"priority names not in registry: {dead}"


def test_every_query_has_oracle_or_documented_waiver():
    qs = set(E.queries())
    oracles = set(E.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    # round 2: every declared query is oracle-checked — no rows-only waivers
    assert qs == oracles, f"rows-only queries without oracle: {qs - oracles}"


def test_survey_query_count_matches_registry():
    """VERDICT r3 #8: SURVEY.md's declared-query count must track
    ``len(queries())`` — doc drift here misleads the coverage audit."""
    import re

    import os

    n = len(E.queries())
    survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    text = open(survey).read()
    stated = {int(m) for m in re.findall(r"(\d+) declared quer", text)}
    stated |= {int(m) for m in re.findall(r"declared query \((\d+)\)", text)}
    assert stated == {n}, f"SURVEY.md says {stated}, registry has {n}"


def test_attach_scalar_key_always_zero(spark):
    """_attach_scalar's non-foldable constant key must be 0 for EVERY
    key-source value — fractional doubles (x % 1 is nonzero but casts
    to 0), negatives, and NULLs (coalesce) — or rows would silently
    drop from the single-row join."""
    from etl_cpc_schema_spark.queries import _attach_scalar

    big = spark.createDataFrame(
        [(2.5,), (-3.75,), (None,), (0.0,), (7.0,)], "v double"
    )
    one = big.agg(F.count("v").alias("n_vals"))
    out = _attach_scalar(big, one, "v")
    rows = out.collect()
    assert len(rows) == 5  # no row lost to a key mismatch
    assert all(r["n_vals"] == 4 for r in rows)
