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

BANNED_ORACLE_TYPES = ("DECIMAL", "HUGEINT")


def _decimal_fields(schema: T.StructType, prefix: str = "") -> list[str]:
    out: list[str] = []
    for f in schema.fields:
        dt = f.dataType
        name = f"{prefix}{f.name}"
        if isinstance(dt, T.DecimalType):
            out.append(name)
        elif isinstance(dt, T.StructType):
            out.extend(_decimal_fields(dt, name + "."))
        elif isinstance(dt, T.ArrayType):
            if isinstance(dt.elementType, T.DecimalType):
                out.append(name + "[]")
            elif isinstance(dt.elementType, T.StructType):
                out.extend(_decimal_fields(dt.elementType, name + "[]."))
    return out


def test_no_decimal_in_any_declared_spark_schema(spark, sf_dir):
    offenders = {}
    for name, fn in E.queries().items():
        bad = _decimal_fields(fn(spark, sf_dir).schema)
        if bad:
            offenders[name] = bad
    assert not offenders, f"DecimalType in declared outputs: {offenders}"


def test_no_decimal_or_hugeint_in_any_oracle_plan(sf_dir):
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders = {}
    for name, sql in E.oracle_sql().items():
        otypes = [str(t).upper() for t in con.sql(sql).types]
        bad = [t for t in otypes if any(b in t for b in BANNED_ORACLE_TYPES)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"DECIMAL/HUGEINT in oracle plans: {offenders}"


def test_every_query_has_oracle_or_documented_waiver():
    qs = set(E.queries())
    oracles = set(E.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    # round 2: every declared query is oracle-checked — no rows-only waivers
    assert qs == oracles, f"rows-only queries without oracle: {qs - oracles}"
