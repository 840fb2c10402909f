"""Drive the driver contract exactly as the round driver would:
vanilla SparkSession, entry() smoke, queries() vs oracle_sql() via
DuckDB at sf0.01, order-insensitive column-sorted value compare.

Hardened after round 1 (VERDICT.md "Next round" #2): the round-1 version
normalized Decimal scale (``v.normalize()``) which masked six driver
hash-mismatches (Spark ``Decimal('3.10')`` vs DuckDB-pandas ``3.1``).
This version is strictly stricter than the driver:

  1. exact-form compare: Decimals keep their scale (no normalize), and a
     Decimal never equals a float;
  2. pandas-form compare: the same rows via DuckDB ``fetchdf()`` with every
     value stringified — the closest local model of the driver's hasher;
  3. type gate: a query FAILS if its Spark schema contains DecimalType or
     its oracle plan emits DECIMAL/HUGEINT, even when values match today.
"""
import decimal
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import types as T

import __spark_entry__ as E

# vanilla session — deliberately NOT the engine's tuned factory.
# CPUS/PARTS env overrides let the sweep re-run under a different
# parallelism to catch partition-order-sensitive nondeterminism
# (the driver's own session config is unknown).  MEM sizes the JVM
# heap only: the cross-SF arm at sf0.1 OOMs under Spark's 1g default
# (8 concurrent SMJ sorts' spill-reader buffers in a 128MB/thread
# heap — round 13 reproduced the q82 heap death in a fresh JVM; any
# real deployment sizes executors in GB).  Heap size is harness
# infrastructure, not engine tuning — SQL semantics stay vanilla.
import os as _os

_cpus = _os.environ.get("SPARK_GRAFT_DRIVE_CPUS", "8")
_parts = _os.environ.get("SPARK_GRAFT_DRIVE_PARTS", "8")
_mem = _os.environ.get("SPARK_GRAFT_DRIVE_MEM", "4g")
spark = (
    SparkSession.builder.master(f"local[{_cpus}]")
    .config("spark.sql.shuffle.partitions", _parts)
    .config("spark.driver.memory", _mem)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

print("== entry() smoke ==")
df = E.entry(spark)
rows = df.collect()
print(f"entry rows={len(rows)} schema={[f.name for f in df.schema.fields]}")
print("sample:", rows[0])

import os

SF = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

BANNED_ORACLE_TYPES = ("DECIMAL", "HUGEINT")


def _spark_decimal_fields(schema, prefix=""):
    """Names of DecimalType fields anywhere in the schema (incl. nested)."""
    out = []
    for f in schema.fields:
        dt = f.dataType
        name = f"{prefix}{f.name}"
        if isinstance(dt, T.DecimalType):
            out.append(name)
        elif isinstance(dt, T.StructType):
            out.extend(_spark_decimal_fields(dt, name + "."))
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.DecimalType):
            out.append(name + "[]")
    return out


def norm(v):
    # exact form: keep decimal scale, never conflate Decimal with float
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v)
    return v


def rows_key(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in data)


def str_form(v):
    """Stringified value the way a pandas-based hasher would see it."""
    if hasattr(v, "tolist"):  # numpy scalar / ndarray from fetchdf
        v = v.tolist()
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if v is None:
        return "None"
    return str(v)


def rows_str_key(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str_form(r[i]) for i in order) for r in data)


qs = E.queries()
oracles = E.oracle_sql()
print(f"== {len(qs)} queries, {len(oracles)} oracles ==")
failures = []
# optional name filters: `python tools/drive_contract.py q15 stream_`
# runs only queries whose name contains one of the given substrings —
# the fast loop while iterating on a single operator
_only = [a for a in sys.argv[1:] if not a.startswith("-")]
_selected = sorted(
    n for n in qs if not _only or any(tok in n for tok in _only)
)
if _only:
    print(f"== filtered to {len(_selected)} of {len(qs)} queries: {_only} ==")

for name in _selected:
    t0 = time.perf_counter()
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        sraw = [tuple(r) for r in sdf.collect()]
        srows = rows_key(scols, sraw)
    except Exception as ex:
        failures.append((name, f"SPARK ERROR: {str(ex)[:200]}"))
        print(f"  {name}: SPARK ERROR {str(ex)[:120]}")
        continue
    dec_fields = _spark_decimal_fields(sdf.schema)
    if dec_fields:
        failures.append((name, f"TYPE GATE: DecimalType in Spark output: {dec_fields}"))
    if name not in oracles:
        print(f"  {name}: rows-only ({len(srows)} rows) [{time.perf_counter()-t0:.1f}s]")
        if not srows:
            failures.append((name, "rows-only query returned 0 rows"))
        continue
    try:
        # type gate on the oracle plan (no execution needed)
        otypes = [str(t).upper() for t in con.sql(oracles[name]).types]
        bad = [t for t in otypes if any(b in t for b in BANNED_ORACLE_TYPES)]
        if bad:
            failures.append((name, f"TYPE GATE: oracle emits {bad}"))
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = rows_key(dcols, res.fetchall())
        pdf = con.execute(oracles[name]).fetchdf()
        drows_str = rows_str_key(list(pdf.columns), list(pdf.itertuples(index=False, name=None)))
    except Exception as ex:
        failures.append((name, f"ORACLE ERROR: {str(ex)[:300]}"))
        print(f"  {name}: ORACLE ERROR {str(ex)[:120]}", flush=True)
        continue
    ok_cols = sorted(scols) == sorted(dcols)
    ok_rows = srows == drows
    srows_str = rows_str_key(scols, sraw)
    ok_pandas = srows_str == drows_str
    status = "OK" if (ok_cols and ok_rows and ok_pandas) else "MISMATCH"
    print(f"  {name}: {status} spark={len(srows)} duck={len(drows)} [{time.perf_counter()-t0:.1f}s]")
    if not ok_cols:
        failures.append((name, f"cols {scols} vs {dcols}"))
    elif not ok_rows:
        bad = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        failures.append((name, f"rows differ, first: {bad}"))
    elif not ok_pandas:
        bad = [(a, b) for a, b in zip(srows_str, drows_str) if a != b][:3]
        failures.append((name, f"pandas-form rows differ, first: {bad}"))

print("== RESULT ==")
if failures:
    for n, m in failures:
        print("FAIL", n, m)
    sys.exit(1)
if _only:
    print(f"ALL {len(_selected)} FILTERED QUERIES OK (of {len(qs)} declared)")
else:
    print(f"ALL {len(qs)} QUERIES OK (oracle-matched: {len(oracles)})")
