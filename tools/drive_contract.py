"""Drive the driver contract exactly as the round driver would:
vanilla SparkSession, entry() smoke, queries() vs oracle_sql() via
DuckDB at sf0.01, order-insensitive column-sorted value compare."""
import decimal
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

# vanilla session — deliberately NOT the engine's tuned factory
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
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


def norm(v):
    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v)
    return v


def rows_key(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in data)


qs = E.queries()
oracles = E.oracle_sql()
print(f"== {len(qs)} queries, {len(oracles)} oracles ==")
failures = []
for name in sorted(qs):
    t0 = time.perf_counter()
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = rows_key(scols, [tuple(r) for r in sdf.collect()])
    except Exception as ex:
        failures.append((name, f"SPARK ERROR: {str(ex)[:200]}"))
        print(f"  {name}: SPARK ERROR {str(ex)[:120]}")
        continue
    if name not in oracles:
        print(f"  {name}: rows-only ({len(srows)} rows) [{time.perf_counter()-t0:.1f}s]")
        if not srows:
            failures.append((name, "rows-only query returned 0 rows"))
        continue
    try:
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = rows_key(dcols, res.fetchall())
    except Exception as ex:
        failures.append((name, f"ORACLE ERROR: {str(ex)[:300]}"))
        print(f"  {name}: ORACLE ERROR {str(ex)[:120]}", flush=True)
        continue
    ok_cols = sorted(scols) == sorted(dcols)
    ok_rows = srows == drows
    status = "OK" if (ok_cols and ok_rows) else "MISMATCH"
    print(f"  {name}: {status} spark={len(srows)} duck={len(drows)} [{time.perf_counter()-t0:.1f}s]")
    if not ok_cols:
        failures.append((name, f"cols {scols} vs {dcols}"))
    elif not ok_rows:
        bad = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        failures.append((name, f"rows differ, first: {bad}"))

print("== RESULT ==")
if failures:
    for n, m in failures:
        print("FAIL", n, m)
    sys.exit(1)
print(f"ALL {len(qs)} QUERIES OK (oracle-matched: {len(oracles)})")
