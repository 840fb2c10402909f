"""pack_sequences: distributed two-phase cumulative sum (VERDICT r2 #1).

The naive formulation (one window partitioned by the stream column)
serializes each stream into a single task; the rewrite must produce
IDENTICAL bins while partitioning the heavy window by
(stream, pack_bucket).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_cpc_schema_spark.operators.packing import pack_sequences


def _fixture(spark):
    # non-contiguous ids, uneven streams, a NULL stream, and texts whose
    # token counts vary so bucket boundary sums are non-trivial
    rows = []
    for i in range(300):
        lang = ["en", "de", None][i % 3] if i % 7 else "en"
        text = " ".join(f"w{j}" for j in range((i * 13) % 29 + 1))
        rows.append((i * 3 + (i % 5), lang, text))
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def _expected_bins(rows, budget):
    by_stream: dict = {}
    for doc_id, lang, text in rows:
        by_stream.setdefault(lang, []).append((doc_id, len(text.split())))
    exp = {}
    for lang, docs in by_stream.items():
        cum = 0
        for doc_id, n in sorted(docs):
            exp[doc_id] = cum // budget
            cum += n
    return exp


def test_pack_matches_sequential_semantics(spark):
    df = _fixture(spark)
    got = {
        r["doc_id"]: r["bin_id"]
        for r in pack_sequences(df, budget=64, buckets=8).collect()
    }
    exp = _expected_bins([(r.doc_id, r.lang, r.text) for r in df.collect()], 64)
    assert got == exp


def test_pack_heavy_window_is_bucketed(spark, sf_dir):
    """No windowspec over the full data may partition by the stream
    alone: the only stream-partitioned window allowed is the tiny
    per-bucket prefix sum over the aggregate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = pack_sequences(docs, budget=256)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected window operators in the plan"
    bucketed = [s for s in specs if "pack_bucket" in s]
    unbucketed = [s for s in specs if "pack_bucket" not in s]
    assert bucketed, f"heavy window lost its bucket key: {specs}"
    # at most the offsets prefix window may partition by stream alone
    assert len(unbucketed) <= 1, f"unexpected stream-wide windows: {unbucketed}"


def test_pack_single_doc_stream(spark):
    df = spark.createDataFrame(
        [(1, "xx", "one two three")], "doc_id bigint, lang string, text string"
    )
    rows = pack_sequences(df, budget=2).collect()
    assert len(rows) == 1 and rows[0]["bin_id"] == 0 and rows[0]["n_tokens"] == 3
