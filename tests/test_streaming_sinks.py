"""Streaming sink patterns: foreachBatch idempotent upsert and the
Observation metrics API."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cpc_schema_spark.streaming.ingest import EVENTS_RAW_SCHEMA


def test_foreachbatch_upsert_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch as the MERGE-style sink: each micro-batch upserts
    per-user counts into a parquet 'dimension' (read-modify-overwrite —
    the plain-parquet stand-in for MERGE INTO).  Re-running the stream
    over an unchanged source with the same checkpoint must not change
    the sink (exactly-once via checkpoint + idempotent batch writes)."""
    out = str(tmp_path / "user_counts")
    ckpt = str(tmp_path / "ckpt")

    def upsert(batch_df, batch_id):
        fresh = batch_df.groupBy("user_id").agg(F.count("*").alias("n"))
        try:
            current = batch_df.sparkSession.read.parquet(out)
        except Exception:
            current = None
        if current is not None:
            merged = (
                current.unionByName(fresh)
                .groupBy("user_id")
                .agg(F.sum("n").alias("n"))
            )
        else:
            merged = fresh
        merged.cache().count()  # materialize before overwriting the input
        merged.write.mode("overwrite").parquet(out)
        merged.unpersist()

    def run_once():
        stream = (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = {r["user_id"]: r["n"] for r in spark.read.parquet(out).collect()}
    expected = {
        r["user_id"]: r["n"]
        for r in spark.read.schema(EVENTS_RAW_SCHEMA)
        .parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert first == expected

    run_once()  # same checkpoint, no new data → no-op batch
    second = {r["user_id"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert second == first


def test_observation_metrics_single_pass(spark, sf_dir):
    """The Observation API collects audit metrics DURING the action —
    no second scan — the cheap way to attach row-count/quality gauges
    to every production write."""
    from pyspark.sql import Observation

    obs = Observation("docs_audit")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text") == "", 1).otherwise(0)).alias("n_empty"),
    )
    n_collected = d.count()
    got = obs.get
    assert got["n_rows"] == n_collected
    assert got["n_empty"] >= 0
