"""Streaming ingest (SURVEY.md §2.7 / §7 phase 5).

The reference's streaming-shaped pieces are control-plane: a timer
trigger re-running the batch pipeline (reference etl_function.py:16-30)
and idempotent skip-if-present downloads (downloader.py:152-154).  The
Spark-native equivalents:

* file-source Structured Streaming with ``trigger(availableNow=True)``
  — scheduled micro-batch ingestion with checkpointed idempotence,
* watermarked tumbling-window aggregation for event streams.

For local verification the parquet ``events`` table drives the stream
to completion synchronously via a memory sink; the identical plan runs
against a real file/Kafka source on a cluster.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: nanos timestamps read as raw INT64 (see sources.readers.read_events).
EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def hourly_counts_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts computed THROUGH the streaming engine.

    readStream(parquet) → watermark → window agg → memory sink, driven
    to completion with availableNow.  Returns the final batch result
    with the same shape as the batch query (hour_start string, n) so
    the DuckDB oracle can check it.
    """
    # File streaming sources require a directory; the glob narrows the
    # scan to the events table within it.
    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "n",
        )
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="spark_stream_ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("hour_start")


def static_join_counts_stream(spark: SparkSession, data_dir: str) -> DataFrame:
    """Stream-static join: the events STREAM broadcast-joins the static
    customer dimension (re-read per micro-batch — picking up dim
    updates is the semantic), then aggregates counts per market
    segment.  The canonical streaming-enrichment shape; oracle is the
    batch join's SQL.
    """
    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(data_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    customers = spark.read.parquet(f"{data_dir}/customer.parquet")
    joined = stream.join(
        F.broadcast(customers),
        stream.user_id == customers.c_custkey,
    )
    agg = joined.groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    name = f"stream_sjoin_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="spark_stream_ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("c_mktsegment")


def attribution_join_stream(
    spark: SparkSession, events_dir: str, window: str = "10 minutes"
) -> DataFrame:
    """Stream-STREAM time-interval join: each purchase event joins the
    same user's click events from the preceding ``window`` — the
    classic attribution shape.  Both sides carry watermarks so the
    join state is bounded; inner join + append mode, driven to
    completion with availableNow.  Returns (purchase_id, click_id)
    pairs.
    """

    def src():
        return (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(events_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )

    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        src()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id")
    name = f"stream_attr_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="spark_stream_ckpt_")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("purchase_id", "click_id")


def dedup_counts_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming exact dedup: the events source is UNIONED WITH ITSELF
    (every event arrives twice), then ``dropDuplicates`` keyed-state
    removes the copies before a windowless grouped count.  The batch
    oracle is the plain per-type count — correct iff the dedup state
    actually dropped the doubled rows.  Exercises chained stateful
    operators (dedup → agg) through the streaming engine.
    """

    def src():
        return (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(events_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )

    doubled = src().union(src())
    agg = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="spark_stream_ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("event_type")


def session_counts_stream(
    spark: SparkSession, events_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Per-user session event counts via the streaming engine's
    ``session_window`` (dynamic-gap state merging), driven to
    completion with availableNow.

    Sessions are renumbered 1.. per user by window start so the result
    matches the batch sessionization twin (q22).  Boundary semantics:
    the ``session_window`` gap is INCLUSIVE — an event arriving exactly
    ``gap`` after the previous one extends the session (verified with
    an exact-1800 s fixture), identical to the lag formulation's
    strict ``> gap`` starts-new rule.
    """
    from pyspark.sql.window import Window

    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="spark_stream_ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    renum = Window.partitionBy("user_id").orderBy(F.col("w.start"))
    return (
        spark.table(name)
        .withColumn("session_id", F.row_number().over(renum).cast("bigint"))
        .select("user_id", "session_id", "n_events")
        .orderBy("user_id", "session_id")
    )
