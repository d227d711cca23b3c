"""Structured Streaming jobs.

The batch window queries in ``streaming.windows`` use the exact
operators Structured Streaming executes (``F.window`` /
``F.session_window``); this module runs them as real streams:
file-source ``readStream`` → event-time watermark → windowed agg →
sink, with ``Trigger.AvailableNow`` for bounded replay.

Parity: the reference has no streams (SURVEY §2.9) — its incremental
loop is the batch high-water-mark pattern in ``pipeline.medallion``.
This is the engine's forward-looking equivalent: the same bronze
ingest expressed as a continuous query with checkpointed exactly-once
file sinks.

Scale notes: state is keyed by (window, key) and bounded by the
watermark (late data beyond ``delay`` is dropped and state evicted);
``maxFilesPerTrigger`` bounds per-micro-batch work on backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over parquet event files (schema declared,
    never inferred — streaming sources require it anyway)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def tumbling_counts(stream: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Tumbling 1h windows per event_type with a late-data watermark —
    the streaming twin of ``windows.window_tumbling_1h``.

    Event-time watermarks require TIMESTAMP (not NTZ): we cast in at
    the boundary and cast the window back to NTZ on output; with the
    engine's pinned UTC session the wall times are identical.
    """
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join: the static dim broadcasts to every
    micro-batch (re-read per trigger for slowly-changing dims when the
    dim is a file source). No state, no watermark needed."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, "left")


def run_to_memory_sink(
    agg: DataFrame, table_name: str, output_mode: str = "complete"
) -> None:
    """Drain the bounded stream into an in-memory table
    (Trigger.AvailableNow → processes all available input, then stops)."""
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_parquet_sink(
    agg: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Checkpointed append-mode parquet sink: emits only windows sealed
    by the watermark; restart-safe exactly-once via the checkpoint +
    sink metadata log."""
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    stream: DataFrame, keys: list[str] | None = None, delay: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: drop repeats of the key within the
    watermark horizon (``dropDuplicatesWithinWatermark``) — the
    streaming twin of the bronze anti-join dedup (U1) and the
    at-least-once → effectively-once bridge for replayed sources.

    State holds one entry per key seen inside the horizon and is
    evicted as the watermark passes — bounded by (keys × horizon), not
    by stream length, which is what makes it safe on an unbounded
    ingest at scale."""
    keys = keys or ["event_id"]
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(keys)
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes", delay: str = "1 hour") -> DataFrame:
    """Streaming session windows per user — the streaming twin of
    ``windows.window_session_30m``. Session state merges windows as
    events arrive and seals a session once the watermark passes its
    gap-extended end; append mode then emits it exactly once. State per
    (user, open session) — bounded by active users × horizon, the
    canonical stateful-streaming sizing."""
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", delay)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_delay: str = "1 hour",
    right_delay: str = "1 hour",
    within: str = "interval 10 minutes",
) -> DataFrame:
    """Stream-stream INTERVAL JOIN: pair each left event with right
    events of the same key whose event time falls in
    ``[left.ts, left.ts + within]`` — the click→conversion attribution
    shape. Both sides carry watermarks so Spark can bound the join
    state: a buffered left row is droppable once the right watermark
    passes ``left.ts + within`` (and symmetrically), which is what
    makes this run forever on unbounded streams; without the time
    bound the state would grow without limit.

    Inner join (stream-stream outer joins need both watermark AND a
    time-range condition — same condition shape, different nullability;
    inner is the attribution default).
    """
    lt = (
        left.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", left_delay)
        .select(
            F.col(key).alias("l_key"),
            F.col("ts").alias("l_ts"),
            F.col("event_type").alias("l_type"),
            F.col("event_id").alias("l_event_id"),
        )
    )
    rt = (
        right.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", right_delay)
        .select(
            F.col(key).alias("r_key"),
            F.col("ts").alias("r_ts"),
            F.col("event_type").alias("r_type"),
            F.col("event_id").alias("r_event_id"),
        )
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(within))
        & (F.col("l_event_id") != F.col("r_event_id"))
    )
    return lt.join(rt, cond, "inner").select(
        F.col("l_key").alias("user_id"),
        "l_event_id",
        "r_event_id",
        F.col("l_ts").cast("timestamp_ntz").alias("l_ts"),
        F.col("r_ts").cast("timestamp_ntz").alias("r_ts"),
        "l_type",
        "r_type",
    )
