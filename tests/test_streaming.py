"""Structured Streaming jobs: the streamed windowed agg must equal the
batch result over the same bounded input (Trigger.AvailableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_nyc_taxi_data_pipeline_spark.catalog import load
from python_nyc_taxi_data_pipeline_spark.streaming.jobs import (
    read_event_stream,
    run_to_memory_sink,
    run_to_parquet_sink,
    tumbling_counts,
)
from python_nyc_taxi_data_pipeline_spark.streaming.windows import window_tumbling_1h

from tests.conftest import SF_DIR


def _write_source(spark, tmp_path) -> str:
    src = str(tmp_path / "events_src")
    # micro-batch replay across several files
    load(spark, SF_DIR, "events").repartition(4).write.parquet(src)
    return src


def test_stream_tumbling_equals_batch(spark, tmp_path):
    src = _write_source(spark, tmp_path)
    stream = read_event_stream(spark, src, max_files_per_trigger=2)
    run_to_memory_sink(tumbling_counts(stream), "stream_tumbling")
    streamed = (
        spark.sql("SELECT * FROM stream_tumbling")
        .groupBy("window_start", "event_type")
        .agg(F.sum("n_events").alias("n_events"))
    )
    batch = window_tumbling_1h(spark, SF_DIR).select(
        "window_start", "event_type", "n_events"
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_parquet_sink_checkpoint_restart(spark, tmp_path):
    """append-mode parquet sink + checkpoint: a second availableNow run
    over the same input emits nothing new (exactly-once replay)."""
    src = _write_source(spark, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = read_event_stream(spark, src)
    run_to_parquet_sink(tumbling_counts(stream), out, ckpt)
    n1 = spark.read.parquet(out).count()

    # restart over identical input: checkpoint replays nothing
    stream2 = read_event_stream(spark, src)
    run_to_parquet_sink(tumbling_counts(stream2), out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2
