"""Streaming variant of the bronze incremental loader (SURVEY §2.9).

The reference's batch high-water-mark loop, re-expressed as a
Structured Streaming query: file-source ``readStream`` over a landing
directory → ``foreachBatch`` → the SAME ``MedallionPipeline.ingest_batch``
(watermark split, dead-letter anti-join, meta row) per micro-batch.
One code path for batch and streaming ingest — the medallion semantics
(strict `>` freshness, idempotent re-runs, crash-safe write ordering)
carry over unchanged, and the streaming checkpoint adds
source-progress tracking on top.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..operators.watermark import MonthWindow
from ..pipeline.medallion import MedallionPipeline


def stream_ingest(
    spark: SparkSession,
    pipe: MedallionPipeline,
    landing_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    window: MonthWindow | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all files currently in ``landing_dir`` through the bronze
    loader (Trigger.AvailableNow), one ``ingest_batch`` per micro-batch.

    ``window=None`` reproduces the reference's
    window-from-current-watermark behavior per micro-batch; passing an
    explicit window pins the month being loaded (the sane mode).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipe.ingest_batch(batch_df, window)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
