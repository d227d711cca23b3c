"""Insert-if-absent / upsert operators (SURVEY §2.7 U1-U3).

The reference relies on Postgres unique indexes + ON CONFLICT DO NOTHING
(`/root/reference/src/sql/bronze_incremental_load.sql:61-62`,
`silver_full_refresh_transformation.sql:11,21,31`). Parquet has no
indexes, so the equivalent is an anti-join against the target before
append — the new side is deduped on the key first so a single batch
can't insert the same key twice.

Scale: the existing side only needs its key columns (column-pruned
scan); when the incoming batch is small relative to the target, Spark
broadcasts the *incoming* keys instead — achieved by joining
existing.keys ⟕ incoming and letting AQE choose, or explicitly with
``broadcast_new=True``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def insert_if_absent(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    dedup_incoming: bool = True,
) -> DataFrame:
    """Rows of ``incoming`` whose key tuple does not appear in ``existing``.

    Mirrors ON CONFLICT (keys) DO NOTHING: batch-internal duplicates
    keep one arbitrary row (the reference keeps the physically-first;
    parquet append order is not defined, so "one row per key" is the
    preserved invariant).
    """
    keys = list(keys)
    new = incoming.dropDuplicates(keys) if dedup_incoming else incoming
    target_keys = existing.select(*keys)
    return new.join(target_keys, keys, "left_anti")


def upsert_append(
    spark_df_writer_path: str,
    incoming: DataFrame,
    keys: Sequence[str],
) -> int:
    """Anti-join ``incoming`` against the parquet table at ``path`` and
    append the novel rows. Returns the number of appended rows.

    Write-ordering discipline (SURVEY §3.4): data lands before any
    metadata advances, and the anti-join makes re-runs idempotent.
    """
    spark = incoming.sparkSession
    try:
        existing = spark.read.parquet(spark_df_writer_path)
        novel = insert_if_absent(incoming, existing, keys)
    except Exception:  # first write: target does not exist yet
        novel = incoming.dropDuplicates(list(keys))
    novel = novel.cache()
    n = novel.count()
    if n:
        novel.write.mode("append").parquet(spark_df_writer_path)
    novel.unpersist()
    return n
