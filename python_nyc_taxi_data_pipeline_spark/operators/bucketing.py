"""Bucketed tables for co-located, shuffle-free joins (SURVEY §4).

Postgres gave the reference B-tree PKs as access paths; the Spark
analog for *join* locality is bucketing: both fact tables are written
pre-hashed into the same number of buckets on the join key, so a later
equi-join reads matching buckets pairwise — no exchange on either side.
At 100 TB this converts the dominant orders⋈lineitem shuffle
(2× full-data network pass) into a purely local merge.

Bucketed writes must go through the session catalog (``saveAsTable`` —
path-based parquet has nowhere to record the bucket spec).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Overwrite ``table`` bucketed (and optionally sorted) on the join
    key. Sorting within buckets additionally enables merge-join without
    a sort step."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphan location can survive a previous session whose in-memory
    # catalog is gone; managed-table creation refuses to reuse it
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:") or "://" not in warehouse:
        import shutil
        from urllib.parse import urlparse

        local = urlparse(warehouse).path or warehouse
        shutil.rmtree(os.path.join(local, table.lower()), ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst elides both Exchanges (verify with
    ``.explain``: no Exchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), list(on))
