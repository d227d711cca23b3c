"""Table maintenance operators: small-file compaction and the
write-audit-publish pattern.

Incremental ingestion appends files per batch (the medallion writes one
file set per month per run) — after N runs a partition holds N small
file groups and scan cost degrades (footer/open overhead per file, poor
row-group pruning). These are the ops a 100 TB deployment schedules:

- ``compact_partitions``: rewrite chosen partitions into
  size-targeted, optionally sorted files (sorting tightens parquet
  min/max stats → better row-group pruning on the sort key).
- ``write_audit_publish``: stage → validate → atomic rename. Readers
  never observe a half-written or invalid table state — poor man's
  transaction for plain-parquet tables (a lakehouse format would use a
  commit log instead).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def parquet_files_under(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return out


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    partitions: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> None:
    """Rewrite the given partitions with size-targeted file counts.

    File count per partition = ceil(partition_bytes / target). The
    rewrite goes through a staging dir + dynamic partition overwrite so
    a crash mid-compaction leaves the original data intact.
    """
    df = spark.read.parquet(table_path).filter(
        F.col(partition_col).isin(list(partitions))
    )
    # estimate bytes per partition from the current files
    sizes: dict[str, int] = {}
    for p in partitions:
        part_dir = os.path.join(table_path, f"{partition_col}={p}")
        sizes[p] = sum(os.path.getsize(f) for f in parquet_files_under(part_dir))
    n_files = {
        p: max(1, -(-b // target_file_bytes)) for p, b in sizes.items()
    }
    # one pass per distinct file count (usually 1); sorted within files
    for count in sorted(set(n_files.values())):
        parts = [p for p, n in n_files.items() if n == count]
        chunk = df.filter(F.col(partition_col).isin(parts)).repartition(count)
        if sort_cols:
            chunk = chunk.sortWithinPartitions(*sort_cols)
        (
            chunk.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(table_path)
        )


def write_audit_publish(
    df: DataFrame,
    final_path: str,
    audit: Callable[[DataFrame], bool],
    staging_root: str | None = None,
) -> bool:
    """Write to a staging dir, audit the WRITTEN files, then publish by
    atomic rename. Returns True if published; on audit failure the
    staging dir is removed and the previous table state is untouched."""
    staging_root = staging_root or os.path.dirname(final_path.rstrip("/"))
    staging = os.path.join(staging_root, f"._staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    spark = df.sparkSession
    written = spark.read.parquet(staging)
    if not audit(written):
        shutil.rmtree(staging, ignore_errors=True)
        return False
    if os.path.exists(final_path):
        old = final_path.rstrip("/") + f"._old_{uuid.uuid4().hex}"
        os.rename(final_path, old)
        os.rename(staging, final_path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, final_path)
    return True
