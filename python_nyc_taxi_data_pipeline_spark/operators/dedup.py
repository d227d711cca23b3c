"""Deduplication operators (SURVEY §2.5 W1, §7.3 scale note d).

The reference dedups by ROW_NUMBER() OVER (PARTITION BY <all 19 cols>)
(`/root/reference/src/sql/silver_full_refresh_transformation.sql:40-49`).
Partitioning a shuffle on a 19-column composite key is wasteful at
100 TB — the scale path hashes the row once into a 64-bit key and
aggregates on that, with an optional full-row tie-break only applied
within hash buckets (collision safety via keeping the full row as the
aggregate payload is unnecessary for dedup-keep-any semantics; for
keep-first we group on the full column tuple which Spark hashes
internally anyway via dropDuplicates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate elimination — hash-aggregate, no wide sort.

    ``dropDuplicates`` compiles to a hash aggregate keyed on the listed
    columns: partial (map-side) dedup happens before the shuffle, so at
    scale the shuffle carries at most one row per distinct key per input
    partition.
    """
    return df.dropDuplicates(list(subset) if subset is not None else None)


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    ascending: bool = True,
) -> DataFrame:
    """Keep the first row per key under an explicit ordering (W1 with a
    real key subset — e.g. latest record per entity).

    Uses ROW_NUMBER over (keys → order) — one shuffle on ``keys``.
    """
    ob = [F.asc(c) if ascending else F.desc(c) for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ob)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def row_fingerprint(df: DataFrame, out_col: str = "row_hash") -> DataFrame:
    """64-bit row fingerprint (xxhash64 over every column) — the cheap
    pre-key for dedup/anti-join at scale: shuffling 8 bytes instead of a
    wide tuple."""
    return df.withColumn(out_col, F.xxhash64(*df.columns))
