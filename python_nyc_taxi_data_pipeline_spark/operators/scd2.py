"""Slowly-changing-dimension type 2 (SCD2) maintenance.

The reference's dims are overwrite-in-place (type 1: `silver.vendor`
upsert, `silver_full_refresh_transformation.sql:10-11`). SCD2 extends
the same dim-maintenance surface with history: instead of replacing an
attribute, the current row is closed (``valid_to`` set, ``is_current``
false) and a new version appended — the standard warehouse pattern the
medallion silver layer needs once dims stop being static.

Implemented as pure DataFrame set algebra (no MERGE engine required —
works on plain parquet):

  unchanged  = current rows whose key is absent from the batch, or
               whose attributes are identical
  closed     = current rows whose attributes differ in the batch
               → valid_to = batch effective ts, is_current = false
  new        = batch rows that are new keys or changed attributes
               → valid_from = effective ts, valid_to = null, current

Scale: one shuffle on the business key (the join); history rows
(is_current = false) never join — they pass through untouched, so cost
is O(|current| + |batch|), not O(|table|). With the dim bucketed on
the key the join is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(batch: DataFrame, effective: datetime) -> DataFrame:
    """Bootstrap an SCD2 dim from a first snapshot."""
    return (
        batch.withColumn("valid_from", F.lit(effective).cast("timestamp_ntz"))
        .withColumn("valid_to", F.lit(None).cast("timestamp_ntz"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    effective: datetime,
) -> DataFrame:
    """Apply one batch of attribute snapshots to an SCD2 dim.

    ``dim`` carries the META_COLS; ``batch`` carries key + attribute
    columns only. Returns the full new dim (history + closed + new
    versions). Deterministic: same inputs → same output regardless of
    partitioning.
    """
    keys = list(keys)
    attrs = [c for c in batch.columns if c not in keys]
    eff = F.lit(effective).cast("timestamp_ntz")

    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    b = batch.select(
        *[F.col(k).alias(f"__b_{k}") for k in keys],
        *[F.col(a).alias(f"__b_{a}") for a in attrs],
    )
    key_eq = [F.col(k).eqNullSafe(F.col(f"__b_{k}")) for k in keys]
    joined = current.join(b, _and_all(key_eq), "full_outer")

    batch_side = F.col(f"__b_{keys[0]}").isNotNull()
    dim_side = F.col(keys[0]).isNotNull()
    changed = _or_all(
        [~F.col(a).eqNullSafe(F.col(f"__b_{a}")) for a in attrs]
    ) if attrs else F.lit(False)

    # current rows: key absent from batch, or attributes identical → keep
    keep = joined.filter(dim_side & (~batch_side | ~changed)).select(dim.columns)
    # current rows with changed attrs → close
    close = (
        joined.filter(dim_side & batch_side & changed)
        .select(dim.columns)
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )
    # batch rows that are new keys or changed attrs → new current version
    new_rows = (
        joined.filter(batch_side & (~dim_side | changed))
        .select(
            *[F.col(f"__b_{k}").alias(k) for k in keys],
            *[F.col(f"__b_{a}").alias(a) for a in attrs],
        )
        .withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(None).cast("timestamp_ntz"))
        .withColumn("is_current", F.lit(True))
    )
    return history.unionByName(keep).unionByName(close).unionByName(new_rows)


def scd2_as_of(dim: DataFrame, ts: datetime) -> DataFrame:
    """Point-in-time view: the attribute version valid at ``ts``."""
    t = F.lit(ts).cast("timestamp_ntz")
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop(*META_COLS)


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _or_all(conds):
    if not conds:
        return F.lit(False)
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out
