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
    on_duplicate: str = "error",
) -> DataFrame:
    """Apply one batch of attribute snapshots to an SCD2 dim.

    ``dim`` carries the META_COLS; ``batch`` carries key + attribute
    columns only. Returns the full new dim (history + closed + new
    versions). Deterministic: same inputs → same output regardless of
    partitioning.

    A batch MUST hold at most one snapshot per business key — duplicate
    keys would fan out the full-outer join into overlapping validity
    intervals. ``on_duplicate`` controls enforcement: ``"error"``
    (default) runs one small aggregate on the batch and raises;
    ``"keep_first"`` dedups deterministically (lowest attribute tuple
    wins) without the extra job. NULL business keys are legal: join
    matching is null-safe and side detection uses sentinel columns, not
    key nullness."""
    keys = list(keys)
    attrs = [c for c in batch.columns if c not in keys]
    eff = F.lit(effective).cast("timestamp_ntz")

    if on_duplicate == "error":
        dup = (
            batch.groupBy(*[F.col(k) for k in keys])
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"scd2_apply: batch has duplicate business keys, e.g. "
                f"{tuple(dup[0][k] for k in keys)!r}; pass "
                f"on_duplicate='keep_first' for deterministic dedup"
            )
    elif on_duplicate == "keep_first":
        from pyspark.sql import Window

        order = [F.col(a).asc_nulls_first() for a in attrs] or [F.lit(1)]
        w = Window.partitionBy(*keys).orderBy(*order)
        batch = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        raise ValueError(f"on_duplicate must be 'error' or 'keep_first', got {on_duplicate!r}")

    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current")).withColumn("__d_side", F.lit(True))

    b = batch.select(
        *[F.col(k).alias(f"__b_{k}") for k in keys],
        *[F.col(a).alias(f"__b_{a}") for a in attrs],
        F.lit(True).alias("__b_side"),
    )
    key_eq = [F.col(k).eqNullSafe(F.col(f"__b_{k}")) for k in keys]
    joined = current.join(b, _and_all(key_eq), "full_outer")

    # Sentinels, not key nullness: rows whose business key IS NULL must
    # still be attributed to the correct side of the full-outer join.
    batch_side = F.col("__b_side").isNotNull()
    dim_side = F.col("__d_side").isNotNull()
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
