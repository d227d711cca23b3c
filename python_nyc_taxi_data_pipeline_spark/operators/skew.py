"""Skew-handling operators for hot keys at scale.

AQE's skew-join splitting (on in ``session.get_session``) covers the
sort-merge-join case automatically; these helpers cover the two cases
AQE doesn't: skewed *aggregations* and skewed *broadcast-ineligible*
joins, via deterministic key salting.

Salted aggregation: groupBy(key) on a hot key funnels every row of
that key through one reducer. Two-phase salting — groupBy(key, salt)
partial → groupBy(key) final — bounds any reducer's load to
|key|/n_salts at the cost of one extra (tiny) shuffle of
|keys|×n_salts pre-aggregated rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the full row
    (no RNG → re-runs and retries produce identical partitioning)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, Column] | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe count/sum aggregation.

    Phase 1 groups by (keys, salt) — map-side partial agg plus a
    shuffle where the hottest key spreads over ``n_salts`` reducers.
    Phase 2 re-aggregates the ≤ |keys|×n_salts partials.
    """
    sum_cols = sum_cols or {}
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[expr.alias(f"__sum_{name}") for name, expr in sum_cols.items()],
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__cnt").alias("n_rows"),
        *[F.sum(f"__sum_{name}").alias(name) for name in sum_cols],
    )


def replicate_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join when the small side is modest but above the
    broadcast threshold: salt the skewed side, replicate the small side
    ``n_salts`` times, join on (key, salt). Every reducer gets at most
    1/n_salts of any hot key."""
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, [key, "__salt"])
    return out.drop("__salt")
