"""Grouped-map Pandas operators (``applyInPandas``).

Completes the engine's Python-UDF API surface (mapInPandas →
``llm.multimodal``; applyInPandasWithState → ``streaming.stateful``;
grouped map → here). Use case: per-group model fitting that built-in
SQL can't express — the demo fits a least-squares trend of event value
over time per user.

Scale: one shuffle on the grouping key; each group materializes as one
pandas frame in the worker (bound group sizes before using this on
skewed keys — or pre-aggregate). Closure is self-contained (pickled by
value; workers need no package import).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import register

TREND_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_slope_per_hour", T.DoubleType()),
        T.StructField("value_mean", T.DoubleType()),
    ]
)


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user least-squares slope of ``value`` against event time
    (units: value per hour), via grouped-map applyInPandas."""

    def fit(pdf):
        import numpy as np
        import pandas as pd

        t = pdf["ts"].astype("int64").to_numpy() / 3.6e12  # ns → hours
        v = pdf["value"].to_numpy(dtype=float)
        if len(v) >= 2 and np.ptp(t) > 0:
            t0 = t - t.mean()
            slope = float((t0 * (v - v.mean())).sum() / (t0 * t0).sum())
        else:
            slope = 0.0
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(v)],
                "value_slope_per_hour": [round(slope, 6)],
                "value_mean": [round(float(v.mean()), 6)],
            }
        )

    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        fit, TREND_SCHEMA
    )


def user_value_trend_batched(events: DataFrame) -> DataFrame:
    """Same per-user least-squares fit, but through ONE mapInPandas
    pass: hash-repartition on ``user_id``, concatenate each partition's
    Arrow batches, and fit EVERY group in that partition with a single
    vectorized pandas groupby — no per-group Python round-trip. With
    thousands of tiny groups this is ~5-10× cheaper than the grouped-map
    path (which pays a pandas call per group); memory is bounded by one
    partition, same as any shuffle consumer."""

    def fit_partition(batches):
        import numpy as np
        import pandas as pd

        frames = list(batches)
        if not frames:  # hash partitions can be empty at tiny SF
            return
        pdf = pd.concat(frames, ignore_index=True)
        if pdf.empty:
            return
        pdf["t"] = pdf["ts"].astype("int64") / 3.6e12  # ns → hours
        g = pdf.groupby("user_id", sort=False)
        n = g.size()
        tm, vm = g["t"].mean(), g["value"].mean()
        # demeaned moments per group, all vectorized
        pdf["t0"] = pdf["t"] - pdf["user_id"].map(tm)
        pdf["v0"] = pdf["value"].astype(float) - pdf["user_id"].map(vm)
        pdf["tv"] = pdf["t0"] * pdf["v0"]
        pdf["tt"] = pdf["t0"] * pdf["t0"]
        agg = pdf.groupby("user_id", sort=False)[["tv", "tt"]].sum()
        slope = np.where(
            (n.to_numpy() >= 2) & (agg["tt"].to_numpy() > 0),
            agg["tv"].to_numpy() / np.where(agg["tt"].to_numpy() > 0, agg["tt"].to_numpy(), 1.0),
            0.0,
        )
        yield pd.DataFrame(
            {
                "user_id": n.index.to_numpy(dtype="int64"),
                "n_events": n.to_numpy(dtype="int64"),
                "value_slope_per_hour": np.round(slope, 6),
                "value_mean": np.round(vm.to_numpy(dtype=float), 6),
            }
        )

    spark = events.sparkSession
    n_part = max(2, spark.sparkContext.defaultParallelism // 4)
    return (
        events.select("user_id", "ts", "value")
        .repartition(n_part, "user_id")
        .mapInPandas(fit_partition, TREND_SCHEMA)
    )


@register(
    "events_user_trend",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           TRUE AS slope_matches_sql,
           TRUE AS mean_matches_sql
    FROM events
    GROUP BY user_id
    """,
    tags=("udf", "grouped"),
)
def events_user_trend(spark, sf_dir: str) -> DataFrame:
    """Grouped-map UDF surface with a *checkable* contract: the pandas
    least-squares fit is float-order-sensitive, so instead of shipping
    raw slopes the query joins the grouped-map result against Spark's
    own closed-form ``regr_slope``/``avg`` and emits per-user booleans
    asserting agreement within the 6-dp rounding tolerance. The DuckDB
    oracle recomputes the exact group counts and expects TRUE — a
    broken UDF path now fails the driver hash check. Uses the batched
    mapInPandas fit (one vectorized pandas groupby per partition) — the
    per-group applyInPandas variant stays exported/unit-tested as the
    grouped-map API demo, but with ~150 tiny groups it pays a pandas
    call per group and was the bench's 5.6s outlier."""
    e = load(spark, sf_dir, "events")
    fitted = user_value_trend_batched(e)
    # tz-free epoch hours (ntz stays ntz — no session-tz/DST distortion);
    # any constant offset cancels in the regression slope anyway.
    hours = (
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
        .cast("double")
        / 3600.0
    )
    sql_side = e.groupBy("user_id").agg(
        F.regr_slope(F.col("value").cast("double"), hours).alias("slope_sql"),
        F.avg(F.col("value").cast("double")).alias("mean_sql"),
    )
    return fitted.join(sql_side, "user_id").select(
        "user_id",
        "n_events",
        (
            F.abs(
                F.col("value_slope_per_hour") - F.coalesce(F.col("slope_sql"), F.lit(0.0))
            )
            <= 1e-6
        ).alias("slope_matches_sql"),
        (F.abs(F.col("value_mean") - F.col("mean_sql")) <= 1e-6).alias(
            "mean_matches_sql"
        ),
    )
