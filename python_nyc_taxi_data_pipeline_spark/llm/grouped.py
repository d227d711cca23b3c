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


@register("events_user_trend", oracle=None, tags=("udf", "grouped"))
def events_user_trend(spark, sf_dir: str) -> DataFrame:
    """Grouped-map UDF surface (rows-only driver check; the unit test
    verifies slopes against a closed-form SQL regression)."""
    return user_value_trend(load(spark, sf_dir, "events"))
