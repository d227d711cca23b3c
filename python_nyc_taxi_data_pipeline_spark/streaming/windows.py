"""Event-time windowed aggregation over the ``events`` fixture.

The reference's incremental machinery is a batch high-water-mark loop
(SURVEY §2.9) — no true streams. These queries extend the engine with
the standard event-time window family (tumbling / sliding / session),
expressed with the same ``F.window``/``F.session_window`` operators that
Structured Streaming uses, so the identical plan runs over
``readStream`` (see ``streaming.jobs``).

Scale: windowed aggregation is a single shuffle on (window, key);
partial aggregation applies map-side. Session windows shuffle on the
grouping key then merge sorted runs per key — no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.scalars import decimal_sum
from ..registry import register


@register(
    "window_tumbling_1h",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "streaming"),
)
def window_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "window_sliding_1h_30m",
    oracle="""
    SELECT make_timestamp(((CAST(floor(epoch(ts) / 1800) AS BIGINT) - i) * 1800) * 1000000)
             AS window_start,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events, (SELECT unnest([0, 1]) AS i) offsets
    GROUP BY 1
    """,
    tags=("window", "streaming"),
)
def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide — each event lands
    in exactly two windows (epoch-aligned, matching Spark's default
    startTime=0). The oracle replays the window assignment arithmetic."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", "total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "window_session_30m",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
      ) AS sess_id
      FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
    tags=("window", "streaming", "session"),
)
def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user. Spark semantics:
    events merge while the next event starts strictly before
    previous_ts + gap; window end = last_ts + gap. The oracle replays
    this with the gaps-and-islands pattern."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", "total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
