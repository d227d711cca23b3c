"""Skew-mitigation patterns with provably transparent semantics.

A 100 TB corpus is never uniform: a handful of hot keys (one dominant
``event_type``, one boilerplate ``source``) can put most of a shuffle
into one reducer task. AQE's skew-join splitting handles the JOIN case
at runtime (``session.py`` enables it); this module ships the
AGGREGATION-side pattern — salted two-stage aggregation — as a
registered query whose oracle is the PLAIN single-stage SQL, proving
the rewrite changes the plan, not the answer.

Reference: the reference engine aggregates in PostgreSQL where a single
node owns every group (`src/sql/gold_aggregate_layer.sql`); on Spark
the same GROUP BY over a low-cardinality hot key concentrates into
max-#groups reducer tasks unless salted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.scalars import MONEY_DECIMAL
from ..registry import register

SALT_BUCKETS = 32  # one hot key fans out to this many reducer tasks


@register(
    "events_type_value_salted",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew", "salting"),
)
def events_type_value_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY over a low-cardinality key, salted: stage 1 aggregates
    per (event_type, salt) — ``SALT_BUCKETS`` reducer tasks per hot key
    instead of one — stage 2 merges the per-salt partials (metadata-
    sized: #types × #buckets rows). COUNT and decimal SUM merge by
    summing; COUNT(DISTINCT user_id) merges exactly by salting ON THE
    DISTINCT COLUMN (same user never lands in two buckets, so partial
    distinct counts are disjoint and sum exactly).

    The oracle is the plain one-stage SQL — bit-identical results (the
    decimal accumulation is order-free), so the driver hash proves the
    salted rewrite is semantically transparent.
    """
    e = load(spark, sf_dir, "events")
    salted = e.withColumn(
        "salt", F.pmod(F.xxhash64("user_id"), F.lit(SALT_BUCKETS))
    )
    stage1 = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast(MONEY_DECIMAL)).alias("pv"),
        F.count_distinct("user_id").alias("pu"),
    )
    return (
        stage1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
            F.sum("pu").alias("n_users"),
        )
    )
