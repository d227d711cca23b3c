"""Round-15 registration candidates — seed slate started in round 8.

Same staging mechanism as ``staged_r8``–``staged_r14``; promotion in
round 15 via ``staged_r15.promote_to_registry(R15_BATCH)``.

The seed:

- ``events_burstiness_fano``: the Fano factor (variance-to-mean
  ratio of per-hour event counts) per event type — the burstiness
  statistic that separates Poisson-like arrivals (F ≈ 1) from bursty
  (F > 1) or regular (F < 1) traffic, computed from EXACT integer
  moments (n·Σx² − (Σx)² over a common denominator) on the complete
  hour spine including empty hours. The registered inter-arrival
  entropy reads burstiness from gap digits; Fano reads it from
  count dispersion — the two standard, complementary burstiness
  lenses.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import QueryFn


@dataclass(frozen=True)
class StagedQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()


STAGED: dict[str, StagedQuery] = {}

R15_BATCH: tuple[str, ...] = ("events_burstiness_fano",)


def promote_to_registry(names: list[str]) -> list[str]:
    """Round-15 registration in one call; ``names`` is REQUIRED —
    whole-slate promotion must be spelled out (``list(STAGED)``)."""
    from ..registry import register

    if names is None:
        raise ValueError(
            "promote_to_registry requires an explicit name batch; "
            "spell out whole-slate promotion as list(STAGED)"
        )
    promoted = []
    for name in names:
        q = STAGED[name]
        register(name, q.oracle, q.tags)(q.fn)
        promoted.append(name)
    return promoted


def stage(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Mirror of ``registry.register`` that records into ``STAGED``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED:
            raise ValueError(f"duplicate staged query name {name!r}")
        STAGED[name] = StagedQuery(name, fn, oracle, tags)
        return fn

    return deco


# --------------------------------------------------------------------
# Fano-factor burstiness per event type (exact integer moments)
# --------------------------------------------------------------------


def _fano_oracle() -> str:
    return """
    WITH e AS (
      SELECT event_type,
             date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts)
               AS hour_idx
      FROM events
    ), span AS (
      SELECT min(hour_idx) AS h0, max(hour_idx) AS h1 FROM e
    ), spine AS (
      SELECT t.event_type, h.h AS hour_idx
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (
        SELECT unnest(generate_series(
          (SELECT h0 FROM span), (SELECT h1 FROM span))) AS h
      ) h
    ), counts AS (
      SELECT s.event_type, s.hour_idx,
             CAST(count(e.event_type) AS BIGINT) AS x
      FROM spine s
      LEFT JOIN e ON e.event_type = s.event_type
                 AND e.hour_idx = s.hour_idx
      GROUP BY 1, 2
    ), moments AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM counts GROUP BY 1
    )
    SELECT event_type, n_hours, s1 AS n_events,
           CAST(s1 * 1000000 // n_hours AS BIGINT) AS mean_micro,
           CAST((n_hours * s2 - s1 * s1) * 1000000
                // (n_hours * greatest(s1, 1)) AS BIGINT) AS fano_micro
    FROM moments
    """


@stage(
    "events_burstiness_fano",
    oracle=_fano_oracle(),
    tags=("events", "analytics", "timeseries"),
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness per event type: the variance-to-mean
    ratio of per-hour counts over the COMPLETE hour spine (empty
    hours count as zeros — dropping them silently deflates the
    variance, the classic dispersion-statistic bug this contract
    pins). F ≈ 1e6 (micro) is Poisson-like arrival; F > 1e6 is
    bursty; F < 1e6 is more regular than Poisson — the dispersion
    lens on burstiness, complementary to the registered
    inter-arrival-entropy digit lens.

    Exactness: population variance over the common denominator —
    Var·n² = n·Σx² − (Σx)², so fano = Var/mean =
    (n·Σx² − (Σx)²)·1e6 DIV (n·Σx) — pure BIGINT cross-mult with
    the greatest(,1) zero guard; hour indexing from the naive epoch
    anchor (whole hours, both engines identical).

    Scale (100 TB): one scan to a (type, hour) hash aggregate; the
    spine is |types|·|hours| calendar metadata (cross-joined from
    broadcast one-row span bounds); moments are map-side-combinable
    integer sums. No windows, no collect."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "timestampdiff(HOUR,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("hour_idx"),
    )
    span = e.agg(
        F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1")
    )
    types = e.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias(
                "hour_idx"
            ),
        )
    )
    per_hour = e.groupBy("event_type", "hour_idx").agg(
        F.count(F.lit(1)).alias("x")
    )
    counts = (
        spine.join(per_hour, ["event_type", "hour_idx"], "left")
        .withColumn("x", F.coalesce("x", F.lit(0)))
    )
    moments = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    return moments.select(
        "event_type",
        "n_hours",
        F.col("s1").alias("n_events"),
        F.expr("s1 * 1000000 DIV n_hours").cast("bigint").alias(
            "mean_micro"
        ),
        F.expr(
            "(n_hours * s2 - s1 * s1) * 1000000"
            " DIV (n_hours * greatest(s1, 1))"
        )
        .cast("bigint")
        .alias("fano_micro"),
    )
