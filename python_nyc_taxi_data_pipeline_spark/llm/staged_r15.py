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
- ``part_type_brand_hhi``: Herfindahl–Hirschman market concentration
  per part-type market (brand revenue shares, HHI = Σ share², top
  share) — the market-structure statistic; swap part→source for the
  data-mixture source-concentration check.
- ``orders_backlog_timeseries``: open-order backlog per day (the
  +1/−1 event-difference array over [order date, last ship + 1)),
  rolled up monthly with peak and end-of-month levels — the WIP
  curve, with the global cumulative computed on the two-level
  prefix-sum scaffold (no global-order window).
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

R15_BATCH: tuple[str, ...] = (
    "events_burstiness_fano",
    "orders_backlog_timeseries",
    "part_type_brand_hhi",
)


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


# --------------------------------------------------------------------
# Herfindahl–Hirschman concentration per part type (market structure)
# --------------------------------------------------------------------


def _hhi_oracle() -> str:
    return """
    WITH rev AS (
      SELECT p.p_type, p.p_brand,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS w_e4
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT p_type, CAST(sum(w_e4) AS BIGINT) AS t_e4,
             CAST(count(*) AS BIGINT) AS n_brands
      FROM rev GROUP BY 1
    ), shares AS (
      SELECT r.p_type, t.n_brands, t.t_e4,
             CAST((r.w_e4 // 10000) * 1000000
                  // greatest(t.t_e4 // 10000, 1) AS BIGINT) AS share_micro
      FROM rev r JOIN tot t USING (p_type)
    )
    SELECT p_type,
           CAST(max(n_brands) AS BIGINT) AS n_brands,
           CAST(max(t_e4) AS BIGINT) AS revenue_e4,
           CAST(max(share_micro) AS BIGINT) AS top_share_micro,
           CAST(sum(share_micro * share_micro) // 1000000 AS BIGINT)
             AS hhi_micro
    FROM shares GROUP BY p_type
    """


@stage(
    "part_type_brand_hhi",
    oracle=_hhi_oracle(),
    tags=("tpch", "analytics", "report"),
)
def part_type_brand_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per part-type market:
    brand revenue shares in micro units, HHI = Σ share² (re-scaled to
    micro — 1e6 = monopoly, 1e6/n = perfectly even over n brands),
    plus the top brand's share. The market-structure statistic
    antitrust analysis and category-management dashboards both read;
    on the corpus side the same index is the SOURCE-concentration
    check a data-mixture review runs (one dominant source = a
    concentration risk — swap part→source to reuse the plan).

    Exactness: the proven DECIMAL(18,4)→e4-BIGINT revenue
    convention; the share ratio integer-DIV-scales BOTH operands to
    whole currency units first (identical positive-value truncation
    in both engines — the reciprocity-contract overflow rule, which
    the 4× stress sweep enforced here too) so the ×1e6 product stays
    inside int64 out to ~9e12 per-market revenue; share ≤ 1e6 →
    share² ≤ 1e12, summed over ≤ |brands|. Quantize-then-square on
    BOTH engines, so each share rounds before the square
    identically.

    Scale (100 TB): one lineitem scan joined to the broadcast part
    dim, hash-aggregated to the (type, brand) domain (≤ 150·25 rows
    at any SF — part types and brands are fixed vocabularies);
    everything after is metadata arithmetic."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    rev = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_type", "p_brand")
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (F.lit(1) - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("w_e4")
        )
    )
    tot = rev.groupBy("p_type").agg(
        F.sum("w_e4").cast("bigint").alias("t_e4"),
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
    )
    shares = rev.join(tot, "p_type").select(
        "p_type",
        "n_brands",
        "t_e4",
        F.expr(
            "(w_e4 DIV 10000) * 1000000"
            " DIV greatest(t_e4 DIV 10000, 1)"
        )
        .cast("bigint")
        .alias("share_micro"),
    )
    return shares.groupBy("p_type").agg(
        F.max("n_brands").cast("bigint").alias("n_brands"),
        F.max("t_e4").cast("bigint").alias("revenue_e4"),
        F.max("share_micro").cast("bigint").alias("top_share_micro"),
        F.expr("CAST(sum(share_micro * share_micro) DIV 1000000 AS BIGINT)")
        .alias("hhi_micro"),
    )


# --------------------------------------------------------------------
# Order-backlog time series (open-interval counting, two-level prefix)
# --------------------------------------------------------------------

BKL_BAND_DAYS = 32  # prefix-sum bands over the day spine


def _backlog_oracle() -> str:
    return """
    WITH spans AS (
      SELECT o.o_orderkey,
             date_diff('day', DATE '1970-01-01',
                       CAST(o.o_orderdate AS DATE)) AS open_day,
             date_diff('day', DATE '1970-01-01',
                       CAST(max(l.l_shipdate) AS DATE)) + 1 AS close_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ), bounds AS (
      SELECT min(open_day) AS d0, max(close_day) AS d1 FROM spans
    ), deltas AS (
      SELECT day, CAST(sum(d) AS BIGINT) AS delta,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS opened,
             CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS closed
      FROM (
        SELECT open_day AS day, 1 AS d FROM spans
        UNION ALL
        SELECT close_day AS day, -1 AS d FROM spans
      ) GROUP BY day
    ), spine AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds))) AS day
    ), daily AS (
      SELECT s.day,
             COALESCE(d.delta, 0) AS delta,
             COALESCE(d.opened, 0) AS opened,
             COALESCE(d.closed, 0) AS closed
      FROM spine s LEFT JOIN deltas d ON d.day = s.day
    ), cum AS (
      SELECT day, opened, closed,
             CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) AS backlog
      FROM daily
    )
    SELECT CAST(date_trunc('month', DATE '1970-01-01'
                 + to_days(CAST(day AS INT))) AS DATE) AS month_start,
           CAST(sum(opened) AS BIGINT) AS opened,
           CAST(sum(closed) AS BIGINT) AS closed,
           CAST(max(backlog) AS BIGINT) AS peak_backlog,
           CAST(arg_max(backlog, day) AS BIGINT) AS end_backlog
    FROM cum GROUP BY 1
    """


@stage(
    "orders_backlog_timeseries",
    oracle=_backlog_oracle(),
    tags=("warehouse", "timeseries", "report"),
)
def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order BACKLOG over time — the interval-counting staple
    (how many orders are open each day, where an order is open from
    its order date until the day after its LAST line ships), rolled
    up monthly: orders opened, orders closed, peak backlog, and
    end-of-month backlog. This is the WIP/inventory curve every
    operations dashboard draws, and the computation is the classic
    +1/−1 event-difference array: deltas per day, then a cumulative
    sum over the day spine.

    The cumulative is the banned global-order window — so it runs on
    the TWO-LEVEL PREFIX SUM scaffold the rank-AUC query established
    (bands of {BKL_BAND_DAYS} days: intra-band partitioned window +
    broadcast band offsets); DuckDB's oracle uses its plain
    single-node cumulative window, so the hash again pins the
    decomposition's exactness. End-of-month = max_by(backlog, day)
    (the spine is dense, so the month's last day is always present).

    Exactness: integer day indexing from the epoch anchor (DATE
    arithmetic, identical in both engines); counts and sums only.

    Scale (100 TB): one orders⋈lineitem aggregate to per-order spans
    (the join is orderkey-co-partitioned), one hash aggregate to the
    DAY domain (calendar-bounded — a century is 36.5k rows), and all
    prefix machinery runs on that day-domain frame. No global
    window, no collect."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .alias("open_day"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "open_day")
        .agg(
            (
                F.datediff(
                    F.max("l_shipdate").cast("date"), F.lit("1970-01-01")
                )
                + 1
            ).alias("close_day")
        )
    )
    opens = spans.select(F.col("open_day").alias("day"), F.lit(1).alias("d"))
    closes = spans.select(
        F.col("close_day").alias("day"), F.lit(-1).alias("d")
    )
    deltas = (
        opens.unionByName(closes)
        .groupBy("day")
        .agg(
            F.sum("d").cast("bigint").alias("delta"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("opened"),
            F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("closed"),
        )
    )
    bounds = spans.agg(
        F.min("open_day").alias("d0"), F.max("close_day").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    daily = (
        spine.join(deltas, "day", "left")
        .select(
            "day",
            F.coalesce("delta", F.lit(0)).alias("delta"),
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("closed", F.lit(0)).alias("closed"),
        )
        .withColumn("band", F.expr(f"day DIV {BKL_BAND_DAYS}"))
    )
    from pyspark.sql import Window

    intra = daily.withColumn(
        "in_band_cum",
        F.sum("delta").over(
            Window.partitionBy("band")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    band_tot = daily.groupBy("band").agg(F.sum("delta").alias("bd"))
    lower = band_tot.select(
        F.col("band").alias("l_band"), F.col("bd").alias("l_bd")
    )
    offsets = (
        band_tot.join(
            F.broadcast(lower), F.col("l_band") < F.col("band"), "left"
        )
        .groupBy("band")
        .agg(F.coalesce(F.sum("l_bd"), F.lit(0)).alias("offset"))
    )
    cum = intra.join(offsets, "band").withColumn(
        "backlog",
        (F.col("offset") + F.col("in_band_cum")).cast("bigint"),
    )
    month = F.trunc(
        F.expr("date_add(DATE '1970-01-01', CAST(day AS INT))"), "month"
    )
    return (
        cum.groupBy(month.alias("month_start"))
        .agg(
            F.sum("opened").cast("bigint").alias("opened"),
            F.sum("closed").cast("bigint").alias("closed"),
            F.max("backlog").cast("bigint").alias("peak_backlog"),
            F.expr("max_by(backlog, day)").cast("bigint").alias(
                "end_backlog"
            ),
        )
    )
