"""Round-17 registration candidates — seed slate started in round 10.

Same staging mechanism as ``staged_r8``–``staged_r16``; promotion in
round 17 via ``staged_r17.promote_to_registry(R17_BATCH)``.

The seed (operator families the engine does not cover yet):

- ``events_concurrent_user_pairs``: INTERVAL-OVERLAP SELF-JOIN (the
  range-join family — the engine has as-of joins but no interval
  joins): pairs of users whose sessions overlap in time, found by
  hour-band blocking + an overlap theta inside each band, with each
  overlapping pair attributed to exactly the band where the overlap
  STARTS (the classic dedup-free interval-join trick — no distinct
  pass). The oracle takes the opposite road (direct pair join over
  the span list, no banding), so the hash pins the band decomposition
  against the naive algebra.
- ``orders_daily_autocorr``: temporal AUTOCORRELATION of the daily
  order-count series at lags 1/7/28 — the periodicity/drift detector
  the seasonality profile cannot express (it averages by weekday; the
  autocorrelation measures how predictive the past actually is).
  Zero-filled day spine; numerator/denominator accumulated as EXACT
  integers via n-scaled residuals (n·c_t − S), only the final ratio a
  rounded double (the cosine pattern).
- ``docs_image_ahash_neardup``: IMAGE near-duplicate detection — the
  multimodal member the dedup family lacks (text has MinHash/SimHash/
  semantic; images had nothing): deterministic per-template PPM
  rasters with per-doc single-byte perturbations run through the REAL
  decode→resize pipeline (``multimodal.resize_images``), then an
  average-hash (4×4 grayscale, mean threshold, 16-bit signature) and
  a signature-bucket report. The oracle replays the full chain —
  nearest-neighbor resample arithmetic, integer grayscale, mean
  threshold, bit packing — in pure SQL, so the driver hash verifies
  the perceptual-hash GEOMETRY end to end.
- ``events_error_context_window``: the windowed-count RANGE join
  (stream-stream-join shape in batch) — per error event, the count /
  error-share / recency-gap of same-user events in the 5 minutes
  strictly before it, via the two-band probe decomposition (an
  equi-join on (user, band) + residual range filter); the oracle
  correlates with the raw range predicate.
- ``lineitem_business_day_latency``: ship latency in BUSINESS days
  per order priority — the closed-form weekday count W(d) =
  5·(d DIV 7) + cum[d mod 7] (epoch-anchored) turns business-days-
  between into two O(1) integer evaluations; no calendar table, no
  UDF.
- ``docs_length_bootstrap_ci``: deterministic POISSON BOOTSTRAP of
  the mean document length (the resampling family): per-(doc, rep)
  Poisson(1) weights from md5-derived uniforms via repr()-exact
  inverse-CDF literals — identical integer weights on both engines,
  pure map-side, no shared state.
- ``docs_char_entropy_quality``: character-entropy compression proxy
  per source (low entropy = boilerplate/padding/keyword stuffing) —
  per-term micro rounding before the sum (the interarrival-entropy
  order-free convention).
- ``customer_churn_training_frame``: point-in-time LEAKAGE-SAFE
  feature/label extraction — pre-cutoff features, post-cutoff churn
  label, one conditional-aggregation pass.
- ``lineitem_approx_percentile_contract``: AQP accuracy contract for
  ``percentile_approx`` (Greenwald–Khanna) — a second exact pass
  verifies every approximate answer's true rank sits inside the
  guaranteed q·n ± n/accuracy band, booleans the oracle pins TRUE.
- ``orders_dow_adjusted_anomalies``: weekday-baseline residuals with
  a 5×MAD robust threshold — the seasonally-adjusted anomaly list
  (integer micro end to end; MAD is an exact dyadic median).
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

R17_BATCH: tuple[str, ...] = (
    "customer_churn_training_frame",
    "docs_char_entropy_quality",
    "docs_image_ahash_neardup",
    "docs_length_bootstrap_ci",
    "events_concurrent_user_pairs",
    "events_error_context_window",
    "lineitem_approx_percentile_contract",
    "lineitem_business_day_latency",
    "orders_daily_autocorr",
    "orders_dow_adjusted_anomalies",
)


def promote_to_registry(names: list[str]) -> list[str]:
    """Round-17 registration in one call; ``names`` is REQUIRED —
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
# Concurrent-user pairs (banded interval-overlap self-join)
# --------------------------------------------------------------------

CUP_GAP_S = 1800  # the registered 30-minute session gap
CUP_BAND_US = 3_600_000_000  # 1-hour blocking bands


def _concurrent_pairs_oracle() -> str:
    """The NAIVE algebra: sessionize, then join the span list to
    itself directly on the overlap predicate — no banding, no
    start-band attribution. DuckDB handles the quadratic form fine at
    oracle scale; matching hashes prove the engine's banded
    decomposition loses and invents nothing."""
    return f"""
    WITH e AS (
      SELECT user_id, event_id,
             date_diff('microsecond',
                       TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
      FROM events
    ), marked AS (
      SELECT user_id, ts_us, event_id,
             CASE WHEN ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  > {CUP_GAP_S} * 1000000 OR lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM e
    ), sess AS (
      SELECT user_id, ts_us,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sess_id
      FROM marked
    ), spans AS (
      SELECT user_id, sess_id,
             min(ts_us) AS t0, max(ts_us) + 1 AS t1
      FROM sess GROUP BY 1, 2
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(least(a.t1, b.t1) - greatest(a.t0, b.t0))
                AS BIGINT) AS overlap_us
    FROM spans a
    JOIN spans b
      ON a.user_id < b.user_id AND a.t0 < b.t1 AND b.t0 < a.t1
    GROUP BY 1, 2
    """


@stage(
    "events_concurrent_user_pairs",
    oracle=_concurrent_pairs_oracle(),
    tags=("events", "join", "interval", "sessions"),
)
def events_concurrent_user_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONCURRENT-USER pairs — the INTERVAL-OVERLAP self-join: for
    every pair of users with overlapping sessions, how many session
    overlaps and how much total concurrent time. The co-presence
    signal (shared-account detection, fraud rings, social proximity)
    that needs a RANGE join, which Spark does not natively optimize —
    expressed here as the standard scalable decomposition:

    - sessions → [t0, t1) spans (the shared keyed sessionization);
    - each span explodes to the 1-hour BANDS it touches, making the
      pair join an EQUI-join on band (distributes; per-band work is
      bounded by the hour's concurrency, the physically meaningful
      skew measure);
    - a pair overlapping several bands is counted ONCE: only the band
      containing the overlap START keeps it (greatest(t0a, t0b) DIV
      band == band) — the attribution trick that removes the global
      DISTINCT a naive banded join needs;
    - per-pair aggregate: overlap count + total overlapped µs.

    The oracle joins the span list to itself directly (no banding) —
    a genuinely different join algebra, so the hash match proves the
    band decomposition exact, not just self-consistent.

    Exactness: integer µs; half-open spans make `a.t0 < b.t1 AND
    b.t0 < a.t1` the exact overlap predicate (touching endpoints are
    NOT overlap).

    Scale (100 TB): band fan-out ≈ 1 for minutes-long sessions; the
    band hash-join shuffles spans once; within-band pair work is
    O(concurrency²) per hour — the intrinsic output-complexity of the
    query, paid only where users actually co-occur. No global
    windows, no distinct over pairs."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_us").over(w_order).isNull()
            | (
                F.col("ts_us") - F.lag("ts_us").over(w_order)
                > CUP_GAP_S * 1000000
            ),
            1,
        ).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(w_cum))
    spans = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts_us").alias("t0"),
        (F.max("ts_us") + 1).alias("t1"),
    )
    banded = spans.select(
        "user_id",
        "t0",
        "t1",
        F.explode(
            F.expr(
                f"sequence(t0 DIV {CUP_BAND_US}, (t1 - 1) DIV {CUP_BAND_US})"
            )
        ).alias("band"),
    ).localCheckpoint(eager=True)
    a = banded.select(
        "band",
        F.col("user_id").alias("user_a"),
        F.col("t0").alias("a_t0"),
        F.col("t1").alias("a_t1"),
    )
    b = banded.select(
        "band",
        F.col("user_id").alias("user_b"),
        F.col("t0").alias("b_t0"),
        F.col("t1").alias("b_t1"),
    )
    pairs = (
        a.join(b, "band")
        .filter(F.col("user_a") < F.col("user_b"))
        .filter(
            (F.col("a_t0") < F.col("b_t1")) & (F.col("b_t0") < F.col("a_t1"))
        )
        # start-band attribution: exactly one band keeps each pair
        .filter(
            F.expr(
                f"greatest(a_t0, b_t0) DIV {CUP_BAND_US}"
            )
            == F.col("band")
        )
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
        F.sum(
            F.least(F.col("a_t1"), F.col("b_t1"))
            - F.greatest(F.col("a_t0"), F.col("b_t0"))
        )
        .cast("bigint")
        .alias("overlap_us"),
    )


# --------------------------------------------------------------------
# Daily order-count autocorrelation (periodicity / drift detector)
# --------------------------------------------------------------------

DAC_LAGS = (1, 7, 28)


def _autocorr_oracle() -> str:
    lags = ", ".join(str(k) for k in DAC_LAGS)
    return f"""
    WITH o AS (
      SELECT date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS day
      FROM orders
    ), counts AS (
      SELECT day, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1
    ), lim AS (
      SELECT min(day) AS d0, max(day) AS d1 FROM o
    ), grid AS (
      SELECT unnest(generate_series((SELECT d0 FROM lim),
                                    (SELECT d1 FROM lim))) AS day
    ), spine AS (
      SELECT g.day, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
      FROM grid g LEFT JOIN counts c ON c.day = g.day
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
      FROM spine
    ), resid AS (
      SELECT day, st.n * c - st.s AS r
      FROM spine, stats st
    ), den AS (
      SELECT CAST(sum(r * r) AS BIGINT) AS den FROM resid
    ), lags AS (
      SELECT unnest([{lags}]) AS lag
    ), num AS (
      SELECT l.lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.r * b.r) AS BIGINT) AS num
      FROM lags l
      JOIN resid a ON TRUE
      JOIN resid b ON b.day = a.day + l.lag
      GROUP BY 1
    )
    SELECT n.lag AS lag_days, n.n_pairs, n.num AS num_scaled,
           d.den AS den_scaled,
           round(CAST(n.num AS DOUBLE) / d.den, 6) AS autocorr
    FROM num n, den d
    """


@stage(
    "orders_daily_autocorr",
    oracle=_autocorr_oracle(),
    tags=("warehouse", "analytics", "timeseries"),
)
def orders_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION of the daily order-count series at lags
    {DAC_LAGS} — the periodicity detector: lag-7 pins the weekly
    cycle, lag-1 the day-to-day momentum, lag-28 the monthly echo.
    The drift/seasonality monitor reads this BEFORE trusting a
    day-over-day alert threshold (a series with lag-7 ≈ 0.6 needs
    weekday-conditioned baselines; the registered seasonality profile
    gives those baselines, this query proves they're needed).

    Exactness: the day spine is zero-filled (missing days are real
    zeros, not gaps); residuals are n-SCALED integers (n·c_t − S,
    avoiding the rational mean entirely), so numerator and
    denominator are EXACT BIGINT sums; only the final ratio is a
    double, rounded at 6 dp — the margin-mining cosine pattern.
    Envelope: |n·c − S| ≤ n·max(c) keeps every product under int64
    while n_days·max(c)² ≲ 9e18 — daily counts up to ~10⁶ on a
    10-year spine; beyond that, pre-scale counts (c DIV 10³) or
    aggregate weekly before this query.

    Scale (100 TB): one scan to per-day counts (map-side combine;
    days are metadata-scale), a generated spine broadcast-joined, and
    the lag joins run on the ≤10⁴-row spine — everything after the
    first aggregate is metadata-sized."""
    o = load(spark, sf_dir, "orders").select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01")
        ).alias("day")
    )
    counts = o.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lim = o.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (
        lim.select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
        .join(F.broadcast(counts), "day", "left")
        .select("day", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    stats = spine.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    resid = (
        spine.crossJoin(F.broadcast(stats))
        .select("day", (F.col("n") * F.col("c") - F.col("s")).alias("r"))
        .localCheckpoint(eager=True)
    )
    den = resid.agg(F.sum(F.col("r") * F.col("r")).cast("bigint").alias("den"))
    lags = spark.createDataFrame([(k,) for k in DAC_LAGS], "lag bigint")
    a = resid.select(F.col("day").alias("a_day"), F.col("r").alias("a_r"))
    b = resid.select(F.col("day").alias("b_day"), F.col("r").alias("b_r"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("b_day", F.col("a_day") + F.col("lag"))
        .join(F.broadcast(b), "b_day")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("a_r") * F.col("b_r")).cast("bigint").alias("num"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").alias("lag_days"),
        "n_pairs",
        F.col("num").alias("num_scaled"),
        F.col("den").alias("den_scaled"),
        F.round(F.col("num").cast("double") / F.col("den"), 6).alias(
            "autocorr"
        ),
    )


orders_daily_autocorr.__doc__ = orders_daily_autocorr.__doc__.replace(
    "{DAC_LAGS}", str(DAC_LAGS)
)


# --------------------------------------------------------------------
# Image average-hash near-dup (the multimodal dedup family member)
# --------------------------------------------------------------------

AH_GROUPS = 24  # synthetic image templates (near-dup ground truth)
AH_TW = AH_TH = 4  # aHash grid (16-bit signature)


def _ahash_oracle() -> str:
    """Pure-SQL replay of synth → nearest-neighbor resize → grayscale
    → mean threshold → bit packing. Source raster byte i of doc d is
    (g·131 + i·7) % 256 with g = d % {AH_GROUPS}, except the single
    perturbed index p = d % (w·h·3) where (d DIV {AH_GROUPS}) % 7 is
    added mod 256 — the per-doc "scratch" that makes group members
    near-duplicates rather than copies."""
    G = AH_GROUPS
    return f"""
    WITH d AS (
      SELECT doc_id,
             doc_id % {G} AS g,
             6 + (doc_id % {G}) % 5 AS w,
             5 + (doc_id % {G}) % 4 AS h
      FROM documents
    ), px AS (
      SELECT d.doc_id, d.g,
             y.g AS oy, x.g AS ox, c.g AS ch,
             ((((y.g * d.h) // {AH_TH}) * d.w + ((x.g * d.w) // {AH_TW}))
              * 3 + c.g) AS src_i
      FROM d,
           generate_series(0, {AH_TH - 1}) AS y(g),
           generate_series(0, {AH_TW - 1}) AS x(g),
           generate_series(0, 2) AS c(g)
    ), v AS (
      SELECT doc_id, g, oy, ox,
             (g * 131 + src_i * 7
              + CASE WHEN src_i = doc_id % ((6 + g % 5) * (5 + g % 4) * 3)
                     THEN (doc_id // {G}) % 7 ELSE 0 END) % 256 AS val
      FROM px
    ), gray AS (
      SELECT doc_id, g, oy, ox,
             CAST(sum(val) AS BIGINT) // 3 AS gv
      FROM v GROUP BY 1, 2, 3, 4
    ), mean16 AS (
      SELECT doc_id, g,
             CAST(sum(gv) AS BIGINT) // {AH_TW * AH_TH} AS mu
      FROM gray GROUP BY 1, 2
    ), sig AS (
      SELECT gr.doc_id, gr.g,
             CAST(sum(CASE WHEN gr.gv > m.mu
                      THEN 1 << (gr.oy * {AH_TW} + gr.ox)
                      ELSE 0 END) AS BIGINT) AS ahash
      FROM gray gr JOIN mean16 m ON m.doc_id = gr.doc_id
      GROUP BY 1, 2
    )
    SELECT ahash,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(count(DISTINCT g) AS BIGINT) AS n_templates,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_dup_pairs
    FROM sig GROUP BY 1
    """


@stage(
    "docs_image_ahash_neardup",
    oracle=_ahash_oracle(),
    tags=("llm", "multimodal", "dedup", "image", "udf"),
)
def docs_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-duplicate detection by AVERAGE HASH — the multimodal
    member of the dedup family (text near-dup: MinHash/SimHash/
    semantic; images previously had none): each document synthesizes a
    deterministic PPM raster from a TEMPLATE id (doc_id % {G}) plus a
    single perturbed byte (the near-dup ground truth: same template =
    visually identical up to one scratch), the payload runs the REAL
    multimodal pipeline — PNM encode → ``resize_images`` (decode +
    numpy nearest-neighbor + re-encode) at the {tw}×{th} hash grid —
    and the Arrow worker computes the classic aHash: integer grayscale
    (r+g+b)÷3 per cell, cell mean ÷{cells}, bit = gray > mean, 16-bit
    packed signature. Images sharing a signature bucket are the
    near-dup candidates; the report is per-bucket (count, templates
    folded, min doc = survivor, candidate-pair mass).

    The DuckDB oracle replays the WHOLE chain in SQL (resample index
    arithmetic, grayscale, threshold, bit packing), so the driver hash
    pins the perceptual-hash geometry — a wrong stride, a half-pixel
    shift, or a biased threshold all flip buckets.

    Exactness: integers end to end (÷ are truncating integer divs on
    identical non-negative operands).

    Scale (100 TB): synth/decode/resize/hash are pure Arrow map stages
    (no shuffle, worker memory bounded by batch size); ONE hash
    aggregate on the 16-bit signature (≤65536 groups, never skewed
    worse than the true duplicate distribution). Real corpora swap the
    synth stage for payload bytes and (optionally) the 64-bit 8×8 grid
    — one constant, same plan."""
    import pandas as pd
    from pyspark.sql import types as T

    from .multimodal import _make_pnm_decoder, resize_images

    G = AH_GROUPS
    tw, th = AH_TW, AH_TH

    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                g = did % G
                w, h = 6 + g % 5, 5 + g % 4
                n = w * h * 3
                v = (g * 131 + np.arange(n, dtype=np.int64) * 7) % 256
                p = did % n
                v[p] = (v[p] + (did // G) % 7) % 256
                payloads.append(
                    b"P6"
                    + f"\n{w} {h}\n255\n".encode()
                    + v.astype(np.uint8).tobytes()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    sig_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("g", T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )
    decode = _make_pnm_decoder()

    def ahash(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            out = {"doc_id": [], "g": [], "ahash": []}
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                raster = np.frombuffer(
                    decode(bytes(p))["pixels"], dtype=np.uint8
                ).astype(np.int64)
                gray = raster.reshape(-1, 3).sum(axis=1) // 3
                mu = int(gray.sum()) // gray.size
                bits = gray > mu
                sig = int(
                    sum(1 << j for j, b in enumerate(bits) if b)
                )
                out["doc_id"].append(int(did))
                out["g"].append(int(did) % G)
                out["ahash"].append(sig)
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    imgs = d.mapInPandas(synth, synth_schema)
    resized = resize_images(imgs, width=tw, height=th)
    sigs = resized.select("doc_id", "payload").mapInPandas(ahash, sig_schema)
    return sigs.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.countDistinct("g").cast("bigint").alias("n_templates"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.expr(
            "CAST(count(1) * (count(1) - 1) DIV 2 AS BIGINT)"
        ).alias("n_dup_pairs"),
    )


docs_image_ahash_neardup.__doc__ = (
    docs_image_ahash_neardup.__doc__.replace("{G}", str(AH_GROUPS))
    .replace("{tw}", str(AH_TW))
    .replace("{th}", str(AH_TH))
    .replace("{cells}", str(AH_TW * AH_TH))
)


# --------------------------------------------------------------------
# Error context window (windowed-count range join over event streams)
# --------------------------------------------------------------------

ECW_WINDOW_US = 300_000_000  # the 5-minute pre-error context window


def _error_context_oracle() -> str:
    """Naive algebra: correlate each error directly against the same
    user's events with the raw range predicate — no banding. Matching
    hashes prove the engine's two-band probe decomposition exact."""
    return f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             date_diff('microsecond',
                       TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
      FROM events
    ), err AS (
      SELECT user_id, event_id AS error_id, ts_us AS err_ts
      FROM e WHERE event_type = 'error'
    ), ctx AS (
      SELECT r.error_id,
             CAST(count(*) AS BIGINT) AS n_prior,
             CAST(sum(CASE WHEN c.event_type = 'error'
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_prior_errors,
             max(c.ts_us) AS last_ts
      FROM err r
      JOIN e c ON c.user_id = r.user_id
              AND c.ts_us >= r.err_ts - {ECW_WINDOW_US}
              AND c.ts_us < r.err_ts
      GROUP BY 1
    )
    SELECT r.error_id, r.user_id,
           CAST(COALESCE(c.n_prior, 0) AS BIGINT) AS n_prior,
           CAST(COALESCE(c.n_prior_errors, 0) AS BIGINT)
             AS n_prior_errors,
           CAST(COALESCE(r.err_ts - c.last_ts, -1) AS BIGINT)
             AS last_gap_us
    FROM err r LEFT JOIN ctx c ON c.error_id = r.error_id
    """


@stage(
    "events_error_context_window",
    oracle=_error_context_oracle(),
    tags=("events", "join", "interval", "window"),
)
def events_error_context_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PRE-ERROR CONTEXT — the windowed-count RANGE join (the
    stream-stream-join shape in batch): for every error event, how
    many same-user events landed in the 5 minutes strictly BEFORE it,
    how many of those were themselves errors (error bursts), and the
    gap to the most recent one (−1 when the window is empty — the
    cold-start error). The triage table an on-call reads: errors with
    dense click context are UX failures, errors preceded by errors
    are cascades, context-free errors are background noise.

    Decomposition: a 5-minute window can only reach back into the
    error's own time band or the one before it (band = ts DIV window),
    so each error probes exactly TWO (user, band) keys and the range
    join becomes an EQUI-join on (user_id, band) + a residual range
    filter — every context event lives in exactly one band, so no
    probe double-counts and no distinct pass is needed. The oracle
    correlates with the raw range predicate (no banding) — matching
    hashes prove the decomposition, not just self-consistency.

    Exactness: integer µs; strict `< err_ts` excludes the error
    itself and any same-microsecond tie on BOTH engines; the empty
    window is pinned to −1 (not NULL) on both.

    Scale (100 TB): the equi-join shuffles on (user_id, band) — skew
    bounded by a single user's 5-minute burst rate, the physically
    meaningful hot key; probes are 2 rows per error; output is one
    row per error. No global windows, no collect."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    err = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("err_ts"),
    )
    probes = err.select(
        "user_id",
        "error_id",
        "err_ts",
        F.explode(
            F.expr(
                f"array(err_ts DIV {ECW_WINDOW_US} - 1,"
                f" err_ts DIV {ECW_WINDOW_US})"
            )
        ).alias("band"),
    )
    ctx = e.select(
        "user_id",
        F.expr(f"ts_us DIV {ECW_WINDOW_US}").alias("band"),
        F.col("ts_us").alias("c_ts"),
        F.col("event_type").alias("c_type"),
    )
    hits = (
        probes.join(ctx, ["user_id", "band"])
        .filter(
            (F.col("c_ts") >= F.col("err_ts") - F.lit(ECW_WINDOW_US))
            & (F.col("c_ts") < F.col("err_ts"))
        )
        .groupBy("error_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_prior"),
            F.sum(F.when(F.col("c_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_prior_errors"),
            F.max("c_ts").alias("last_ts"),
        )
    )
    return err.join(hits, "error_id", "left").select(
        "error_id",
        "user_id",
        F.coalesce(F.col("n_prior"), F.lit(0))
        .cast("bigint")
        .alias("n_prior"),
        F.coalesce(F.col("n_prior_errors"), F.lit(0))
        .cast("bigint")
        .alias("n_prior_errors"),
        F.coalesce(F.col("err_ts") - F.col("last_ts"), F.lit(-1))
        .cast("bigint")
        .alias("last_gap_us"),
    )


# --------------------------------------------------------------------
# Business-day ship latency (calendar arithmetic, closed form)
# --------------------------------------------------------------------

# Weekdays among the first r days starting from the epoch (1970-01-01
# was a THURSDAY): dows run (Thu Fri Sat Sun Mon Tue Wed); the
# cumulative weekday count for r = 0..6 is below (full week adds 5).
BDL_CUM = (0, 1, 2, 2, 2, 3, 4)


def _busday_oracle() -> str:
    cum = ", ".join(str(c) for c in BDL_CUM)
    w = (
        f"(5 * (({{d}}) // 7) + ([{cum}])[(({{d}}) % 7) + 1])"
    )
    return f"""
    WITH j AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', DATE '1970-01-01',
                       CAST(o.o_orderdate AS DATE)) AS d0,
             date_diff('day', DATE '1970-01-01',
                       CAST(l.l_shipdate AS DATE)) AS d1
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), lat AS (
      SELECT priority,
             d1 - d0 AS cal_days,
             {w.format(d="d1 + 1")} - {w.format(d="d0 + 1")} AS bus_days
      FROM j
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(bus_days) AS BIGINT) AS sum_bus_days,
           CAST(sum(bus_days) * 1000000 // count(*) AS BIGINT)
             AS mean_bus_days_micro,
           CAST(sum(cal_days) * 1000000 // count(*) AS BIGINT)
             AS mean_cal_days_micro,
           CAST(max(bus_days) AS BIGINT) AS max_bus_days
    FROM lat GROUP BY 1
    """


@stage(
    "lineitem_business_day_latency",
    oracle=_busday_oracle(),
    tags=("warehouse", "analytics", "calendar"),
)
def lineitem_business_day_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ship latency in BUSINESS DAYS per order priority — the calendar
    arithmetic the SLA dashboards actually quote ("ships in 3 business
    days"): the closed-form weekday count W(d) = 5·(d DIV 7) +
    cum[(d mod 7)] (epoch-anchored — 1970-01-01 was a Thursday, so
    cum = {BDL_CUM}) turns business-days-between into two O(1) integer
    evaluations, B(d0, d1] = W(d1+1) − W(d0+1) — no calendar table, no
    UDF, no iteration; weekends are exact, holidays are a follow-up
    dimension table. Sits next to the registered calendar-day SLA
    (`orders_priority_sla`) — the referee proves the closed form
    against a literal datetime walk.

    Exactness: pure integer day arithmetic; means are integer-micro
    divisions (identical truncation on both engines). The count is
    SIGNED — a ship date before its order date yields a negative
    latency (W is monotone, so B(d0,d1] = −B(d1,d0]), which is the
    honest rendering of a data error the calendar-day SLA also
    surfaces; filter `bus_days < 0` upstream to quarantine them.

    Scale (100 TB): the co-partitioned lineitem⋈orders fact join (both
    shuffle on orderkey; AQE picks the strategy) + a 5-group hash
    aggregate with map-side combine. The latency math is whole-stage
    codegen — no UDF in the hot path."""
    cum_arr = ", ".join(str(c) for c in BDL_CUM)

    def w(d: str) -> str:
        return (
            f"(5 * (({d}) DIV 7)"
            f" + element_at(array({cum_arr}), CAST(({d}) % 7 AS INT) + 1))"
        )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01")
        ).alias("d1"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01")
        ).alias("d0"),
    )
    lat = li.join(o, "l_orderkey").select(
        "priority",
        (F.col("d1") - F.col("d0")).alias("cal_days"),
        F.expr(f"{w('d1 + 1')} - {w('d0 + 1')}").alias("bus_days"),
    )
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("bus_days").cast("bigint").alias("sum_bus_days"),
        F.expr(
            "CAST(sum(bus_days) * 1000000 DIV count(1) AS BIGINT)"
        ).alias("mean_bus_days_micro"),
        F.expr(
            "CAST(sum(cal_days) * 1000000 DIV count(1) AS BIGINT)"
        ).alias("mean_cal_days_micro"),
        F.max("bus_days").cast("bigint").alias("max_bus_days"),
    )


lineitem_business_day_latency.__doc__ = (
    lineitem_business_day_latency.__doc__.replace("{BDL_CUM}", str(BDL_CUM))
)


# --------------------------------------------------------------------
# Deterministic Poisson bootstrap (resampling-based uncertainty)
# --------------------------------------------------------------------

BOOT_REPS = 48  # bootstrap replicates
# Poisson(1) CDF, F(0)..F(6); u >= F(6) draws weight 7. The literals
# are repr()-exact IEEE doubles embedded identically in BOTH engines'
# SQL, so the inverse-CDF branch taken is identical bit-for-bit.
BOOT_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
)


def _boot_weight_case(u: str) -> str:
    """CASE cascade: the smallest k with u < F(k), else 7."""
    branches = " ".join(
        f"WHEN {u} < {f} THEN {k}" for k, f in enumerate(BOOT_CDF)
    )
    return f"(CASE {branches} ELSE 7 END)"


def _bootstrap_oracle() -> str:
    reps = ", ".join(str(r) for r in range(BOOT_REPS))
    u = (
        "(CAST(('0x' || substr(md5(doc_id::VARCHAR || ':' || rep::VARCHAR),"
        " 1, 15))::BIGINT % 4294967296 AS DOUBLE) / 4294967296.0)"
    )
    return f"""
    WITH reps AS (
      SELECT unnest([{reps}]) AS rep
    ), w AS (
      SELECT r.rep, d.n_chars,
             {_boot_weight_case(u)} AS k
      FROM documents d CROSS JOIN reps r
    )
    SELECT rep,
           CAST(sum(k) AS BIGINT) AS n_eff,
           CAST(sum(k * n_chars) AS BIGINT) AS sum_len,
           CAST(sum(k * n_chars) * 1000000
                // greatest(sum(k), 1) AS BIGINT) AS mean_len_micro
    FROM w GROUP BY 1
    """


@stage(
    "docs_length_bootstrap_ci",
    oracle=_bootstrap_oracle(),
    tags=("llm", "sampling", "statistics", "bootstrap"),
)
def docs_length_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC POISSON BOOTSTRAP of the mean document length —
    the resampling family (the engine had stratified/quota/hash
    sampling but no uncertainty quantification): {B} replicates, each
    document drawing a Poisson(1) replication weight from an md5-
    derived uniform (the distributed-bootstrap standard — Poisson
    weights need NO shared n, so the resample is a pure map; Chamandy
    et al., "Estimating uncertainty for massive data streams"). The
    spread of the {B} replicate means IS the sampling distribution of
    the corpus mean-length estimator — the error bar every corpus
    stat report should carry.

    Determinism/exactness: u = (md5(doc:rep) mod 2³²)/2³² with the
    repo's cross-engine hash convention; the inverse-CDF thresholds
    are repr()-exact double literals shared by both SQL texts, so
    every (doc, rep) draws the IDENTICAL integer weight on both
    engines; replicate sums are pure integers, means integer-micro.

    Scale (100 TB): the weight draw is map-side (hash + CASE — no
    shuffle, no shared state); the {B}-way fan-out feeds a {B}-group
    hash aggregate with map-side combine, so shuffle traffic is {B}
    rows per partition regardless of corpus size. Bootstrap compute
    is intrinsically {B}× one scan — bound B, not the corpus."""
    reps = spark.range(BOOT_REPS).select(F.col("id").cast("int").alias("rep"))
    u = (
        "(CAST(CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',"
        " CAST(rep AS STRING))), 1, 15), 16, 10) AS BIGINT) % 4294967296"
        " AS DOUBLE) / 4294967296.0)"
    )
    w = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .crossJoin(F.broadcast(reps))
        .withColumn("k", F.expr(_boot_weight_case(u)))
    )
    return w.groupBy("rep").agg(
        F.sum("k").cast("bigint").alias("n_eff"),
        F.sum(F.col("k") * F.col("n_chars")).cast("bigint").alias("sum_len"),
        F.expr(
            "CAST(sum(k * n_chars) * 1000000"
            " DIV greatest(sum(k), 1) AS BIGINT)"
        ).alias("mean_len_micro"),
    )


docs_length_bootstrap_ci.__doc__ = docs_length_bootstrap_ci.__doc__.replace(
    "{B}", str(BOOT_REPS)
)


# --------------------------------------------------------------------
# Character-entropy quality signal (compression proxy)
# --------------------------------------------------------------------

CEQ_LOW_MICRO = 2_000_000  # flag docs under 2.0 nats of char entropy


def _char_entropy_oracle() -> str:
    return f"""
    WITH pos AS (
      SELECT doc_id, source, length(text) AS n,
             unnest(generate_series(1, length(text))) AS i, text
      FROM documents
      WHERE length(text) > 0
    ), cc AS (
      SELECT doc_id, source, n, substr(text, i, 1) AS ch,
             CAST(count(*) AS BIGINT) AS c
      FROM pos GROUP BY 1, 2, 3, 4
    ), terms AS (
      SELECT cc.doc_id, cc.source,
             CAST(round(-(CAST(cc.c AS DOUBLE) / cc.n)
                        * ln(CAST(cc.c AS DOUBLE) / cc.n)
                        * 1000000.0, 0) AS BIGINT) AS t_micro
      FROM cc
    ), per_doc AS (
      SELECT doc_id, source,
             CAST(sum(t_micro) AS BIGINT) AS h_micro
      FROM terms GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(h_micro) // count(*) AS BIGINT) AS mean_h_micro,
           CAST(sum(CASE WHEN h_micro < {CEQ_LOW_MICRO} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_entropy,
           CAST(min(h_micro) AS BIGINT) AS min_h_micro
    FROM per_doc GROUP BY 1
    """


@stage(
    "docs_char_entropy_quality",
    oracle=_char_entropy_oracle(),
    tags=("llm", "quality", "entropy"),
)
def docs_char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-entropy quality signal — the compression proxy (a
    document that gzip would crush has low char entropy: repeated
    boilerplate, padding, SEO keyword stuffing), complementing the
    token-level Gopher battery: per document, Shannon entropy of the
    character distribution; per source, the mean, the minimum, and
    the count of low-entropy documents (< {thr} micro-nats).

    Exactness: the registered interarrival-entropy convention — every
    −p·ln(p) TERM rounds to integer micro-nats BEFORE the sum, so the
    per-doc entropy is an ORDER-FREE integer sum on both engines; all
    aggregates integer.

    Scale (100 TB): the char explode is the intrinsic cost (one row
    per character — the same granularity any tokenizer pass pays),
    immediately collapsed by a (doc, char) map-side combine into
    ≤|alphabet| rows per doc; everything after is metadata-sized.
    No UDF — `substring` + hash aggregates stay in codegen."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # The per-doc character total IS length(text) — carried through the
    # grouping keys, so the term computation needs NO join back (a
    # doc_id join here crossed the broadcast threshold under the 4x
    # stress inflation and read as fake super-linear shuffle growth).
    cc = (
        d.select(
            "doc_id",
            "source",
            F.length("text").alias("n"),
            F.explode(
                F.expr("transform(sequence(1, length(text)),"
                       " i -> substring(text, i, 1))")
            ).alias("ch"),
        )
        .groupBy("doc_id", "source", "n", "ch")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    per_doc = (
        cc.select(
            "doc_id",
            "source",
            F.expr(
                "CAST(round(-(CAST(c AS DOUBLE) / n)"
                " * ln(CAST(c AS DOUBLE) / n) * 1000000.0, 0) AS BIGINT)"
            ).alias("t_micro"),
        )
        .groupBy("doc_id", "source")
        .agg(F.sum("t_micro").cast("bigint").alias("h_micro"))
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("CAST(sum(h_micro) DIV count(1) AS BIGINT)").alias(
            "mean_h_micro"
        ),
        F.sum(
            F.when(F.col("h_micro") < CEQ_LOW_MICRO, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_low_entropy"),
        F.min("h_micro").cast("bigint").alias("min_h_micro"),
    )


docs_char_entropy_quality.__doc__ = docs_char_entropy_quality.__doc__.replace(
    "{thr}", str(CEQ_LOW_MICRO)
)


# --------------------------------------------------------------------
# Point-in-time churn training frame (leakage-safe label extraction)
# --------------------------------------------------------------------

CHN_CUTOFF = "2000-01-01"  # feature/label cutoff (orders span 1995-2001)
CHN_HORIZON_DAYS = 90  # churn = no order within 90 days after cutoff


def _churn_frame_oracle() -> str:
    return f"""
    WITH o AS (
      SELECT o_custkey,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), cut AS (
      SELECT date_diff('day', DATE '1970-01-01', DATE '{CHN_CUTOFF}') AS c
    ), agg AS (
      SELECT o.o_custkey AS custkey,
             CAST(sum(CASE WHEN o.day < cut.c THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orders_pre,
             CAST(sum(CASE WHEN o.day < cut.c THEN o.cents ELSE 0 END)
                  AS BIGINT) AS spend_cents_pre,
             CAST(cut.c - max(CASE WHEN o.day < cut.c THEN o.day END)
                  AS BIGINT) AS recency_days,
             CAST(cut.c - min(CASE WHEN o.day < cut.c THEN o.day END)
                  AS BIGINT) AS tenure_days,
             CAST(sum(CASE WHEN o.day >= cut.c
                           AND o.day < cut.c + {CHN_HORIZON_DAYS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_window
      FROM o, cut GROUP BY 1, cut.c
    )
    SELECT custkey, n_orders_pre, spend_cents_pre,
           recency_days, tenure_days,
           (n_window = 0) AS churned
    FROM agg WHERE n_orders_pre >= 1
    """


@stage(
    "customer_churn_training_frame",
    oracle=_churn_frame_oracle(),
    tags=("warehouse", "ml", "labels", "point-in-time"),
)
def customer_churn_training_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POINT-IN-TIME churn training frame — the leakage-safe
    feature/label extraction every supervised pipeline needs and most
    get wrong: features (order count, spend, recency, tenure) computed
    STRICTLY from orders before the {cut} cutoff; the label (churned =
    zero orders in the following {h} days) STRICTLY from the window
    after it. One conditional-aggregation pass produces both sides, so
    the temporal firewall is a per-column predicate, not a join of two
    differently-filtered scans that can drift apart. Customers with no
    pre-cutoff history are excluded (nothing to featurize).

    Exactness: integer day arithmetic from the epoch anchor; spend in
    exact cents (round(price·100) — the 2-dp money convention);
    label a boolean.

    Scale (100 TB): ONE scan of orders into a custkey hash aggregate
    with map-side combine — no window, no self-join; the frame is one
    row per customer (the ML-ready output a feature store would
    snapshot). Backfills = one query per cutoff, embarrassingly
    parallel across cutoffs."""
    cut = F.datediff(F.lit(CHN_CUTOFF).cast("date"), F.lit("1970-01-01"))
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01")
        ).alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    pre = F.col("day") < cut
    win = (F.col("day") >= cut) & (F.col("day") < cut + CHN_HORIZON_DAYS)
    agg = o.groupBy("custkey").agg(
        F.sum(F.when(pre, 1).otherwise(0)).cast("bigint").alias(
            "n_orders_pre"
        ),
        F.sum(F.when(pre, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("spend_cents_pre"),
        (cut - F.max(F.when(pre, F.col("day"))))
        .cast("bigint")
        .alias("recency_days"),
        (cut - F.min(F.when(pre, F.col("day"))))
        .cast("bigint")
        .alias("tenure_days"),
        F.sum(F.when(win, 1).otherwise(0)).cast("bigint").alias("n_window"),
    )
    return agg.filter(F.col("n_orders_pre") >= 1).select(
        "custkey",
        "n_orders_pre",
        "spend_cents_pre",
        "recency_days",
        "tenure_days",
        (F.col("n_window") == 0).alias("churned"),
    )


customer_churn_training_frame.__doc__ = (
    customer_churn_training_frame.__doc__.replace("{cut}", CHN_CUTOFF)
    .replace("{h}", str(CHN_HORIZON_DAYS))
)


# --------------------------------------------------------------------
# Approx-percentile accuracy contract (the AQP quantile sketch)
# --------------------------------------------------------------------

APC_ACCURACY = 10000  # Spark percentile_approx accuracy (eps = 1/acc)
APC_QS_PPM = (500_000, 900_000, 990_000)  # p50 / p90 / p99


def _approx_pct_oracle() -> str:
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) // {APC_ACCURACY} + 1 AS BIGINT) AS eps_rows,
           TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
    FROM lineitem
    """


@stage(
    "lineitem_approx_percentile_contract",
    oracle=_approx_pct_oracle(),
    tags=("warehouse", "aqp", "sketch", "contract"),
)
def lineitem_approx_percentile_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """APPROXIMATE-QUERY-PROCESSING contract for the quantile sketch —
    the accuracy audit next to the HLL and CMS members of the sketch
    family: Spark's ``percentile_approx`` (Greenwald–Khanna, rank
    error ≤ n/accuracy) over exact price cents at p50/p90/p99, then a
    SECOND exact pass computes each approximate answer's true rank
    envelope and emits the boolean guarantee check — rank(approx)
    within q·n ± (n DIV {acc} + 1). The oracle recomputes n and the
    permitted slack and pins the booleans TRUE: a sketch regression
    (or a mis-set accuracy knob) flips a hashed fact, not a vibe.
    Ties are handled by the [count<, count≤] rank INTERVAL — the
    guarantee holds iff the interval intersects the target band.

    Scale (100 TB): two scans (one sketch aggregate, one conditional
    rank count against the broadcast 1-row sketch result) — the AQP
    point is that the sketch pass replaces a full sort; the exact
    verification pass is what this CONTRACT adds and what production
    would sample rather than run in full."""
    li = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents")
    )
    qs = [p / 1_000_000 for p in APC_QS_PPM]
    approx = li.agg(
        F.expr(
            f"percentile_approx(cents, array({', '.join(f'{q}D' for q in qs)}),"
            f" {APC_ACCURACY})"
        ).alias("ap")
    ).select(*[F.col("ap")[i].alias(f"a{i}") for i in range(len(qs))])
    checks = li.crossJoin(F.broadcast(approx)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.when(F.col("cents") < F.col(f"a{i}"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"lt{i}")
            for i in range(len(qs))
        ],
        *[
            F.sum(F.when(F.col("cents") <= F.col(f"a{i}"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"le{i}")
            for i in range(len(qs))
        ],
    )
    eps = F.expr(f"n DIV {APC_ACCURACY} + 1")
    cols = [
        F.col("n"),
        eps.cast("bigint").alias("eps_rows"),
    ]
    for i, (ppm, name) in enumerate(zip(APC_QS_PPM, ("p50", "p90", "p99"))):
        target = F.expr(f"n * {ppm} DIV 1000000")
        cols.append(
            (
                (F.col(f"lt{i}") <= target + eps)
                & (F.col(f"le{i}") >= target - eps)
            ).alias(f"ok_{name}")
        )
    return checks.select(*cols)


lineitem_approx_percentile_contract.__doc__ = (
    lineitem_approx_percentile_contract.__doc__.replace(
        "{acc}", str(APC_ACCURACY)
    )
)


# --------------------------------------------------------------------
# Weekday-adjusted anomaly days (seasonal baseline + robust threshold)
# --------------------------------------------------------------------

DOW_MAD_K = 5  # flag |residual| > 5 x MAD


def _dow_anomaly_oracle() -> str:
    return f"""
    WITH o AS (
      SELECT date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS day
      FROM orders
    ), counts AS (
      SELECT day, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1
    ), grid AS (
      SELECT unnest(generate_series((SELECT min(day) FROM o),
                                    (SELECT max(day) FROM o))) AS day
    ), spine AS (
      SELECT g.day, ((g.day + 3) % 7) AS dow,
             CAST(COALESCE(c.c, 0) AS BIGINT) AS c
      FROM grid g LEFT JOIN counts c ON c.day = g.day
    ), base AS (
      SELECT dow,
             CAST(sum(c) * 1000000 // count(*) AS BIGINT) AS mean_micro
      FROM spine GROUP BY 1
    ), resid AS (
      SELECT s.day, s.dow, s.c,
             s.c * 1000000 - b.mean_micro AS resid_micro
      FROM spine s JOIN base b ON b.dow = s.dow
    ), mad AS (
      SELECT CAST(floor(median(abs(resid_micro))) AS BIGINT) AS mad_micro
      FROM resid
    )
    SELECT r.day, CAST(r.dow AS BIGINT) AS dow, r.c,
           CAST(r.resid_micro AS BIGINT) AS resid_micro,
           CAST({DOW_MAD_K} * m.mad_micro AS BIGINT) AS threshold_micro
    FROM resid r, mad m
    WHERE abs(r.resid_micro) > {DOW_MAD_K} * m.mad_micro
    """


@stage(
    "orders_dow_adjusted_anomalies",
    oracle=_dow_anomaly_oracle(),
    tags=("warehouse", "anomaly", "timeseries", "robust"),
)
def orders_dow_adjusted_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WEEKDAY-ADJUSTED anomaly days — the monitor the autocorrelation
    query justifies: daily order counts on the zero-filled spine,
    residuals against the per-weekday mean baseline (the seasonality
    the raw day-over-day alert would false-positive on), flagged where
    |residual| exceeds {k}× the MAD of all residuals — the robust
    threshold a single Black-Friday spike cannot inflate (unlike a
    stddev rule, where one outlier raises its own bar).

    Exactness: integer micro residuals (c·10⁶ − DIV-mean); the MAD's
    median is a 0.5-quantile on integers — exact dyadic, floored
    identically; the flag predicate is pure integer comparison.

    Scale (100 TB): one scan to per-day counts; spine, weekday
    baseline (7 rows, broadcast back) and the one-row MAD are all
    metadata-domain; the output is the anomaly list itself."""
    o = load(spark, sf_dir, "orders").select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01")
        ).alias("day")
    )
    counts = o.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lim = o.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (
        lim.select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
        .join(F.broadcast(counts), "day", "left")
        .select(
            "day",
            F.expr("(day + 3) % 7").alias("dow"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    base = spine.groupBy("dow").agg(
        F.expr("CAST(sum(c) * 1000000 DIV count(1) AS BIGINT)").alias(
            "mean_micro"
        )
    )
    resid = spine.join(F.broadcast(base), "dow").select(
        "day",
        "dow",
        "c",
        (F.col("c") * 1_000_000 - F.col("mean_micro")).alias("resid_micro"),
    )
    mad = resid.agg(
        F.expr(
            "CAST(floor(percentile(abs(resid_micro), 0.5D)) AS BIGINT)"
        ).alias("mad_micro")
    )
    return (
        resid.crossJoin(F.broadcast(mad))
        .filter(
            F.abs(F.col("resid_micro")) > DOW_MAD_K * F.col("mad_micro")
        )
        .select(
            "day",
            F.col("dow").cast("bigint").alias("dow"),
            "c",
            F.col("resid_micro").cast("bigint").alias("resid_micro"),
            (F.lit(DOW_MAD_K) * F.col("mad_micro"))
            .cast("bigint")
            .alias("threshold_micro"),
        )
    )


orders_dow_adjusted_anomalies.__doc__ = (
    orders_dow_adjusted_anomalies.__doc__.replace("{k}", str(DOW_MAD_K))
)
