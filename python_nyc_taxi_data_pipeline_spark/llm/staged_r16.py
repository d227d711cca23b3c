"""Round-16 registration candidates — seed slate started in round 9.

Same staging mechanism as ``staged_r8``–``staged_r15``; promotion in
round 16 via ``staged_r16.promote_to_registry(R16_BATCH)``.

The seed:

- ``embeddings_quantization_sweep``: e1…e4 fixed-point precision
  sweep (exact-representation counts + integer reconstruction-error
  mass) — the how-many-bits table read before choosing int8/fp16/PQ.
  Moved here from the r10 slate in the round-10 swap that pulled
  ``embeddings_semdedup_hier_contract`` forward (r9 VERDICT
  directive #2).
- ``customer_order_gap_percentiles``: exact inter-order-gap
  percentiles (p50/p75) per market segment — repeat-purchase latency
  profiling: per-customer consecutive-order day gaps via a keyed lag
  window, then the engine's exact-percentile convention per segment.
- ``events_session_type_lift``: session-level event-type association
  — for each type pair, sessions containing both vs the independence
  expectation, support/confidence/lift in exact micro units (the
  ``orders_basket_lift`` operator family lifted onto sessionized
  behavioral data).
- ``events_concurrency_time_integral`` (added in round 10, closing
  the slate at 10): per-day busy user-µs (∫ concurrency dt) and exact
  time-weighted average concurrency — the capacity twin of
  ``events_peak_concurrency``; the engine's per-span day clipping and
  the oracle's sweep-line are different algebras producing the same
  integers (a cross-method identity, Little's-law bookkeeping).
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

R16_BATCH: tuple[str, ...] = (
    "customer_cohort_repeat_rate",
    "customer_order_gap_percentiles",
    "docs_lang_temperature_ladder",
    "docs_source_lang_association",
    "docs_vocab_coverage_ladder",
    "embeddings_quantization_sweep",
    "events_concurrency_time_integral",
    "events_peak_concurrency",
    "events_session_type_lift",
    "events_value_iqr_trimmed_stats",
)


def promote_to_registry(names: list[str]) -> list[str]:
    """Round-16 registration in one call; ``names`` is REQUIRED —
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
# Inter-order gap percentiles per segment (repeat-purchase latency)
# --------------------------------------------------------------------


def _order_gap_oracle() -> str:
    return """
    WITH o AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             date_diff('day', DATE '1970-01-01',
                       CAST(o.o_orderdate AS DATE)) AS day
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), gaps AS (
      SELECT segment,
             day - lag(day) OVER (
               PARTITION BY o_custkey ORDER BY day, segment) AS gap
      FROM o
      QUALIFY gap IS NOT NULL
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(floor(median(gap)) AS BIGINT) AS p50_gap_days,
           CAST(floor(quantile_cont(gap, 0.75)) AS BIGINT) AS p75_gap_days,
           CAST(max(gap) AS BIGINT) AS max_gap_days
    FROM gaps GROUP BY 1
    """


@stage(
    "customer_order_gap_percentiles",
    oracle=_order_gap_oracle(),
    tags=("warehouse", "analytics", "percentile"),
)
def customer_order_gap_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase LATENCY profile: consecutive-order day gaps per
    customer (keyed lag window), summarized per market segment with
    the exact-percentile convention (p50/p75 via linear-interpolation
    percentile — Spark ``percentile`` = DuckDB ``quantile_cont``,
    both exact sort-based definitions, truncated to whole days after
    interpolation). The CRM inter-purchase-time table that drives
    churn-risk windows ("customer overdue at 2× their segment p50").

    Exactness: integer day arithmetic from the epoch anchor; the only
    floats are the two interpolated percentiles — 0.5 and 0.75 are
    EXACT binary fractions, so with integer gaps the interpolated
    value is an exact dyadic rational (denominator ≤ 4) in IEEE
    double on both engines, floored BEFORE the BIGINT cast on both
    (DuckDB's double→int CAST rounds half-to-even while Spark's
    truncates — floor() removes the half-boundary divergence this
    fixture actually hit at 307.5); 0.9 would not even be an exact
    fraction, so p90 is deliberately avoided.

    Scale (100 TB): orders⋈customer is a broadcast-dim join; gaps are
    one customer-keyed window pass (parallel across customers); the
    exact percentile buffers the gap column per segment — gaps are
    one row per repeat order, the corpus compressed by the
    orders-per-customer fold. Per-segment groups are bounded by the
    5-value segment vocabulary."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .alias("day"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("day", "segment")
    gaps = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("o_custkey", "segment", "day")
        .withColumn("gap", F.col("day") - F.lag("day").over(w))
        .filter(F.col("gap").isNotNull())
    )
    return gaps.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.expr("CAST(floor(percentile(gap, 0.5D)) AS BIGINT)").alias(
            "p50_gap_days"
        ),
        F.expr("CAST(floor(percentile(gap, 0.75D)) AS BIGINT)").alias(
            "p75_gap_days"
        ),
        F.max("gap").cast("bigint").alias("max_gap_days"),
    )


# --------------------------------------------------------------------
# Session-level event-type association (lift over sessionized streams)
# --------------------------------------------------------------------

STL_GAP_S = 1800  # the registered 30-minute session gap


def _session_lift_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             date_diff('microsecond',
                       TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
      FROM events
    ), marked AS (
      SELECT user_id, event_id, event_type, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  > {STL_GAP_S} * 1000000 OR lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM e
    ), sess AS (
      SELECT user_id, event_type,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sess_id
      FROM marked
    ), st AS (
      SELECT DISTINCT user_id, sess_id, event_type FROM sess
    ), ns AS (
      SELECT CAST(count(DISTINCT (user_id, sess_id)) AS BIGINT) AS n
      FROM st
    ), singles AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM st GROUP BY 1
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS both_cnt
      FROM st a
      JOIN st b ON a.user_id = b.user_id AND a.sess_id = b.sess_id
               AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.both_cnt,
           CAST(p.both_cnt * 1000000 // (SELECT n FROM ns) AS BIGINT)
             AS support_micro,
           CAST(p.both_cnt * 1000000 // sa.cnt AS BIGINT)
             AS confidence_micro,
           CAST(p.both_cnt * (SELECT n FROM ns) * 1000000
                // (sa.cnt * sb.cnt) AS BIGINT) AS lift_micro
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    """


@stage(
    "events_session_type_lift",
    oracle=_session_lift_oracle(),
    tags=("events", "analytics", "association", "sessions"),
)
def events_session_type_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-level event-type ASSOCIATION rules: sessions cut at the
    registered {STL_GAP_S}-second gap (tie-broken on event_id like
    every sessionization here), each session reduced to its distinct
    type set, then for every type pair: co-occurring sessions,
    support, confidence (P(b|a)), and lift vs independence — the
    ``orders_basket_lift`` operator family on behavioral baskets
    (what a recommender or funnel designer reads to find coupled
    actions).

    Exactness: integer counts; support/confidence/lift in micro
    units by integer DIV (lift's cross-multiplication stays in
    BIGINT: both_cnt·n·1e6 ≤ sessions²·1e6, ~1e17 at sf0.1's ~40k
    sessions — inside int64; the stress inflater shifts user ids so
    sessions scale ~k and the product's headroom holds to ~3e9
    sessions).

    Scale (100 TB): sessionization is the shared keyed window pass;
    the distinct (session, type) reduction collapses the stream to
    ≤|types| rows per session; the pair join is keyed by session
    with ≤C(|types|,2) emits per session (type vocabulary is fixed),
    so the shuffle is ~linear in sessions. Totals are broadcast
    one-row/|types|-row frames."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_us").over(w_order).isNull()
            | (
                F.col("ts_us") - F.lag("ts_us").over(w_order)
                > STL_GAP_S * 1000000
            ),
            1,
        ).otherwise(0),
    )
    st = (
        marked.withColumn("sess_id", F.sum("new_sess").over(w_cum))
        .select("user_id", "sess_id", "event_type")
        .distinct()
    )
    ns = st.select("user_id", "sess_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    singles = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = st.select(
        "user_id", "sess_id", F.col("event_type").alias("type_a")
    )
    b = st.select(
        "user_id", "sess_id", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "sess_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("both_cnt"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("cnt").alias("cnt_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(ns))
        .select(
            "type_a",
            "type_b",
            "both_cnt",
            F.expr("both_cnt * 1000000 DIV n")
            .cast("bigint")
            .alias("support_micro"),
            F.expr("both_cnt * 1000000 DIV cnt_a")
            .cast("bigint")
            .alias("confidence_micro"),
            F.expr("both_cnt * n * 1000000 DIV (cnt_a * cnt_b)")
            .cast("bigint")
            .alias("lift_micro"),
        )
    )


events_session_type_lift.__doc__ = events_session_type_lift.__doc__.format(
    STL_GAP_S=STL_GAP_S
)


# --------------------------------------------------------------------
# Vocabulary coverage ladder (top-k token-mass coverage)
# --------------------------------------------------------------------

VCL_KS = (10, 50, 100, 500)


def _vocab_coverage_oracle() -> str:
    ks = ", ".join(str(k) for k in VCL_KS)
    return f"""
    WITH w AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        AS word
      FROM documents
    ), cnt AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM cnt
    ), ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rk
      FROM cnt
    )
    SELECT CAST(l.k AS BIGINT) AS k,
           CAST(sum(CASE WHEN rk <= l.k THEN n ELSE 0 END) AS BIGINT)
             AS top_mass,
           CAST(sum(CASE WHEN rk <= l.k THEN n ELSE 0 END) * 1000000
                // (SELECT greatest(t, 1) FROM tot) AS BIGINT)
             AS coverage_micro
    FROM ranked CROSS JOIN (SELECT unnest([{ks}]) AS k) l
    GROUP BY 1
    """


@stage(
    "docs_vocab_coverage_ladder",
    oracle=_vocab_coverage_oracle(),
    tags=("llm", "textstats", "tokenizer"),
)
def docs_vocab_coverage_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vocabulary COVERAGE ladder: for k in {VCL_KS}, the token mass
    and micro share of the corpus covered by the top-k word types —
    the vocabulary-size sizing table a tokenizer budget reads
    (Zipf-head mass: how big must the vocab be before OOV mass is
    negligible). Complements the registered rank-frequency Zipf
    report (which shows the head SHAPE; this shows cumulative mass).

    Exactness: the shared single-space-split + empty-token-exclusion
    convention; ranking by (count desc, word asc) is UNIQUE (word is
    the key), so top-k sets are identical in both engines; micro
    share by guarded integer DIV.

    Scale (100 TB): one explode into a word-key count (map-side
    combine); the top-max(k) head is selected by
    TakeOrderedAndProject on the Zipf-compressed vocabulary (no
    global sort of the corpus), rank derives from the triangular
    idiom on that CONSTANT-size frame, and the ladder is a broadcast
    literal fanout. The total is a one-row broadcast."""
    kmax = max(VCL_KS)
    cnt = (
        load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr("filter(split(text, ' '), x -> x <> '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cnt.agg(
        F.greatest(F.sum("n"), F.lit(1)).cast("bigint").alias("t")
    )
    top = (
        cnt.orderBy(F.desc("n"), F.asc("word"))
        .limit(kmax)
        .localCheckpoint(eager=True)
    )
    lo = top.select(F.col("n").alias("o_n"), F.col("word").alias("o_w"))
    ranked = (
        top.join(
            F.broadcast(lo),
            (F.col("o_n") > F.col("n"))
            | ((F.col("o_n") == F.col("n")) & (F.col("o_w") <= F.col("word"))),
        )
        .groupBy("word", "n")
        .agg(F.count(F.lit(1)).alias("rk"))
    )
    ladder = spark.createDataFrame([(k,) for k in VCL_KS], "k long")
    return (
        ranked.crossJoin(F.broadcast(ladder))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("top_mass")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "top_mass",
            F.expr("top_mass * 1000000 DIV t")
            .cast("bigint")
            .alias("coverage_micro"),
        )
    )


# --------------------------------------------------------------------
# Peak concurrent sessions per day (interval counting, banded prefix)
# --------------------------------------------------------------------

PCC_GAP_S = 1800  # the registered 30-minute session gap


def _peak_concurrency_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT user_id, event_id,
             date_diff('microsecond',
                       TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
      FROM events
    ), marked AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  > {PCC_GAP_S} * 1000000 OR lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  IS NULL THEN 1 ELSE 0 END AS new_sess,
             event_id
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
    ), bounds AS (
      SELECT t0 AS ts_us, 1 AS delta FROM spans
      UNION ALL
      SELECT t1 AS ts_us, -1 AS delta FROM spans
    ), cum AS (
      SELECT ts_us, delta,
             sum(delta) OVER (
               ORDER BY ts_us, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conc
      FROM bounds
    )
    SELECT CAST(ts_us // 86400000000 AS BIGINT) AS day,
           CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS sessions_started,
           CAST(max(conc) AS BIGINT) AS peak_concurrent
    FROM cum GROUP BY 1
    """


@stage(
    "events_peak_concurrency",
    oracle=_peak_concurrency_oracle(),
    tags=("events", "analytics", "timeseries", "sessions"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENT SESSIONS per day — the capacity-planning curve:
    sessions (the registered 30-minute-gap cut, event_id tie-broken)
    become [first event, last event] intervals, interval endpoints
    become a ±1 delta stream, and the running concurrency is the
    global cumulative sum over time — computed on the banded
    TWO-LEVEL PREFIX scaffold (intra-day keyed window + broadcast
    day offsets), never a single-partition global window; DuckDB's
    oracle uses its plain single-node cumulative, so the hash pins
    the decomposition exactly. Ties at identical microseconds order
    (−1 before +1) — the conservative convention, identical in both
    engines.

    Exactness: integer micros from the naive epoch anchor; counts
    and one max.

    Scale (100 TB): sessionization is the shared keyed window pass;
    the boundary stream is 2 rows per session (the corpus compressed
    by the events-per-session fold); the prefix machinery runs on
    that boundary frame with day-keyed bands. No collect."""
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
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        e.withColumn(
            "new_sess",
            F.when(
                F.lag("ts_us").over(w_order).isNull()
                | (
                    F.col("ts_us") - F.lag("ts_us").over(w_order)
                    > PCC_GAP_S * 1000000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w_cum))
    )
    spans = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts_us").alias("t0"),
        (F.max("ts_us") + 1).alias("t1"),
    )
    bounds = spans.select(
        F.col("t0").alias("ts_us"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(F.col("t1").alias("ts_us"), F.lit(-1).alias("delta"))
    )
    banded = bounds.withColumn(
        "band", F.expr("ts_us DIV 86400000000")
    )
    intra = banded.withColumn(
        "in_band_cum",
        F.sum("delta").over(
            Window.partitionBy("band")
            .orderBy("ts_us", "delta")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    band_tot = banded.groupBy("band").agg(F.sum("delta").alias("bd"))
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
        "conc", (F.col("offset") + F.col("in_band_cum")).cast("bigint")
    )
    return cum.groupBy(
        F.expr("CAST(ts_us DIV 86400000000 AS BIGINT)").alias("day")
    ).agg(
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("sessions_started"),
        F.max("conc").cast("bigint").alias("peak_concurrent"),
    )


docs_vocab_coverage_ladder.__doc__ = (
    docs_vocab_coverage_ladder.__doc__.replace("{VCL_KS}", str(VCL_KS))
)


# --------------------------------------------------------------------
# Temperature-mixture ladder (the alpha design table)
# --------------------------------------------------------------------

TML_ALPHAS = (0.2, 0.3, 0.5, 0.7, 1.0)


def _temperature_ladder_oracle() -> str:
    alphas = ", ".join(str(a) for a in TML_ALPHAS)
    return f"""
    WITH per_lang AS (
      SELECT lang,
             CAST(sum(len(list_filter(string_split(text, ' '),
                                      x -> x <> ''))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM per_lang
    ), ladder AS (
      SELECT unnest([{alphas}]) AS alpha
    ), scored AS (
      SELECT l.alpha, p.lang, p.n_tokens,
             pow(p.n_tokens / t.total, l.alpha) AS w
      FROM per_lang p CROSS JOIN ladder l CROSS JOIN tot t
    ), z AS (
      SELECT alpha, sum(w) AS z FROM scored GROUP BY 1
    ), q AS (
      SELECT s.alpha, s.lang, s.n_tokens, s.w / z.z AS q
      FROM scored s JOIN z ON z.alpha = s.alpha
    ), eff AS (
      SELECT alpha, 1.0 / sum(q * q) AS eff_langs FROM q GROUP BY 1
    )
    SELECT q.alpha, q.lang, q.n_tokens,
           round(q.q, 6) AS temp_frac,
           round(q.q / (q.n_tokens / (SELECT total FROM tot)), 6)
             AS sample_weight,
           round(e.eff_langs, 6) AS effective_langs
    FROM q JOIN eff e ON e.alpha = q.alpha
    """


@stage(
    "docs_lang_temperature_ladder",
    oracle=_temperature_ladder_oracle(),
    tags=("llm", "selection", "sampling", "report"),
)
def docs_lang_temperature_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-mixture DESIGN TABLE: the temperature rebalance
    rule (q_l ∝ p_l^α — the multilingual-sampling convention, cf. the
    staged DoReMi/water-fill mixture family) swept over α ∈
    {TML_ALPHAS} —
    per (α, lang): the temperature share, the per-token sample
    weight, and the mixture's EFFECTIVE language count (1/Σq², the
    participation-ratio diversity index; α=1 reproduces the natural
    mix, α→0 approaches uniform = |langs|). This is the table a
    multilingual data recipe reads to PICK α.

    Exactness: double pow/÷ rounded at 6 dp; the normalizer sums
    |langs| ≈ 5 doubles whose order sensitivity (~1e-16 relative)
    sits far below the rounding grain. Token counts follow the
    slate's shared convention (single-space split, EMPTY TOKENS
    EXCLUDED — the `w <> ''` rule `docs_vocab_coverage_ladder` and
    `corpus_filter_ablation_lattice` use), applied identically on
    both engines.

    Scale (100 TB): ONE corpus scan to per-lang token totals;
    everything after runs on the |langs|×|alphas| metadata domain
    (broadcast one-row total, per-alpha normalizers from a ≤25-row
    frame)."""
    d = load(spark, sf_dir, "documents")
    per_lang = (
        d.groupBy("lang")
        .agg(
            F.sum(
                F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
            )
            .cast("bigint")
            .alias("n_tokens")
        )
        .localCheckpoint(eager=True)
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("double").alias("total"))
    ladder = spark.createDataFrame(
        [(a,) for a in TML_ALPHAS], "alpha double"
    )
    scored = (
        per_lang.crossJoin(F.broadcast(ladder))
        .crossJoin(F.broadcast(tot))
        .withColumn("p", F.col("n_tokens") / F.col("total"))
        .withColumn("w", F.pow("p", F.col("alpha")))
    )
    z = scored.groupBy("alpha").agg(F.sum("w").alias("z"))
    q = scored.join(F.broadcast(z), "alpha").withColumn(
        "q", F.col("w") / F.col("z")
    )
    eff = q.groupBy("alpha").agg(
        (F.lit(1.0) / F.sum(F.col("q") * F.col("q"))).alias("eff_langs")
    )
    return q.join(F.broadcast(eff), "alpha").select(
        "alpha",
        "lang",
        "n_tokens",
        F.round("q", 6).alias("temp_frac"),
        F.round(F.col("q") / F.col("p"), 6).alias("sample_weight"),
        F.round("eff_langs", 6).alias("effective_langs"),
    )


# --------------------------------------------------------------------
# Cohort repeat-purchase rate (orders-based acquisition cohorts)
# --------------------------------------------------------------------

CRR_WINDOW_DAYS = 90


def _cohort_repeat_oracle() -> str:
    return f"""
    WITH o AS (
      SELECT o_custkey,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS day
      FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             min(day) AS first_day,
             CAST(sum(CASE WHEN day = (SELECT min(day) FROM o i
                                       WHERE i.o_custkey = o.o_custkey)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_at_first,
             min(CASE WHEN day > (SELECT min(day) FROM o i
                                  WHERE i.o_custkey = o.o_custkey)
                 THEN day END) AS next_day
      FROM o GROUP BY o_custkey
    ), labeled AS (
      SELECT CAST(date_trunc('month', DATE '1970-01-01'
                   + to_days(CAST(first_day AS INT))) AS DATE)
               AS cohort_month,
             n_orders >= 2 AS repeated,
             CASE WHEN n_at_first >= 2 THEN first_day ELSE next_day END
               AS second_day,
             first_day
      FROM per_cust
    )
    SELECT cohort_month,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN repeated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST(sum(CASE WHEN repeated AND second_day - first_day
                         <= {CRR_WINDOW_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat_{CRR_WINDOW_DAYS}d,
           CAST(sum(CASE WHEN repeated THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS repeat_rate_micro
    FROM labeled GROUP BY 1
    """


@stage(
    "customer_cohort_repeat_rate",
    oracle=_cohort_repeat_oracle(),
    tags=("warehouse", "analytics", "cohorts"),
)
def customer_cohort_repeat_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Acquisition-cohort REPEAT-PURCHASE rates: customers grouped by
    first-order month, reporting how many ever ordered again and how
    many did so within {CRR_WINDOW_DAYS} days of their first order —
    the orders-side retention table (the registered events-side
    retention cohorts track LOGINS; a revenue review reads this one).
    Second-order day is defined exactly: if two orders share the
    first day, the repeat interval is 0; otherwise the earliest
    strictly-later order day.

    Exactness: integer day arithmetic; per-customer facts come from
    a min/count aggregate plus one conditional aggregate over the
    min joined back (nested aggregates are illegal in both engines;
    the oracle spells the same quantities with correlated mins);
    micro rate by integer DIV.

    Scale (100 TB): two customer-keyed hash aggregates and one join,
    ALL partitioned by the same custkey hash (the exchange is reused,
    not repaid), then a calendar-bounded cohort aggregate. No
    windows."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .alias("day"),
    )
    firsts = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("day").alias("first_day"),
    )
    # second pass keyed by the SAME custkey hash (exchange reuse): how
    # many orders share the first day, and the earliest strictly-later
    # day — nested aggregates (min inside sum) are illegal in both
    # engines, so the oracle uses correlated mins and Spark joins the
    # per-customer min back before one conditional aggregate.
    per_cust = (
        o.join(firsts, "o_custkey")
        .groupBy("o_custkey", "n_orders", "first_day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("bigint")
            .alias("n_at_first"),
            F.min(
                F.when(F.col("day") > F.col("first_day"), F.col("day"))
            ).alias("next_day"),
        )
    )
    labeled = per_cust.select(
        F.trunc(
            F.expr("date_add(DATE '1970-01-01', CAST(first_day AS INT))"),
            "month",
        ).alias("cohort_month"),
        (F.col("n_orders") >= 2).alias("repeated"),
        F.when(F.col("n_at_first") >= 2, F.col("first_day"))
        .otherwise(F.col("next_day"))
        .alias("second_day"),
        "first_day",
    )
    w = CRR_WINDOW_DAYS
    return labeled.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("repeated").cast("int"))
        .cast("bigint")
        .alias("n_repeat"),
        F.sum(
            (
                F.col("repeated")
                & (F.col("second_day") - F.col("first_day") <= w)
            ).cast("int")
        )
        .cast("bigint")
        .alias(f"n_repeat_{w}d"),
        F.expr("CAST(sum(CASE WHEN repeated THEN 1 ELSE 0 END) * 1000000"
               " DIV count(*) AS BIGINT)").alias("repeat_rate_micro"),
    )


docs_lang_temperature_ladder.__doc__ = (
    docs_lang_temperature_ladder.__doc__.replace(
        "{TML_ALPHAS}", str(TML_ALPHAS)
    )
)
customer_cohort_repeat_rate.__doc__ = (
    customer_cohort_repeat_rate.__doc__.replace(
        "{CRR_WINDOW_DAYS}", str(CRR_WINDOW_DAYS)
    )
)


# --------------------------------------------------------------------
# IQR-trimmed robust stats per event type (robust monitoring family)
# --------------------------------------------------------------------


def _trimmed_stats_oracle() -> str:
    return """
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), bounds AS (
      SELECT event_type,
             CAST(floor(quantile_cont(cents, 0.25)) AS BIGINT) AS p25,
             CAST(floor(quantile_cont(cents, 0.75)) AS BIGINT) AS p75,
             CAST(count(*) AS BIGINT) AS n_all
      FROM v GROUP BY 1
    ), trimmed AS (
      SELECT v.event_type, b.p25, b.p75, b.n_all,
             CAST(count(*) AS BIGINT) AS n_trim,
             CAST(sum(v.cents) AS BIGINT) AS sum_trim
      FROM v JOIN bounds b USING (event_type)
      WHERE v.cents BETWEEN b.p25 AND b.p75
      GROUP BY 1, 2, 3, 4
    )
    SELECT event_type, n_all, p25 AS p25_cents, p75 AS p75_cents,
           n_trim,
           CAST(sum_trim * 1000000 // greatest(n_trim, 1) AS BIGINT)
             AS trimmed_mean_cents_micro
    FROM trimmed
    """


@stage(
    "events_value_iqr_trimmed_stats",
    oracle=_trimmed_stats_oracle(),
    tags=("events", "analytics", "robust"),
)
def events_value_iqr_trimmed_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IQR-TRIMMED robust value stats per event type: values convert
    EXACTLY to integer cents (the column is 2-dp money; round(x*100)
    lands within 1e-9 of an integer on both engines, never at a half
    boundary), the interquartile bounds come from the exact dyadic
    percentile convention (0.25/0.75, floored before the cast — the
    gap-percentile rule), and the trimmed mean averages only values
    inside [p25, p75] — the robust central-tendency monitor that a
    mean-shift alert should read instead of the raw mean (one whale
    purchase cannot move it). Complements the registered MAD-outlier
    query (which flags tails; this summarizes the core).

    Exactness: integer cents end to end; the two interpolated
    percentiles are exact dyadic rationals floored identically; the
    trimmed mean is an integer micro DIV with a greatest(,1) guard.

    Scale (100 TB): one scan to per-type exact-percentile aggregates
    (groups = the fixed type vocabulary; the percentile buffers one
    integer column per group), one broadcast join of the ≤|types|-row
    bounds frame back, one conditional aggregate. No windows."""
    v = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    bounds = v.groupBy("event_type").agg(
        F.expr("CAST(floor(percentile(cents, 0.25D)) AS BIGINT)").alias(
            "p25"
        ),
        F.expr("CAST(floor(percentile(cents, 0.75D)) AS BIGINT)").alias(
            "p75"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
    )
    return (
        v.join(F.broadcast(bounds), "event_type")
        .filter(F.col("cents").between(F.col("p25"), F.col("p75")))
        .groupBy("event_type", "p25", "p75", "n_all")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trim"),
            F.sum("cents").cast("bigint").alias("sum_trim"),
        )
        .select(
            "event_type",
            "n_all",
            F.col("p25").alias("p25_cents"),
            F.col("p75").alias("p75_cents"),
            "n_trim",
            F.expr(
                "CAST(sum_trim * 1000000 DIV greatest(n_trim, 1)"
                " AS BIGINT)"
            ).alias("trimmed_mean_cents_micro"),
        )
    )


# --------------------------------------------------------------------
# Source × language association strength (chi-square / Cramér's V)
# --------------------------------------------------------------------


def _source_lang_assoc_oracle() -> str:
    return """
    WITH c AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ), m AS (
      SELECT CAST(sum(o) AS DOUBLE) AS n,
             CAST(count(DISTINCT source) AS BIGINT) AS r,
             CAST(count(DISTINCT lang) AS BIGINT) AS k
      FROM c
    ), rt AS (
      SELECT source, CAST(sum(o) AS DOUBLE) AS rsum FROM c GROUP BY 1
    ), ct AS (
      SELECT lang, CAST(sum(o) AS DOUBLE) AS csum FROM c GROUP BY 1
    ), spine AS (
      SELECT r.source, l.lang, r.rsum, l.csum
      FROM rt r CROSS JOIN ct l
    ), chi AS (
      SELECT sum(pow(COALESCE(c.o, 0) - s.rsum * s.csum / (SELECT n FROM m), 2)
                 / (s.rsum * s.csum / (SELECT n FROM m))) AS chi2
      FROM spine s
      LEFT JOIN c ON c.source = s.source AND c.lang = s.lang
    )
    SELECT CAST(m.n AS BIGINT) AS n_docs,
           CAST((m.r - 1) * (m.k - 1) AS BIGINT) AS dof,
           round(chi.chi2, 6) AS chi2,
           round(sqrt(chi.chi2 / (m.n * least(m.r - 1, m.k - 1))), 6)
             AS cramers_v
    FROM chi CROSS JOIN m
    """


@stage(
    "docs_source_lang_association",
    oracle=_source_lang_assoc_oracle(),
    tags=("llm", "quality", "drift", "contract"),
)
def docs_source_lang_association(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Source × language ASSOCIATION strength: Pearson chi-square over
    the dense source×lang contingency (zero cells included — the
    TVD-drift empty-cell rule) and Cramér's V (the [0,1]-normalized
    effect size). V ≈ 0 means languages are mixed uniformly across
    sources; V → 1 means sources are language-silos — the mixture
    designer's independence check before stratifying by either axis
    alone (a siloed corpus makes source weights double as hidden
    language weights).

    Exactness: the contingency is exact integers; chi-square and V
    are double arithmetic rounded at 6 dp over a ≤|sources|·|langs|
    (~100-cell) metadata frame — the registered filter-agreement /
    temperature-mixture precedent (summation-order sensitivity
    ~1e-16, far below the rounding grain).

    Scale (100 TB): one scan to the (source, lang) hash aggregate;
    everything after runs on the vocabulary-bounded contingency
    domain (marginals, dense spine, one-row moments — all broadcast
    metadata)."""
    c = load(spark, sf_dir, "documents").groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    m = c.agg(
        F.sum("o").cast("double").alias("n"),
        F.countDistinct("source").cast("bigint").alias("r"),
        F.countDistinct("lang").cast("bigint").alias("k"),
    )
    rt = c.groupBy("source").agg(F.sum("o").cast("double").alias("rsum"))
    ct = c.groupBy("lang").agg(F.sum("o").cast("double").alias("csum"))
    spine = rt.crossJoin(F.broadcast(ct))
    chi = (
        spine.join(c, ["source", "lang"], "left")
        .crossJoin(F.broadcast(m))
        .select(
            (
                F.pow(
                    F.coalesce("o", F.lit(0))
                    - F.col("rsum") * F.col("csum") / F.col("n"),
                    F.lit(2),
                )
                / (F.col("rsum") * F.col("csum") / F.col("n"))
            ).alias("cell")
        )
        .agg(F.sum("cell").alias("chi2"))
    )
    return chi.crossJoin(F.broadcast(m)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        ((F.col("r") - 1) * (F.col("k") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("k") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------
# Quantization precision sweep (how many bits does the index need)
# --------------------------------------------------------------------

QUANT_LEVELS = (10, 100, 1000, 10000)  # e1 .. e4 fixed-point scales


def _quant_sweep_oracle() -> str:
    levels = ", ".join(str(s) for s in QUANT_LEVELS)
    return f"""
    WITH x AS (
      SELECT CAST(round(CAST(xv AS DOUBLE) * 10000.0, 0) AS BIGINT) AS q4
      FROM (SELECT unnest(embedding) AS xv FROM embeddings)
    ), lv AS (
      SELECT unnest([{levels}]) AS scale_
    ), err AS (
      SELECT lv.scale_,
             abs(x.q4 * lv.scale_ - CAST(round(CAST(x.q4 AS DOUBLE)
                                               * lv.scale_ / 10000.0, 0)
                                         AS BIGINT) * 10000) AS e_e4s
      FROM x CROSS JOIN lv
    )
    SELECT scale_ AS quant_scale,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(CASE WHEN e_e4s = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(max(e_e4s) AS BIGINT) AS max_abs_err_e4s,
           CAST(sum(e_e4s) AS BIGINT) AS sum_abs_err_e4s
    FROM err GROUP BY scale_
    """


@stage(
    "embeddings_quantization_sweep",
    oracle=_quant_sweep_oracle(),
    tags=("llm", "embedding", "quantization", "report"),
)
def embeddings_quantization_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization precision sweep: for each fixed-point scale
    (e1…e4), the exact-representation count and the absolute
    reconstruction-error mass of quantizing every embedding
    coordinate — the how-many-bits-does-the-index-need table read
    before choosing int8 vs fp16 vs PQ for a 100 TB vector store
    (when e2 already represents 99% of coordinates exactly, shipping
    e4 wastes half the index bytes).

    Exactness: coordinates first quantize to the canonical e4 integers
    (the repo-wide exact grid); each coarser level re-quantizes THOSE
    integers, so errors are exact integer differences in e4·scale
    units — no float comparison anywhere. The inner round is
    round-half-away on an exact ratio — the proven micro-quantize
    pattern, identical cross-engine.

    Scale (100 TB): one scan exploded to coordinates, a constant
    4-way level fan-out, and a 4-group hash aggregate with map-side
    combine — shuffle is 4 rows per partition."""
    e = load(spark, sf_dir, "embeddings")
    q4 = e.select(
        F.explode("embedding").alias("xv")
    ).select(
        F.round(F.col("xv").cast("double") * 10000.0, 0).cast("bigint").alias("q4")
    )
    lv = F.array(*[F.lit(s) for s in QUANT_LEVELS])
    err = q4.select(
        "q4", F.explode(lv).alias("scale_")
    ).select(
        "scale_",
        F.abs(
            F.col("q4") * F.col("scale_")
            - F.round(
                F.col("q4").cast("double") * F.col("scale_") / 10000.0, 0
            ).cast("bigint")
            * 10000
        ).alias("e_e4s"),
    )
    return err.groupBy(F.col("scale_").alias("quant_scale")).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(F.when(F.col("e_e4s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.max("e_e4s").alias("max_abs_err_e4s"),
        F.sum("e_e4s").alias("sum_abs_err_e4s"),
    )


# --------------------------------------------------------------------
# Time-integral concurrency per day (the capacity twin of the peak)
# --------------------------------------------------------------------

ECI_DAY_US = 86_400_000_000


def _concurrency_integral_oracle() -> str:
    """Sweep-line replay: running concurrency over the ±1 boundary
    stream (DuckDB's plain global cumulative), each constant-level
    segment clipped to the days it spans — a genuinely DIFFERENT
    algebra from the engine's per-span day clipping, so the hash
    match is a cross-METHOD identity (∫conc dt == Σ span∩day), not
    an implementation echo."""
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
                  > {PCC_GAP_S} * 1000000 OR lag(ts_us) OVER (
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
    ), bounds AS (
      SELECT t0 AS ts_us, 1 AS delta FROM spans
      UNION ALL
      SELECT t1 AS ts_us, -1 AS delta FROM spans
    ), swept AS (
      SELECT ts_us, delta,
             sum(delta) OVER (
               ORDER BY ts_us, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conc,
             lead(ts_us) OVER (ORDER BY ts_us, delta) AS nxt
      FROM bounds
    ), segs AS (
      SELECT ts_us AS s, nxt AS t, conc
      FROM swept WHERE nxt IS NOT NULL AND nxt > ts_us AND conc > 0
    ), segfan AS (
      SELECT s, t, conc,
             unnest(generate_series(s // {ECI_DAY_US},
                                    (t - 1) // {ECI_DAY_US})) AS day
      FROM segs
    ), segdays AS (
      SELECT day,
             conc * (least(t, (day + 1) * {ECI_DAY_US})
                     - greatest(s, day * {ECI_DAY_US})) AS busy
      FROM segfan
    ), per_day AS (
      SELECT day, CAST(sum(busy) AS BIGINT) AS busy_user_us
      FROM segdays GROUP BY 1
    ), spanfan AS (
      SELECT unnest(generate_series(t0 // {ECI_DAY_US},
                                    (t1 - 1) // {ECI_DAY_US})) AS day
      FROM spans
    ), active AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_sessions_active
      FROM spanfan GROUP BY 1
    )
    SELECT CAST(p.day AS BIGINT) AS day,
           a.n_sessions_active,
           p.busy_user_us,
           CAST(p.busy_user_us // 86400 AS BIGINT)
             AS avg_concurrency_micro
    FROM per_day p JOIN active a ON a.day = p.day
    """


@stage(
    "events_concurrency_time_integral",
    oracle=_concurrency_integral_oracle(),
    tags=("events", "analytics", "timeseries", "sessions", "contract"),
)
def events_concurrency_time_integral(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIME-INTEGRAL of session concurrency per day — the capacity
    number the peak hides: busy user-microseconds (∫ concurrency dt)
    and the day's time-WEIGHTED average concurrency in exact micro
    units (busy_us DIV 86400, since a day is 86400e6 µs). Peak says
    "provision for N"; the integral says what utilization actually
    was — together they are the capacity-planning pair.

    Method identity (the contract): the ENGINE computes the integral
    WITHOUT ever materializing running concurrency — each session
    span clips against the days it touches (explode + least/greatest,
    all map-side after the shared keyed sessionization window) and
    per-day overlap sums; the ORACLE computes the same integers by
    sweep-line (global running ±1 cumulative × segment lengths, day-
    clipped). ∫conc dt == Σ|span ∩ day| is Little's-law bookkeeping —
    two independent algebras hashing identical means both are right.

    Exactness: integer µs end to end; the only division is the final
    DIV 86400 (truncating identically in both engines).

    Scale (100 TB): sessionization is the shared keyed window; spans
    compress the corpus to one row per session; the day explode fans
    each span only to the days it ACTUALLY touches (sessions are
    minutes long — fan-out ≈ 1); one hash aggregate on day. No global
    windows, no collect — the engine-side plan never needs the
    sweep-line's total order, which is exactly why this shape scales
    where a naive port of the oracle would not."""
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
                > PCC_GAP_S * 1000000
            ),
            1,
        ).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(w_cum))
    spans = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts_us").alias("t0"),
        (F.max("ts_us") + 1).alias("t1"),
    )
    clipped = spans.select(
        "t0",
        "t1",
        F.explode(
            F.expr(
                f"sequence(t0 DIV {ECI_DAY_US}, (t1 - 1) DIV {ECI_DAY_US})"
            )
        ).alias("day"),
    ).select(
        "day",
        (
            F.least(F.col("t1"), (F.col("day") + 1) * F.lit(ECI_DAY_US))
            - F.greatest(F.col("t0"), F.col("day") * F.lit(ECI_DAY_US))
        ).alias("ov"),
    )
    return (
        clipped.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions_active"),
            F.sum("ov").cast("bigint").alias("busy_user_us"),
        )
        .select(
            F.col("day").cast("bigint").alias("day"),
            "n_sessions_active",
            "busy_user_us",
            F.expr("CAST(busy_user_us DIV 86400 AS BIGINT)").alias(
                "avg_concurrency_micro"
            ),
        )
    )
