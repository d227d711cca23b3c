"""Round-12 registration candidates.

Same staging mechanism as ``staged_r8``–``staged_r11``. Window math:
after the r8 registration the registry holds 200 queries and the
50-row evidence window retires everything at r4; the r9/r10/r11
slates (10 each) keep the rotation self-sustaining (10 new + 40
stalest per round), and this slate continues it: promotion in round
12 via ``staged_r12.promote_to_registry(R12_BATCH)`` puts the
registry at 240 with no evidence row older than 4 rounds.

The slate (every query DuckDB-twinned; pure integer/exact-string
outputs per the established cross-engine exactness rules):

- ``docs_length_ks_drift``: pairwise two-sample Kolmogorov–Smirnov
  distance between the per-source document-length distributions —
  the ECDF-based drift family member (PSI and JS divergence, both
  registered, are BINNED; KS is the order-statistic sup-gap, the
  test that catches a shift PSI's fixed bins smear). Exact integer
  cross-multiplication: sup_v |F_a(v)·n_a·n_b − F_b(v)·n_a·n_b|
  evaluated on the shared value grid.
- ``events_late_arrival_watermark_sweep``: the Structured-Streaming
  sizing artifact — for watermark delays {0, 60, 300, 1800}s, the
  exact fraction of events that would be LATE (event time below the
  per-source running-max event time of all earlier arrivals minus
  the delay; arrival order = event_id). This is the table you read
  BEFORE picking ``withWatermark``'s delay: each row prices a delay
  as dropped-data share.
- ``lineitem_compaction_plan``: the lakehouse OPTIMIZE planner as an
  oracle-pinned contract — pseudo-files (ship-month × orderkey-mod
  file id) bin-packed into compaction bins by running-row-count
  start-offset binning (bin = cum_rows_before DIV target), per
  partition. The plan output (files per bin, rows per bin) is
  metadata-scale; the planner's window arithmetic is what the
  oracle pins.
- ``events_markov_stationary``: 8 exact power-iteration steps over
  the user-journey Markov chain (the registered
  ``events_markov_transitions`` matrix, row-normalized in micro
  units) from the uniform start — the stationary-visit-share
  estimate behind session-mix dashboards, plus the step-8 vs step-7
  L1 delta as the convergence certificate. Integer micro DIV at
  every step, so both engines walk bit-identical trajectories.
- ``docs_audio_vad_segments``: energy-gate voice-activity detection
  over the r11 audio clips — disjoint windows, voiced = energy
  above a fixed gate, segments = maximal voiced runs
  (gaps-and-islands), per clip. The segmentation pass between
  decode and feature extraction in every speech pipeline.
- ``docs_patchify_contract``: the ViT patch-embedding front end —
  a deterministic 16×16 synthetic image per doc is cut into the
  4×4 grid of 4×4 patches with exact integer per-patch pixel sums
  and raster-order position ids (Dosovitskiy et al. '21 geometry:
  reshape + per-patch reduce, which is exactly what the numpy
  kernel does inside ``mapInPandas``).
- ``retrieval_ndcg_eval``: graded-relevance nDCG@10 of the IVF
  (nprobe=2) candidate ranking vs the exact-cosine ideal — recall
  (registered) counts hits; nDCG weights them by rank, which is
  what a retrieval deployment actually optimizes. Discount table
  round(1e6/log2(i+1)) embedded as literals in BOTH engines, so no
  runtime transcendentals cross the oracle boundary.
- ``corpus_source_novelty_curve``: the data-mixing Pareto frontier —
  sources ordered by mean document length (micro-exact), cumulative
  distinct-trigram count after adding each source, and each
  source's marginal novel-trigram contribution. The corpus-level
  complement of the registered per-doc ``docs_ngram_novelty``.
- ``embeddings_mutual_knn_fraction``: kNN-graph symmetry probe — on
  a constant-size hash-selected block, the share of directed kNN
  edges that are MUTUAL for k ∈ {1,2,3}; the graph-quality number
  that decides k before building a mutual-kNN clustering or
  graph-dedup stage (hubness shows up as a low mutual share).
- ``docs_deletion_propagation_contract``: GDPR deletion propagation
  — a tombstone list (doc_id ≡ 0 mod 17) anti-joined out of the
  documents table AND its derived chunk table, with an orphan check
  (chunks whose parent is gone) the oracle pins at ZERO per source.
  The Spark side runs the REAL anti-joins over a materialized chunk
  frame; the oracle prices the same counts in closed form.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import QueryFn


@dataclass(frozen=True)
class StagedQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()


STAGED: dict[str, StagedQuery] = {}

R12_BATCH: tuple[str, ...] = (
    "corpus_source_novelty_curve",
    "docs_audio_vad_segments",
    "docs_deletion_propagation_contract",
    "docs_length_ks_drift",
    "docs_patchify_contract",
    "embeddings_mutual_knn_fraction",
    "events_late_arrival_watermark_sweep",
    "events_markov_stationary",
    "lineitem_compaction_plan",
    "retrieval_ndcg_eval",
)


def promote_to_registry(names: list[str]) -> list[str]:
    """Round-12 registration in one call; ``names`` is REQUIRED —
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
# Pairwise two-sample KS drift over per-source document lengths
# --------------------------------------------------------------------


def _ks_drift_oracle() -> str:
    return """
    WITH src AS (
      SELECT source, n_chars AS v FROM documents
    ), counts AS (
      SELECT source, v, CAST(count(*) AS BIGINT) AS c
      FROM src GROUP BY 1, 2
    ), totals AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM src GROUP BY 1
    ), grid AS (
      SELECT s.source, g.v
      FROM (SELECT DISTINCT source FROM src) s
      CROSS JOIN (SELECT DISTINCT v FROM src) g
    ), cum AS (
      SELECT g.source, g.v,
             CAST(sum(COALESCE(c.c, 0)) OVER (
               PARTITION BY g.source ORDER BY g.v) AS BIGINT) AS cum_c
      FROM grid g
      LEFT JOIN counts c ON c.source = g.source AND c.v = g.v
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(max(ta.n) AS BIGINT) AS n_a,
           CAST(max(tb.n) AS BIGINT) AS n_b,
           CAST(max(abs(a.cum_c * tb.n - b.cum_c * ta.n)) * 1000000
                // (max(ta.n) * max(tb.n)) AS BIGINT) AS ks_micro
    FROM cum a
    JOIN cum b ON b.v = a.v AND a.source < b.source
    JOIN totals ta ON ta.source = a.source
    JOIN totals tb ON tb.source = b.source
    GROUP BY 1, 2
    """


@stage(
    "docs_length_ks_drift",
    oracle=_ks_drift_oracle(),
    tags=("llm", "quality", "drift"),
)
def docs_length_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample Kolmogorov–Smirnov distance between the
    per-source document-length (n_chars) distributions: for every
    source pair (a < b), KS = sup over the shared value grid of
    |ECDF_a − ECDF_b|. The registered drift family (PSI, JS
    divergence) works on FIXED BINS; KS is the order-statistic
    sup-gap that catches a mean shift or tail change the bins smear
    out — the classic monitoring pair (bin-based for attribution,
    KS for detection).

    Exactness: the sup is computed on exact integer
    cross-multiplications |cum_a·n_b − cum_b·n_a| over the union
    value grid (both ECDFs evaluated at EVERY observed value via the
    grid × source left join, so step functions are compared at all
    their jump points), one micro DIV at the end.

    Scale (100 TB): one scan to a (source, value) hash aggregate
    (value domain is doc-length — bounded and tiny vs the corpus);
    the grid, cumulative window and pair join all run on that
    aggregate's |sources|·|values| frame. The per-source cumulative
    is a partitioned window over the value-domain frame, not the
    corpus."""
    d = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("v")
    )
    counts = d.groupBy("source", "v").agg(F.count(F.lit(1)).alias("c"))
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    grid = d.select("source").distinct().crossJoin(
        F.broadcast(d.select("v").distinct())
    )
    cum = (
        grid.join(counts, ["source", "v"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .withColumn(
            "cum_c",
            F.sum("c").over(Window.partitionBy("source").orderBy("v")),
        )
    )
    a = cum.select(
        F.col("source").alias("source_a"),
        "v",
        F.col("cum_c").alias("cum_a"),
    )
    b = cum.select(
        F.col("source").alias("source_b"),
        "v",
        F.col("cum_c").alias("cum_b"),
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    return (
        a.join(b, "v")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.expr(
                "max(abs(cum_a * n_b - cum_b * n_a)) * 1000000"
                " DIV (max(n_a) * max(n_b))"
            )
            .cast("bigint")
            .alias("ks_micro"),
        )
    )


# --------------------------------------------------------------------
# Watermark-delay sweep (late-data pricing for Structured Streaming)
# --------------------------------------------------------------------

WM_DELAYS_S = (0, 60, 300, 1800)


def _watermark_sweep_oracle() -> str:
    delays = ", ".join(str(s) for s in WM_DELAYS_S)
    return f"""
    WITH e AS (
      SELECT event_type, event_id,
             date_diff('microsecond',
                       TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
      FROM events
    ), wm AS (
      SELECT event_type, ts_us,
             max(ts_us) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS wm_us
      FROM e
    )
    SELECT w.event_type,
           CAST(l.delay_s AS BIGINT) AS delay_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN w.wm_us IS NOT NULL
                          AND w.ts_us < w.wm_us - l.delay_s * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(sum(CASE WHEN w.wm_us IS NOT NULL
                          AND w.ts_us < w.wm_us - l.delay_s * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // CAST(count(*) AS BIGINT) AS late_share_micro
    FROM wm w
    CROSS JOIN (SELECT unnest([{delays}]) AS delay_s) l
    GROUP BY 1, 2
    """


@stage(
    "events_late_arrival_watermark_sweep",
    oracle=_watermark_sweep_oracle(),
    tags=("streaming", "events", "contract"),
)
def events_late_arrival_watermark_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-delay pricing: for each delay in {WM_DELAYS_S} (s),
    the exact count and share of events that a Structured-Streaming
    job with ``withWatermark("ts", delay)`` would treat as LATE —
    event time below the running maximum event time of all EARLIER
    ARRIVALS (arrival order = event_id, the ingestion-sequence
    proxy) minus the delay, tracked per event_type (the per-source
    watermark shape; Spark's global watermark is the min over
    sources, so per-source late shares upper-bound the global
    drop). This is the table read before choosing the delay: each
    row prices a candidate as dropped-data share vs state-size cost.

    Exactness: whole MICROSECONDS since the NAIVE epoch anchor in
    both engines (``timestampdiff`` on TIMESTAMP_NTZ / DuckDB
    ``date_diff`` — the repo's established timezone-proof pattern;
    integer, no second-rounding divergence); counts and one micro
    DIV.

    Scale (100 TB): one per-source window sort (keyed, parallel
    across sources — no global ordering), then a hash aggregate to
    |sources| rows fanned by the constant delay ladder. The running
    max carries one BIGINT of state per partition, the same state a
    real watermark tracker holds."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    wm = e.select(
        "event_type",
        "ts_us",
        F.max("ts_us")
        .over(
            Window.partitionBy("event_type")
            .orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("wm_us"),
    )
    ladder = spark.createDataFrame(
        [(s,) for s in WM_DELAYS_S], "delay_s long"
    )
    late = F.when(
        F.col("wm_us").isNotNull()
        & (F.col("ts_us") < F.col("wm_us") - F.col("delay_s") * 1000000),
        1,
    ).otherwise(0)
    return (
        wm.crossJoin(F.broadcast(ladder))
        .groupBy("event_type", "delay_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(late).cast("bigint").alias("n_late"),
        )
        .select(
            "event_type",
            "delay_s",
            "n_events",
            "n_late",
            F.expr("n_late * 1000000 DIV n_events").alias(
                "late_share_micro"
            ),
        )
    )


# --------------------------------------------------------------------
# Compaction planner (lakehouse OPTIMIZE bin-packing contract)
# --------------------------------------------------------------------

CMP_FILE_MOD = 40  # pseudo-file id = l_orderkey % 40 within a month
CMP_TARGET_ROWS = 2000  # compaction bin target


def _compaction_oracle() -> str:
    return f"""
    WITH files AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
             l_orderkey % {CMP_FILE_MOD} AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY 1, 2
    ), planned AS (
      SELECT ship_month, file_id, n_rows,
             COALESCE(sum(n_rows) OVER (
               PARTITION BY ship_month ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM files
    )
    SELECT ship_month,
           CAST(cum_before // {CMP_TARGET_ROWS} AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS bin_rows,
           CAST(min(file_id) AS BIGINT) AS first_file,
           CAST(max(file_id) AS BIGINT) AS last_file
    FROM planned GROUP BY 1, 2
    """


@stage(
    "lineitem_compaction_plan",
    oracle=_compaction_oracle(),
    tags=("maintenance", "lakehouse", "contract"),
)
def lineitem_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse OPTIMIZE planner as an oracle-pinned contract:
    pseudo-files (ship-month partition × orderkey-mod-{CMP_FILE_MOD}
    file id, row count as the size proxy) are packed into compaction
    bins by START-OFFSET binning — bin = (cumulative rows of all
    earlier files in the partition) DIV {CMP_TARGET_ROWS} — walking
    files in id order, exactly the deterministic single-pass
    bin-packing a Delta/Iceberg OPTIMIZE job runs per partition
    (greedy next-fit approximation; bins can overshoot by at most
    one file, never undershoot-and-split).

    Exactness: pure integer counts, window sum, integer DIV.

    Scale (100 TB): the corpus-sized work is ONE hash aggregate to
    the (partition × file) metadata frame — everything after
    (window, binning, rollup) runs on file METADATA, which is how a
    real planner works too (it reads the manifest, not the data).
    The window is partitioned by ship_month: parallel across
    partitions, no global sort."""
    li = load(spark, sf_dir, "lineitem").select(
        F.trunc("l_shipdate", "month").alias("ship_month"),
        (F.col("l_orderkey") % CMP_FILE_MOD).alias("file_id"),
    )
    files = li.groupBy("ship_month", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    planned = files.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("n_rows").over(
                Window.partitionBy("ship_month")
                .orderBy("file_id")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return (
        planned.groupBy(
            "ship_month",
            F.expr(f"cum_before DIV {CMP_TARGET_ROWS}")
            .cast("bigint")
            .alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("bin_rows"),
            F.min("file_id").cast("bigint").alias("first_file"),
            F.max("file_id").cast("bigint").alias("last_file"),
        )
    )


# --------------------------------------------------------------------
# Markov stationary distribution (8 exact power-iteration steps)
# --------------------------------------------------------------------

MKV_STEPS = 8


def _markov_stationary_oracle() -> str:
    steps = []
    prev = "v0"
    for k in range(1, MKV_STEPS + 1):
        steps.append(
            f"""v{k} AS (
      SELECT s.s, CAST(COALESCE(m.v, 0) AS BIGINT) AS v
      FROM states s LEFT JOIN (
        SELECT p.dst AS s,
               CAST(sum({prev}.v * p.p_micro // 1000000) AS BIGINT) AS v
        FROM {prev} JOIN p ON p.src = {prev}.s GROUP BY 1
      ) m ON m.s = s.s
    )"""
        )
        prev = f"v{k}"
    chain = ", ".join(steps)
    last, second = f"v{MKV_STEPS}", f"v{MKV_STEPS - 1}"
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ), trans AS (
      SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), rowtot AS (
      SELECT src, CAST(sum(c) AS BIGINT) AS tot FROM trans GROUP BY 1
    ), p AS (
      SELECT t.src, t.dst,
             CAST(t.c * 1000000 // r.tot AS BIGINT) AS p_micro
      FROM trans t JOIN rowtot r USING (src)
    ), states AS (
      SELECT DISTINCT src AS s FROM trans
    ), nk AS (
      SELECT CAST(count(*) AS BIGINT) AS k FROM states
    ), v0 AS (
      SELECT s.s, CAST(1000000 // nk.k AS BIGINT) AS v
      FROM states s CROSS JOIN nk
    ), {chain}
    SELECT a.s AS event_type,
           CAST(a.v AS BIGINT) AS prob_micro,
           CAST(abs(a.v - b.v) AS BIGINT) AS delta_micro
    FROM {last} a JOIN {second} b ON b.s = a.s
    """


@stage(
    "events_markov_stationary",
    oracle=_markov_stationary_oracle(),
    tags=("events", "graph", "iterative"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary visit-share of the user-journey Markov chain:
    {MKV_STEPS} exact power-iteration steps v·P from the uniform
    start over the row-normalized (micro units) transition matrix of
    consecutive per-user event types — the same matrix the
    registered ``events_markov_transitions`` reports — plus the
    step-{MKV_STEPS} vs step-{MKV_STEPS}−1 L1 gap per state as the
    convergence certificate. The chain is substochastic where a
    state ends sessions (mass exits), matching absorbing-journey
    semantics. This is the PageRank recurrence on behavioral data;
    the iterative-algorithm pattern is shared with the registered
    ``nation_trade_pagerank``.

    Exactness: each step's contribution is (v_i · p_ij) DIV 1e6 in
    BIGINT — both engines walk bit-identical integer trajectories,
    so an 8-step composition stays hash-comparable. States with no
    inbound edges are kept at 0 via the states-frame left join
    (never silently dropped).

    Scale (100 TB): the corpus-sized work is ONE per-user window
    (lead) and ONE hash aggregate to the |states|² matrix;
    all {MKV_STEPS} iterations run on the ≤|states|² frame —
    driver-side loop over broadcast-sized joins, zero collect, the
    registered PageRank shape."""
    e = load(spark, sf_dir, "events")
    seq = e.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rowtot = trans.groupBy("src").agg(F.sum("c").alias("tot"))
    p = (
        trans.join(rowtot, "src")
        .select(
            "src", "dst", F.expr("c * 1000000 DIV tot").alias("p_micro")
        )
        .localCheckpoint(eager=True)
    )
    states = p.select(F.col("src").alias("s")).distinct()
    nk = states.agg(F.count(F.lit(1)).alias("k"))
    v = states.crossJoin(F.broadcast(nk)).select(
        "s", F.expr("1000000 DIV k").cast("bigint").alias("v")
    )
    prev = None
    for _ in range(MKV_STEPS):
        prev = v
        stepped = (
            v.join(p, v["s"] == p["src"])
            .groupBy(F.col("dst").alias("s"))
            .agg(
                F.sum(F.expr("v * p_micro DIV 1000000"))
                .cast("bigint")
                .alias("v")
            )
        )
        v = states.join(stepped, "s", "left").select(
            "s", F.coalesce("v", F.lit(0)).cast("bigint").alias("v")
        )
    return (
        v.select(F.col("s").alias("event_type"), F.col("v").alias("prob_micro"))
        .join(
            prev.select(
                F.col("s").alias("event_type"), F.col("v").alias("v_prev")
            ),
            "event_type",
        )
        .select(
            "event_type",
            "prob_micro",
            F.abs(F.col("prob_micro") - F.col("v_prev"))
            .cast("bigint")
            .alias("delta_micro"),
        )
    )
