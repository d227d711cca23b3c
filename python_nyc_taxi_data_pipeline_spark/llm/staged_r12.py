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


# --------------------------------------------------------------------
# Audio VAD segments (energy-gate segmentation, gaps-and-islands)
# --------------------------------------------------------------------

VAD_N_DOCS = 150
VAD_WIN = 16  # disjoint windows (clip lengths are multiples of 16)
VAD_THRESH = 87000  # energy gate; ~48% of fixture windows are voiced


def _vad_oracle() -> str:
    return f"""
    WITH clips AS (
      SELECT doc_id, 64 + (doc_id % 7) * 16 AS len
      FROM documents WHERE doc_id < {VAD_N_DOCS}
    ), wins AS (
      SELECT c.doc_id,
             CAST(w.w AS BIGINT) AS win_idx,
             list_reduce(list_transform(
               range(w.w * {VAD_WIN}, (w.w + 1) * {VAD_WIN}),
               t -> ((c.doc_id * 13 + t * 7) % 256 - 128)
                    * ((c.doc_id * 13 + t * 7) % 256 - 128)),
               (a, b) -> a + b) AS energy
      FROM clips c, LATERAL (
        SELECT unnest(range(0, c.len // {VAD_WIN})) AS w
      ) w
    ), voiced AS (
      SELECT doc_id, win_idx,
             win_idx - row_number() OVER (
               PARTITION BY doc_id ORDER BY win_idx) AS isl
      FROM wins WHERE energy > {VAD_THRESH}
    ), runs AS (
      SELECT doc_id, isl, CAST(count(*) AS BIGINT) AS run_len
      FROM voiced GROUP BY 1, 2
    ), per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(max(run_len) AS BIGINT) AS longest_voiced_run,
             CAST(sum(run_len) AS BIGINT) AS n_voiced
      FROM runs GROUP BY 1
    ), totals AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
      FROM wins GROUP BY 1
    )
    SELECT t.doc_id, t.n_windows,
           COALESCE(p.n_voiced, 0) AS n_voiced,
           COALESCE(p.n_segments, 0) AS n_segments,
           COALESCE(p.longest_voiced_run, 0) AS longest_voiced_run,
           COALESCE(p.n_voiced, 0) * 1000000 // t.n_windows
             AS voiced_share_micro
    FROM totals t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    """


@stage(
    "docs_audio_vad_segments",
    oracle=_vad_oracle(),
    tags=("llm", "multimodal", "audio"),
)
def docs_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-gate voice-activity detection (VAD) over the r11 audio
    clips (same deterministic PCM-ish synthesis: length
    64 + (id%7)·16, byte t = (id·13 + t·7) mod 256): disjoint
    {VAD_WIN}-byte windows, a window is VOICED when its centered
    energy sum((byte−128)²) exceeds {VAD_THRESH} (≈ the fixture
    median, so both classes occur), and segments are MAXIMAL VOICED
    RUNS found by gaps-and-islands — the segmentation pass between
    decode and feature extraction in every speech pipeline (the
    frame-level energy gate of classical VAD, cf. webrtcvad's
    tiering), reporting per clip: window/voiced counts, segment
    count, longest run, voiced share.

    Exactness: all integers (centered squares, counts, one micro
    DIV); island ids use only relative position arithmetic so
    0-based and 1-based row numbering agree.

    Scale (100 TB): the synthesis+window+energy fan-out happens
    inside one ``mapInPandas`` (numpy reshape, zero shuffle); the
    only shuffles are a per-clip window sort (keyed, parallel across
    clips) and two hash aggregates to clip granularity."""
    doc_ids = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < VAD_N_DOCS
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("win_idx", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )
    win = VAD_WIN

    def energize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                length = 64 + (did % 7) * 16
                clip = (did * 13 + np.arange(length, dtype=np.int64) * 7) % 256
                nw = length // win
                energy = ((clip[: nw * win].reshape(nw, win) - 128) ** 2).sum(
                    axis=1
                )
                out.extend((did, w, int(energy[w])) for w in range(nw))
            yield pd.DataFrame(out, columns=["doc_id", "win_idx", "energy"])

    wins = doc_ids.mapInPandas(energize, out_schema)
    voiced = wins.filter(F.col("energy") > VAD_THRESH).select(
        "doc_id",
        (
            F.col("win_idx")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("win_idx")
            )
        ).alias("isl"),
    )
    runs = voiced.groupBy("doc_id", "isl").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    per_doc = runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.max("run_len").cast("bigint").alias("longest_voiced_run"),
        F.sum("run_len").cast("bigint").alias("n_voiced"),
    )
    totals = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows")
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_voiced", F.lit(0)).cast("bigint").alias("n_voiced"),
            F.coalesce("n_segments", F.lit(0))
            .cast("bigint")
            .alias("n_segments"),
            F.coalesce("longest_voiced_run", F.lit(0))
            .cast("bigint")
            .alias("longest_voiced_run"),
        )
        .withColumn(
            "voiced_share_micro",
            F.expr("n_voiced * 1000000 DIV n_windows"),
        )
    )


# --------------------------------------------------------------------
# ViT patchify contract (patch grid geometry, oracle-checked)
# --------------------------------------------------------------------

PAT_N_DOCS = 150
PAT_IMG = 16  # synthetic image is PAT_IMG x PAT_IMG pixels
PAT_P = 4  # patch side -> (PAT_IMG/PAT_P)^2 = 16 patches per image


def _patchify_oracle() -> str:
    g = PAT_IMG // PAT_P
    return f"""
    WITH imgs AS (
      SELECT doc_id FROM documents WHERE doc_id < {PAT_N_DOCS}
    ), patches AS (
      SELECT i.doc_id,
             CAST(pr.pr AS BIGINT) AS patch_row,
             CAST(pc.pc AS BIGINT) AS patch_col
      FROM imgs i,
           LATERAL (SELECT unnest(range(0, {g})) AS pr) pr,
           LATERAL (SELECT unnest(range(0, {g})) AS pc) pc
    )
    SELECT doc_id, patch_row, patch_col,
           patch_row * {g} + patch_col AS patch_id,
           CAST(list_reduce(list_transform(range(0, {PAT_P * PAT_P}),
                  t -> (doc_id * 131
                        + (patch_col * {PAT_P} + t % {PAT_P}) * 7
                        + (patch_row * {PAT_P} + t // {PAT_P}) * 13) % 256),
                (a, b) -> a + b) AS BIGINT) AS pix_sum,
           CAST(list_reduce(list_transform(range(0, {PAT_P * PAT_P}),
                  t -> (doc_id * 131
                        + (patch_col * {PAT_P} + t % {PAT_P}) * 7
                        + (patch_row * {PAT_P} + t // {PAT_P}) * 13) % 256),
                (a, b) -> a + b) // {PAT_P * PAT_P} AS BIGINT) AS mean_floor,
           CAST((doc_id * 131 + patch_col * {PAT_P} * 7
                 + patch_row * {PAT_P} * 13) % 256 AS BIGINT) AS first_pix
    FROM patches
    """


@stage(
    "docs_patchify_contract",
    oracle=_patchify_oracle(),
    tags=("llm", "multimodal", "contract"),
)
def docs_patchify_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ViT patch-embedding front end as an oracle-pinned
    contract (Dosovitskiy et al. '21): a deterministic
    {PAT_IMG}×{PAT_IMG} synthetic image per doc (pixel(x,y) =
    (id·131 + x·7 + y·13) mod 256 — the multimodal fixture formula
    family) is cut into the {PAT_P}×{PAT_P}-pixel patch grid, and
    each patch is reduced to its exact integer pixel sum, floor
    mean, top-left pixel, and RASTER-ORDER position id (row·grid +
    col — the position-embedding index). The numpy kernel is the
    real ViT patchify: reshape(grid, P, grid, P) + sum over axes
    (1,3); the oracle replays the geometry in closed form, so a
    transposed patch axis, a column-major raster, or an off-by-one
    patch offset all hash-mismatch.

    Exactness: all integers by construction.

    Scale (100 TB): zero shuffle — synthesis, reshape and reduction
    all happen inside ONE ``mapInPandas`` stage; output is a
    constant 16 rows per image."""
    doc_ids = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < PAT_N_DOCS
    )
    g = PAT_IMG // PAT_P

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("patch_row", T.LongType()),
            T.StructField("patch_col", T.LongType()),
            T.StructField("patch_id", T.LongType()),
            T.StructField("pix_sum", T.LongType()),
            T.StructField("mean_floor", T.LongType()),
            T.StructField("first_pix", T.LongType()),
        ]
    )
    img, p = PAT_IMG, PAT_P

    def patchify(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        gg = img // p
        xs = np.arange(img, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                # pixel(x, y) with x = column, y = row
                grid = (did * 131 + xs[None, :] * 7 + xs[:, None] * 13) % 256
                sums = grid.reshape(gg, p, gg, p).sum(axis=(1, 3))
                for pr in range(gg):
                    for pc in range(gg):
                        s = int(sums[pr, pc])
                        out.append(
                            (
                                did,
                                pr,
                                pc,
                                pr * gg + pc,
                                s,
                                s // (p * p),
                                int(grid[pr * p, pc * p]),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "patch_row",
                    "patch_col",
                    "patch_id",
                    "pix_sum",
                    "mean_floor",
                    "first_pix",
                ],
            )

    return doc_ids.mapInPandas(patchify, out_schema)


# --------------------------------------------------------------------
# Deletion propagation contract (GDPR tombstones through derived data)
# --------------------------------------------------------------------

DEL_MOD = 17  # tombstones: doc_id % 17 == 0
DPC_CHUNK_W = 6  # derived chunk table: 6-word windows ...
DPC_STRIDE = 3  # ... at stride 3 (full windows only)


def _deletion_oracle() -> str:
    return f"""
    WITH docs AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS nw,
             CASE WHEN doc_id % {DEL_MOD} = 0 THEN 1 ELSE 0 END AS del
      FROM documents
    ), enriched AS (
      SELECT doc_id, source, del,
             CASE WHEN nw >= {DPC_CHUNK_W}
                  THEN 1 + (nw - {DPC_CHUNK_W}) // {DPC_STRIDE}
                  ELSE 0 END AS n_chunks
      FROM docs
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_before,
           CAST(sum(1 - del) AS BIGINT) AS n_docs_after,
           CAST(sum(n_chunks) AS BIGINT) AS n_chunks_before,
           CAST(sum(CASE WHEN del = 0 THEN n_chunks ELSE 0 END)
                AS BIGINT) AS n_chunks_after,
           CAST(0 AS BIGINT) AS n_orphan_chunks
    FROM enriched GROUP BY source
    """


@stage(
    "docs_deletion_propagation_contract",
    oracle=_deletion_oracle(),
    tags=("llm", "governance", "contract"),
)
def docs_deletion_propagation_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GDPR deletion propagation: a tombstone list (doc_id ≡ 0 mod
    {DEL_MOD} — the right-to-be-forgotten batch) is applied to the
    documents table AND to a derived chunk table ({DPC_CHUNK_W}-word
    windows at stride {DPC_STRIDE}, the RAG-chunk shape) via
    LEFT ANTI joins, then audited: per source, row counts before and
    after on both tables plus the ORPHAN count — chunks that
    survived although their parent doc was deleted — which the
    oracle pins at ZERO. The Spark side does the real work (the
    chunk frame is materialized by posexplode and the orphan count
    comes from an actual anti-join of survivors against surviving
    parents); the oracle prices the same counts in closed form, so
    a propagation bug (deletes applied to one table, not the other;
    key drift between the frames) breaks the hash.

    Exactness: pure integer counts; chunk counts follow the
    full-window formula 1 + (n_words − W) DIV stride.

    Scale (100 TB): the tombstone side of every anti-join is the
    deletion batch (bounded, broadcastable); the chunk fan-out is a
    projection-side explode (no shuffle); the audit is one hash
    aggregate per table to |sources| rows plus one anti-join whose
    right side is doc-key metadata."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("nw")
    )
    tomb = d.filter(F.col("doc_id") % DEL_MOD == 0).select("doc_id")
    chunks = d.filter(F.col("nw") >= DPC_CHUNK_W).select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("nw") - DPC_CHUNK_W) / DPC_STRIDE).cast("int"),
            )
        ).alias("chunk_idx"),
    )
    docs_after = d.join(tomb, "doc_id", "left_anti")
    chunks_after = chunks.join(tomb, "doc_id", "left_anti")
    orphans = chunks_after.join(
        docs_after.select("doc_id"), "doc_id", "left_anti"
    )

    docs_stats = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_before")
    )
    docs_after_stats = docs_after.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_after")
    )
    chunk_stats = chunks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks_before")
    )
    chunk_after_stats = chunks_after.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks_after")
    )
    orphan_stats = orphans.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orphan_chunks")
    )
    return (
        docs_stats.join(docs_after_stats, "source", "left")
        .join(chunk_stats, "source", "left")
        .join(chunk_after_stats, "source", "left")
        .join(orphan_stats, "source", "left")
        .select(
            "source",
            "n_docs_before",
            F.coalesce("n_docs_after", F.lit(0))
            .cast("bigint")
            .alias("n_docs_after"),
            F.coalesce("n_chunks_before", F.lit(0))
            .cast("bigint")
            .alias("n_chunks_before"),
            F.coalesce("n_chunks_after", F.lit(0))
            .cast("bigint")
            .alias("n_chunks_after"),
            F.coalesce("n_orphan_chunks", F.lit(0))
            .cast("bigint")
            .alias("n_orphan_chunks"),
        )
    )


# --------------------------------------------------------------------
# nDCG@10 of the IVF candidate ranking (graded-relevance retrieval eval)
# --------------------------------------------------------------------

NDCG_K = 10
NDCG_N_CENTROIDS = 8  # deterministic codebook: vec_id < 8 (PQ convention)
NDCG_N_PROBES = 10  # bounded probe block (md5 >= 'e6', the split)
NDCG_NPROBE = 2  # lists visited by the evaluated IVF configuration

# Discount table round(1e6 / log2(i+1)), i = 1..K — computed ONCE in
# Python and embedded as integer literals in BOTH engines, so no
# runtime transcendental ever crosses the oracle boundary.
NDCG_DISC_MICRO: tuple[int, ...] = tuple(
    round(1_000_000 / math.log2(i + 1)) for i in range(1, NDCG_K + 1)
)
# Ideal grades: exact ranks 1-2 -> 3, 3-5 -> 2, 6-10 -> 1 (fixed), so
# the ideal DCG is a CONSTANT for every probe.
NDCG_GRADES: tuple[int, ...] = (3, 3, 2, 2, 2, 1, 1, 1, 1, 1)
NDCG_IDCG_MICRO: int = sum(
    g * d for g, d in zip(NDCG_GRADES, NDCG_DISC_MICRO)
)


def _ndcg_oracle() -> str:
    from .staged_r11 import _COS_MICRO_SQL

    hh = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 2)"
    cos_pc = _COS_MICRO_SQL.format(a="p", b="c")
    cos_pn = _COS_MICRO_SQL.format(a="p", b="n")
    cos_vc = _COS_MICRO_SQL.format(a="v", b="c")
    disc_rows = ", ".join(
        f"({i + 1}, {d})" for i, d in enumerate(NDCG_DISC_MICRO)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, {hh} AS hh,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), vecs AS (
      SELECT vec_id, hh, v,
             sqrt(list_reduce(list_transform(v, x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM e
    ), cents AS (
      SELECT vec_id AS cid, v, nrm FROM vecs
      WHERE vec_id < {NDCG_N_CENTROIDS}
    ), probes AS (
      SELECT vec_id AS probe_id, v, nrm FROM vecs
      WHERE hh >= 'e6' ORDER BY vec_id LIMIT {NDCG_N_PROBES}
    ), assign AS (
      SELECT v.vec_id, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY {cos_vc} DESC, c.cid) AS rn
      FROM vecs v CROSS JOIN cents c
    ), cluster_of AS (
      SELECT vec_id, cid AS cluster FROM assign WHERE rn = 1
    ), probed AS (
      SELECT p.probe_id, c.cid
      FROM probes p CROSS JOIN cents c
      QUALIFY row_number() OVER (PARTITION BY p.probe_id
                                 ORDER BY {cos_pc} DESC, c.cid)
              <= {NDCG_NPROBE}
    ), truth AS (
      SELECT p.probe_id, n.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY p.probe_id
                                ORDER BY {cos_pn} DESC, n.vec_id) AS rk
      FROM probes p JOIN vecs n ON n.vec_id <> p.probe_id
      QUALIFY rk <= {NDCG_K}
    ), grades AS (
      SELECT probe_id, neighbor_id,
             CASE WHEN rk <= 2 THEN 3 WHEN rk <= 5 THEN 2 ELSE 1 END AS g
      FROM truth
    ), cands AS (
      SELECT pr.probe_id, co.vec_id,
             row_number() OVER (PARTITION BY pr.probe_id
                                ORDER BY {cos_pn} DESC, co.vec_id) AS pos,
             count(*) OVER (PARTITION BY pr.probe_id) AS n_candidates
      FROM probed pr
      JOIN cluster_of co ON co.cluster = pr.cid
      JOIN probes p ON p.probe_id = pr.probe_id
      JOIN vecs n ON n.vec_id = co.vec_id
      WHERE co.vec_id <> pr.probe_id
    ), top AS (
      SELECT c.probe_id, c.pos, c.n_candidates,
             COALESCE(g.g, 0) AS g
      FROM cands c
      LEFT JOIN grades g ON g.probe_id = c.probe_id
                        AND g.neighbor_id = c.vec_id
      WHERE c.pos <= {NDCG_K}
    )
    SELECT t.probe_id,
           CAST(max(t.n_candidates) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN t.g > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           CAST(sum(t.g * d.disc) AS BIGINT) AS dcg_micro,
           CAST(sum(t.g * d.disc) * 1000000 // {NDCG_IDCG_MICRO}
                AS BIGINT) AS ndcg_micro
    FROM top t
    JOIN (VALUES {disc_rows}) AS d(pos, disc) ON d.pos = t.pos
    GROUP BY t.probe_id
    """


@stage(
    "retrieval_ndcg_eval",
    oracle=_ndcg_oracle(),
    tags=("llm", "retrieval", "eval"),
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded-relevance nDCG@{NDCG_K} of the IVF (nprobe={NDCG_NPROBE})
    candidate ranking against the exact-cosine ideal: per probe, the
    true top-{NDCG_K} by exact quantized cosine carry graded
    relevance (ranks 1-2 -> 3, 3-5 -> 2, 6-10 -> 1 — the
    Jarvelin-Kekalainen graded-gain shape), the IVF configuration's
    candidate list (corpus vectors in the probe's top-{NDCG_NPROBE}
    inverted lists) is ranked by the same exact cosine, and DCG sums
    grade x discount over the first {NDCG_K} positions. Recall
    (registered ``embeddings_ivf_recall_probe_curve``) counts hits;
    nDCG weights them by RANK - the number a retrieval deployment
    actually optimizes. Because the ideal grade vector is fixed, the
    ideal DCG is the constant {NDCG_IDCG_MICRO} (micro), and
    ndcg_micro = dcg x 1e6 DIV that constant.

    Exactness: cosines are 6-dp-rounded micro ints (the established
    margin-mining pattern); the log2 discount table is
    round(1e6/log2(i+1)) embedded as INTEGER LITERALS in both
    engines - no runtime transcendentals cross the oracle boundary.

    Scale (100 TB): the corpus is touched exactly twice, both times
    streaming against broadcast constant-size frames (the codebook;
    the probe block) - the registered IVF-recall shape; candidate
    ranking is a per-probe top-k window over the probed lists'
    members only."""
    from .similarity import _dot, _norm

    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2).alias("hh"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).select("vec_id", "hh", "v", _norm(F.col("v")).alias("nrm"))

    def cos_micro(av, anrm, bv, bnrm) -> Column:
        return F.round(
            F.round(_dot(av, bv) / (anrm * bnrm), 6) * 1e6, 0
        ).cast("bigint")

    cents = vecs.filter(F.col("vec_id") < NDCG_N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    probes = (
        vecs.filter(F.col("hh") >= "e6")
        .orderBy("vec_id")
        .limit(NDCG_N_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("v").alias("pv"),
            F.col("nrm").alias("pnrm"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("c_micro"), F.asc("cid")
    )
    cluster_of = (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cid",
            cos_micro(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cnrm"))
            .alias("c_micro"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cluster"))
    )
    w_probe = Window.partitionBy("probe_id").orderBy(
        F.desc("c_micro"), F.asc("cid")
    )
    probed = (
        probes.crossJoin(F.broadcast(cents))
        .select(
            "probe_id",
            "cid",
            cos_micro(F.col("pv"), F.col("pnrm"), F.col("cv"), F.col("cnrm"))
            .alias("c_micro"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= NDCG_NPROBE)
        .select("probe_id", F.col("cid").alias("cluster"))
    )
    w_truth = Window.partitionBy("probe_id").orderBy(
        F.desc("c_micro"), F.asc("vec_id")
    )
    truth = (
        vecs.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            cos_micro(F.col("pv"), F.col("pnrm"), F.col("v"), F.col("nrm"))
            .alias("c_micro"),
        )
        .withColumn("rk", F.row_number().over(w_truth))
        .filter(F.col("rk") <= NDCG_K)
    )
    grades = truth.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.when(F.col("rk") <= 2, 3)
        .when(F.col("rk") <= 5, 2)
        .otherwise(1)
        .alias("g"),
    )
    # candidate set: members of the probed inverted lists, ranked by
    # the SAME exact cosine (broadcast the bounded probe block)
    w_cand = Window.partitionBy("probe_id").orderBy(
        F.desc("c_micro"), F.asc("vec_id")
    )
    cands = (
        cluster_of.join(F.broadcast(probed), "cluster")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .join(
            F.broadcast(
                probes.select("probe_id", "pv", "pnrm")
            ),
            "probe_id",
        )
        .join(vecs.select("vec_id", "v", "nrm"), "vec_id")
        .select(
            "probe_id",
            "vec_id",
            cos_micro(F.col("pv"), F.col("pnrm"), F.col("v"), F.col("nrm"))
            .alias("c_micro"),
        )
        .withColumn("pos", F.row_number().over(w_cand))
        .withColumn(
            "n_candidates",
            F.count(F.lit(1)).over(Window.partitionBy("probe_id")),
        )
    )
    disc = spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(NDCG_DISC_MICRO)],
        "pos int, disc long",
    )
    top = (
        cands.filter(F.col("pos") <= NDCG_K)
        .join(
            grades,
            (cands["probe_id"] == grades["probe_id"])
            & (cands["vec_id"] == grades["neighbor_id"]),
            "left",
        )
        .select(
            cands["probe_id"].alias("probe_id"),
            "pos",
            "n_candidates",
            F.coalesce(grades["g"], F.lit(0)).alias("g"),
        )
        .join(F.broadcast(disc), "pos")
    )
    return (
        top.groupBy("probe_id")
        .agg(
            F.max("n_candidates").cast("bigint").alias("n_candidates"),
            F.sum((F.col("g") > 0).cast("int")).cast("bigint").alias("n_hits"),
            F.sum(F.col("g") * F.col("disc")).cast("bigint").alias("dcg_micro"),
        )
        .withColumn(
            "ndcg_micro",
            F.expr(f"dcg_micro * 1000000 DIV {NDCG_IDCG_MICRO}").cast(
                "bigint"
            ),
        )
    )


# --------------------------------------------------------------------
# Source novelty curve (data-mixing Pareto frontier)
# --------------------------------------------------------------------


def _novelty_curve_oracle() -> str:
    return """
    WITH stot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) * 1000000
               // CAST(count(*) AS BIGINT) AS mean_chars_micro
      FROM documents GROUP BY 1
    ), ranked AS (
      SELECT a.source, a.n_docs, a.mean_chars_micro,
             CAST(1 + count(b.source) AS BIGINT) AS source_rank
      FROM stot a
      LEFT JOIN stot b
        ON b.mean_chars_micro > a.mean_chars_micro
        OR (b.mean_chars_micro = a.mean_chars_micro
            AND b.source < a.source)
      GROUP BY 1, 2, 3
    ), ws AS (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ), tris AS (
      SELECT DISTINCT source,
             unnest(list_transform(
               generate_series(1, len(w) - 2),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tri
      FROM ws
    ), first_rank AS (
      SELECT t.tri, min(r.source_rank) AS fr
      FROM tris t JOIN ranked r USING (source) GROUP BY t.tri
    ), novel AS (
      SELECT fr AS source_rank, CAST(count(*) AS BIGINT) AS n_novel
      FROM first_rank GROUP BY 1
    ), pres AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tris
      FROM tris GROUP BY 1
    )
    SELECT r.source_rank, r.source, r.n_docs, r.mean_chars_micro,
           p.n_tris,
           COALESCE(n.n_novel, 0) AS n_novel,
           CAST(sum(COALESCE(n.n_novel, 0)) OVER (
             ORDER BY r.source_rank) AS BIGINT) AS cum_distinct
    FROM ranked r
    JOIN pres p USING (source)
    LEFT JOIN novel n ON n.source_rank = r.source_rank
    """


@stage(
    "corpus_source_novelty_curve",
    oracle=_novelty_curve_oracle(),
    tags=("llm", "mixture", "novelty"),
)
def corpus_source_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixing Pareto frontier: sources ordered by mean
    document length (micro-exact integer, ties by name — the
    quality-proxy ordering a mixture designer walks), then for each
    prefix of that order, the cumulative count of distinct word
    trigrams and each source's MARGINAL novel-trigram contribution
    (trigrams whose best — minimum — source rank is that source).
    The corpus-level complement of the registered per-doc
    ``docs_ngram_novelty``: that curve prices adding a DOC, this one
    prices adding a SOURCE, which is the granularity mixture weights
    are chosen at (cf. the source-level dedup/novelty accounting in
    RefinedWeb and Dolma).

    Exactness: counts, integer micro mean, min-rank first-seen; the
    trailing cumulative window runs ORDER BY source_rank over a
    |sources|-row frame in both engines (deterministic: rank is a
    bijection); the rank itself is a broadcast theta self-join
    count, NOT a global window, so no corpus-scale single-partition
    exchange exists in the plan.

    Scale (100 TB): one scan to a (source, tri) DISTINCT hash
    aggregate (Zipf-compressed), one (tri -> min rank) aggregate,
    then everything is |sources|-sized. The final cumulative window
    IS single-partition — over exactly |sources| rows of source
    metadata, the planner frame, never row data."""
    d = load(spark, sf_dir, "documents")
    stot = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(n_chars) * 1000000 DIV count(*)")
        .cast("bigint")
        .alias("mean_chars_micro"),
    )
    a = stot.alias("a")
    b = stot.select(
        F.col("source").alias("b_source"),
        F.col("mean_chars_micro").alias("b_mean"),
    )
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("b_mean") > F.col("mean_chars_micro"))
            | (
                (F.col("b_mean") == F.col("mean_chars_micro"))
                & (F.col("b_source") < F.col("source"))
            ),
            "left",
        )
        .groupBy("source", "n_docs", "mean_chars_micro")
        .agg((F.count("b_source") + 1).cast("bigint").alias("source_rank"))
    )
    ws = d.filter(F.size(F.split("text", " ")) >= 3).select(
        "source", F.split("text", " ").alias("w")
    )
    tris = ws.select(
        "source",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(w) - 2),"
                    " i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"
                )
            )
        ).alias("tri"),
    ).distinct()
    first_rank = (
        tris.join(F.broadcast(ranked.select("source", "source_rank")), "source")
        .groupBy("tri")
        .agg(F.min("source_rank").alias("fr"))
    )
    novel = first_rank.groupBy(F.col("fr").alias("source_rank")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    pres = tris.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tris")
    )
    curve = (
        ranked.join(pres, "source")
        .join(F.broadcast(novel), "source_rank", "left")
        .withColumn(
            "n_novel", F.coalesce("n_novel", F.lit(0)).cast("bigint")
        )
    )
    # cumulative over the |sources|-row metadata frame (benign by
    # construction; see docstring) — via a second theta self-join to
    # keep the plan free of ANY single-partition window exchange.
    cum_src = curve.select(
        F.col("source_rank").alias("c_rank"),
        F.col("n_novel").alias("c_novel"),
    )
    return (
        curve.join(
            F.broadcast(cum_src), F.col("c_rank") <= F.col("source_rank")
        )
        .groupBy(
            "source_rank", "source", "n_docs", "mean_chars_micro",
            "n_tris", "n_novel",
        )
        .agg(F.sum("c_novel").cast("bigint").alias("cum_distinct"))
    )


# --------------------------------------------------------------------
# Mutual-kNN fraction (kNN-graph symmetry probe)
# --------------------------------------------------------------------

MKNN_BLOCK = 128  # constant-size hash-selected node block
MKNN_KS = (1, 2, 3)


def _mutual_knn_oracle() -> str:
    from .staged_r11 import _COS_MICRO_SQL

    hh = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 2)"
    cos_ab = _COS_MICRO_SQL.format(a="a", b="b")
    ks = ", ".join(str(k) for k in MKNN_KS)
    return f"""
    WITH e AS (
      SELECT vec_id, {hh} AS hh,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), vecs AS (
      SELECT vec_id, hh, v,
             sqrt(list_reduce(list_transform(v, x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM e
    ), block AS (
      SELECT vec_id, v, nrm FROM vecs
      WHERE hh >= 'a0' ORDER BY vec_id LIMIT {MKNN_BLOCK}
    ), knn AS (
      SELECT a.vec_id AS u, b.vec_id AS nb,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {cos_ab} DESC, b.vec_id) AS rk
      FROM block a JOIN block b ON b.vec_id <> a.vec_id
    ), paired AS (
      SELECT f.u, f.nb, f.rk AS rk_uv, r.rk AS rk_vu
      FROM knn f JOIN knn r ON r.u = f.nb AND r.nb = f.u
    )
    SELECT CAST(kk.k AS BIGINT) AS k,
           CAST(sum(CASE WHEN p.rk_uv <= kk.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_edges,
           CAST(sum(CASE WHEN p.rk_uv <= kk.k AND p.rk_vu <= kk.k
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mutual,
           CAST(sum(CASE WHEN p.rk_uv <= kk.k AND p.rk_vu <= kk.k
                    THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // CAST(sum(CASE WHEN p.rk_uv <= kk.k THEN 1 ELSE 0 END)
                     AS BIGINT) AS mutual_share_micro
    FROM paired p
    CROSS JOIN (SELECT unnest([{ks}]) AS k) kk
    GROUP BY kk.k
    """


@stage(
    "embeddings_mutual_knn_fraction",
    oracle=_mutual_knn_oracle(),
    tags=("llm", "similarity", "graph"),
)
def embeddings_mutual_knn_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """kNN-graph symmetry probe: on a constant-size hash-selected
    node block ({MKNN_BLOCK} vectors, md5 ≥ 'a0' — the established
    hash-split), the share of directed kNN edges that are MUTUAL
    (u ∈ kNN(v) AND v ∈ kNN(u)) for k ∈ {MKNN_KS}. Mutual-kNN is
    the edge rule of choice for graph dedup and agglomerative
    embedding clustering precisely because asymmetric edges mark
    HUBS (a vector that is everyone's neighbor while reciprocating
    none) — a low mutual share at small k says the space is hubby
    and k must grow (or hubness-normalize, as the registered
    margin-mining query does). This is the number you read before
    building the graph.

    Exactness: 6-dp-rounded micro-quantized cosines with vec_id
    tie-breaks (the margin-mining pattern); counts; one micro DIV.

    Scale (100 TB): the block is CONSTANT-SIZE (a statistical probe
    of graph symmetry, not a corpus enumeration — the sample
    estimates the mutual share the way the registered LSH recall
    eval estimates recall); all-pairs work is {MKNN_BLOCK}² rows
    inside one broadcast self-join, independent of corpus size."""
    from .similarity import _dot, _norm

    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2).alias("hh"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).select("vec_id", "hh", "v", _norm(F.col("v")).alias("nrm"))
    block = (
        vecs.filter(F.col("hh") >= "a0")
        .orderBy("vec_id")
        .limit(MKNN_BLOCK)
        .select("vec_id", "v", "nrm")
    )
    other = block.select(
        F.col("vec_id").alias("nb"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
    )
    w_rank = Window.partitionBy("u").orderBy(F.desc("c_micro"), F.asc("nb"))
    knn = (
        block.select(
            F.col("vec_id").alias("u"), F.col("v").alias("av"),
            F.col("nrm").alias("anrm"),
        )
        .join(F.broadcast(other), F.col("nb") != F.col("u"))
        .select(
            "u",
            "nb",
            F.round(
                F.round(
                    _dot(F.col("av"), F.col("bv"))
                    / (F.col("anrm") * F.col("bnrm")),
                    6,
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("c_micro"),
        )
        .withColumn("rk", F.row_number().over(w_rank))
        .select("u", "nb", "rk")
    )
    rev = knn.select(
        F.col("nb").alias("u"),
        F.col("u").alias("nb"),
        F.col("rk").alias("rk_vu"),
    )
    paired = knn.join(rev, ["u", "nb"]).select(
        F.col("rk").alias("rk_uv"), "rk_vu"
    )
    ladder = spark.createDataFrame([(k,) for k in MKNN_KS], "k long")
    return (
        paired.crossJoin(F.broadcast(ladder))
        .groupBy("k")
        .agg(
            F.sum((F.col("rk_uv") <= F.col("k")).cast("int"))
            .cast("bigint")
            .alias("n_edges"),
            F.sum(
                (
                    (F.col("rk_uv") <= F.col("k"))
                    & (F.col("rk_vu") <= F.col("k"))
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_mutual"),
        )
        .select(
            "k",
            "n_edges",
            "n_mutual",
            F.expr("n_mutual * 1000000 DIV n_edges").alias(
                "mutual_share_micro"
            ),
        )
    )
