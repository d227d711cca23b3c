"""Second analytics battery: full window-function surface, time-range
rolling frames, array aggregation, deterministic hash splits, and
document chunking for LLM-data pipelines.

Extends `plans/analytics.py` (the reference's only window op is the
ROW_NUMBER dedup, `silver_full_refresh_transformation.sql:40-49`; these
cover the rest of the analytic-window family Spark provides).

Scale rules:
- all windows partition on a real key (user_id / priority) — no
  unpartitioned global windows, which serialize onto one task;
- array aggregation emits sorted arrays joined to strings so results
  are deterministic under any shuffle order;
- the hash split derives from md5 — stable across engines, runs,
  and cluster sizes (never ``rand()``, which breaks retry idempotency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "window_rank_battery",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(rank()         OVER w AS INT)  AS price_rank,
           CAST(dense_rank()   OVER w AS INT)  AS price_dense_rank,
           CAST(ntile(4)       OVER w AS INT)  AS price_quartile,
           round(percent_rank() OVER w, 6)     AS price_pct_rank,
           round(cume_dist()    OVER w, 6)     AS price_cume_dist
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-rank family (rank / dense_rank / ntile /
    percent_rank / cume_dist) in one pass over one window spec — one
    shuffle on the partition key serves all five functions. The
    orderkey tie-break makes every rank deterministic."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-02-01 00:00:00").cast("timestamp_ntz"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


@register(
    "events_rolling_1h_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / count(*) OVER w, 4) AS avg_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("window", "time-range"),
)
def events_rolling_1h_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour average (trailing event-time frame) —
    the feature-engineering staple. Spark's RANGE frame needs a numeric
    sort key, so the frame runs over whole seconds since a NAIVE epoch
    anchor (timestampdiff on TIMESTAMP_NTZ — unlike unix_timestamp it
    never consults the session timezone, so a driver session running in
    any tz gets identical frames); DECIMAL accumulation inside the
    frame keeps the moving sum order-independent. One shuffle on
    user_id; the frame scan is a single sorted pass."""
    e = load(spark, sf_dir, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    w = Window.partitionBy("user_id").orderBy(sec).rangeBetween(-3600, 0)
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w),
                4,
            ).alias("avg_value_1h"),
        )
        .orderBy("event_id")
    )


@register(
    "events_user_profile_arrays",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
             AS event_types,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "array"),
)
def events_user_profile_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-user distinct event-type profile.
    collect_set is shuffle-order-dependent, so the array is sorted then
    serialized — the deterministic form any downstream exact-dedup or
    feature hash needs. Single hash aggregate on user_id."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
                "event_types"
            ),
            F.count_distinct("event_type").alias("n_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "docs_hash_split",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hh
      FROM documents
    )
    SELECT CASE WHEN hh < 'cd' THEN 'train'
                WHEN hh < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM h
    GROUP BY split
    ORDER BY split
    """,
    tags=("llm", "split"),
)
def docs_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by md5 of the
    document id — stable across engines, re-runs, and cluster sizes,
    unlike rand()-based splits which break retry idempotency and
    cross-system reproducibility. The hex-prefix comparison ('cd' =
    205/256 ≈ 0.80, 'e6' = 230/256 ≈ 0.90) keeps the whole derivation
    inside codegen'd string ops — no UDF."""
    d = load(spark, sf_dir, "documents")
    hh = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(hh < "cd", "train").when(hh < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


CHUNK_SIZE = 40  # words per chunk
CHUNK_STRIDE = 20  # 50% overlap


@register(
    "docs_chunk_sliding",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             CAST(i AS INT) AS chunk_id,
             array_to_string(
               list_slice(w, i * {CHUNK_STRIDE} + 1,
                          i * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' ') AS chunk_text
      FROM words,
           UNNEST(range(0, greatest(1,
             CAST(ceil((len(w) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS BIGINT) + 1
           ))) AS t(i)
    )
    SELECT doc_id, chunk_id, chunk_text,
           CAST(len(string_split(chunk_text, ' ')) AS INT) AS chunk_words
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
    tags=("llm", "text", "chunking"),
)
def docs_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (40-word chunks, 20-word
    stride) — the context-window preparation step before embedding or
    tokenization. The chunk index sequence is computed per document and
    exploded; slicing stays in JVM array functions, so the operator is
    a narrow map + explode with no shuffle (rows fan out in place)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("w") - F.lit(CHUNK_SIZE)) / F.lit(float(CHUNK_STRIDE))).cast(
            "long"
        )
        + F.lit(1),
    )
    chunks = d.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    chunk_text = F.concat_ws(
        " ", F.slice(F.col("w"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    )
    return (
        chunks.select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            chunk_text.alias("chunk_text"),
        )
        .withColumn("chunk_words", F.size(F.split("chunk_text", " ")).cast("int"))
        .orderBy("doc_id", "chunk_id")
    )


# Content-defined chunking: a word is a cut point when its md5 starts
# with this nibble → P(boundary) = 1/16, mean chunk ≈ 16 words. The
# boundary depends only on the WORD, so an insertion/deletion shifts
# only its own chunk (and at most merges/splits at the nearest cut) —
# the CDC robustness property fixed-stride chunking lacks, and the
# reason storage/dataset dedup (LBFS/FastCDC lineage) uses it.
CDC_BOUNDARY_NIBBLE = "0"


@register(
    "docs_cdc_chunks",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), tok AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS word
      FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
    ), flagged AS (
      SELECT doc_id, pos, word,
             CASE WHEN substr(md5(word), 1, 1) = '{CDC_BOUNDARY_NIBBLE}'
                  THEN 1 ELSE 0 END AS is_b
      FROM tok
    ), cut AS (
      SELECT doc_id, pos, word,
             CAST(coalesce(SUM(is_b) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS chunk_id
      FROM flagged
    ), chunks AS (
      SELECT doc_id, chunk_id,
             CAST(count(*) AS BIGINT) AS n_words,
             md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
      FROM cut GROUP BY doc_id, chunk_id
    ), counts AS (
      SELECT chunk_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_sharing
      FROM chunks GROUP BY chunk_hash
    )
    SELECT doc_id, chunk_id, n_words, chunk_hash, n_docs_sharing
    FROM chunks JOIN counts USING (chunk_hash)
    """,
    tags=("llm", "text", "chunking", "dedup"),
)
def docs_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + cross-document chunk dedup signal:
    cut each document where a word's md5 starts with
    '{CDC_BOUNDARY_NIBBLE}' (content-derived boundaries — robust to
    insertions, unlike fixed stride), hash each chunk, and report how
    many documents share each chunk hash. Shared chunks are the
    sub-document duplication (boilerplate/quotation) signal that
    document-level near-dup misses and span-level n-grams pay more to
    find.

    Plan: chunking is a single map-side ``aggregate`` fold over the
    split array — the boundary scan is per-document SEQUENTIAL logic,
    so it never needs the explode → per-doc window → collect_list
    round-trip (two full-corpus shuffles: the window sort and the
    chunk re-assembly) the naive plan pays; the fold closes a chunk
    the moment its boundary word arrives, entirely inside the scan
    stage. The only shuffle left is the hash-keyed count join. All
    shuffle keys are 16-byte hashes or (doc_id, chunk_id) ints."""
    d = load(spark, sf_dir, "documents")
    # struct(done: closed chunks, cur: open chunk); a boundary word is
    # the LAST word of its chunk (matches the oracle's 1-PRECEDING
    # prefix sum); a trailing open chunk is flushed by the finisher,
    # and a trailing boundary leaves cur empty — no empty chunk.
    chunk_fold = F.expr(
        "aggregate("
        "  split(text, ' '),"
        "  struct(CAST(array() AS ARRAY<ARRAY<STRING>>) AS done,"
        "         CAST(array() AS ARRAY<STRING>) AS cur),"
        f"  (acc, w) -> IF(substr(md5(w), 1, 1) = '{CDC_BOUNDARY_NIBBLE}',"
        "      struct(array_append(acc.done, array_append(acc.cur, w)) AS done,"
        "             CAST(array() AS ARRAY<STRING>) AS cur),"
        "      struct(acc.done AS done,"
        "             array_append(acc.cur, w) AS cur)),"
        "  acc -> IF(size(acc.cur) > 0,"
        "            array_append(acc.done, acc.cur), acc.done))"
    )
    chunks = d.select(
        "doc_id", F.posexplode(chunk_fold).alias("chunk_id", "cw")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("cw").cast("long").alias("n_words"),
        F.md5(F.concat_ws(" ", F.col("cw"))).alias("chunk_hash"),
    )
    counts = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs_sharing")
    )
    return chunks.join(counts, "chunk_hash").select(
        "doc_id", "chunk_id", "n_words", "chunk_hash", "n_docs_sharing"
    )


@register(
    "events_gaps_islands",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, event_type, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id, event_type,
           min(ts) AS island_start, max(ts) AS island_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, island_id, event_type
    HAVING count(*) >= 3
    ORDER BY user_id, island_id
    """,
    tags=("window", "sequence"),
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive identical
    event_type per user (the classic sequence-segmentation shape —
    session stitching, state-change detection, run-length encoding).
    Two window passes over ONE partitioning (user_id) — Spark plans a
    single shuffle + sort reused by both windows — then a hash agg on
    the derived island id. The event_id tie-break makes runs
    deterministic when timestamps collide."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_type",
        "ts",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("is_start"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("island_id", F.sum("is_start").over(wcum))
    return (
        islands.groupBy("user_id", "island_id", "event_type")
        .agg(
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("n_events") >= 3)
        .orderBy("user_id", "island_id")
    )


@register(
    "orders_stats_moments",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(EXTRACT(year FROM o_orderdate) - 1995 AS DECIMAL(18,2)))
                  AS DOUBLE) AS sy,
             CAST(SUM(CAST(EXTRACT(year FROM o_orderdate) - 1995 AS DECIMAL(18,2))
                      * CAST(EXTRACT(year FROM o_orderdate) - 1995 AS DECIMAL(18,2)))
                  AS DOUBLE) AS syy,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(EXTRACT(year FROM o_orderdate) - 1995 AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxy
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           round(sx / n, 4) AS mean_price,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_price,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS corr_price_year
    FROM s
    ORDER BY o_orderpriority
    """,
    tags=("agg", "statistics"),
)
def orders_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority mean / sample stddev / Pearson correlation (price vs
    order year) computed FROM EXACT DECIMAL MOMENT SUMS rather than the
    builtin float accumulators: Σx, Σx², Σxy accumulate losslessly
    (DECIMAL products at their natural scale fit comfortably in 38
    digits), so the derived statistics are identical doubles on any
    partitioning and in both engines — the oracle-checkable way to do
    distributed statistics. Builtin ``stddev``/``corr`` stream partial
    float moments whose merge order varies run to run; here the only
    float ops happen once, on the driver-visible final row."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    y = (F.year("o_orderdate") - F.lit(1995)).cast("decimal(18,2)")
    agg = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    n = F.col("n")
    sx, sxx, sy, syy, sxy = (F.col(c) for c in ("sx", "sxx", "sy", "syy", "sxy"))
    return (
        agg.select(
            "o_orderpriority",
            "n",
            F.round(sx / n, 4).alias("mean_price"),
            F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 4).alias("stddev_price"),
            F.round(
                (n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
                6,
            ).alias("corr_price_year"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    )
    SELECT 'l1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM s1
    UNION ALL
    SELECT 'l2_click', CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT 'l3_purchase', CAST(count(*) AS BIGINT) FROM s3
    ORDER BY stage
    """,
    tags=("sequence", "funnel"),
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → later click → later purchase):
    users surviving each stage, where stage N counts only events AFTER
    the user's stage-N−1 time — the product-analytics staple that needs
    per-user sequential logic, not independent filters.

    Layout: one shuffle on user_id serves all three stages (each stage
    is a groupBy(user_id) over the already-partitioned events, and the
    stage joins are user_id-to-user_id so Spark reuses the
    partitioning). Stage outputs shrink monotonically, but they are
    still per-user tables (SF-scaled), so no forced broadcast — AQE
    converts the later joins to broadcast at runtime while the
    surviving-user sets fit the threshold."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # Each stage feeds BOTH the next stage and its own count branch,
    # and Spark plans (and executes) every occurrence separately — the
    # r10 plan held 12 parquet scans with zero ReusedExchange. Pinning
    # each stage's per-user table executes every stage exactly once
    # (r11; localCheckpoint is MEMORY_AND_DISK, so an SF-scaled stage
    # table spills rather than OOMs at size).
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=True)
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=True)
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = [
        s1.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit("l1_view").alias("stage"), "users"
        ),
        s2.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit("l2_click").alias("stage"), "users"
        ),
        s3.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit("l3_purchase").alias("stage"), "users"
        ),
    ]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out.orderBy("stage")


@register(
    "events_user_slope_sql",
    oracle="""
    WITH m AS (
      SELECT user_id,
             count(*) AS n,
             CAST(SUM(CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                           AS DECIMAL(12,0))) AS DOUBLE) AS st,
             CAST(SUM(CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                           AS DECIMAL(12,0))
                      * CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                             AS DECIMAL(12,0))) AS DOUBLE) AS stt,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                           AS DECIMAL(12,0))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS stv
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, n,
           round(CASE WHEN n * stt - st * st = 0 THEN 0.0
                      ELSE 3600.0 * (n * stv - st * sv) / (n * stt - st * st)
                 END, 6) AS value_slope_per_hour
    FROM m
    ORDER BY user_id
    """,
    tags=("agg", "statistics", "regression"),
)
def events_user_slope_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares slope of value over event time, closed
    form from exact decimal moment sums — the SQL-native twin of the
    applyInPandas ``events_user_trend`` demo. One hash aggregate, no
    Python workers, hash-stable under any partitioning (the moments
    are exact; the final slope arithmetic runs on identical doubles in
    both engines). Seconds are naive (timestampdiff on NTZ) so any
    driver session timezone produces the same result."""
    e = load(spark, sf_dir, "events")
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
    ).cast("decimal(12,0)")
    val = F.col("value").cast("decimal(18,6)")
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sec).cast("double").alias("st"),
        F.sum(sec * sec).cast("double").alias("stt"),
        F.sum(val).cast("double").alias("sv"),
        F.sum(sec * val).cast("double").alias("stv"),
    )
    n, st, stt, sv, stv = (F.col(c) for c in ("n", "st", "stt", "sv", "stv"))
    denom = n * stt - st * st
    slope = F.when(denom == 0, F.lit(0.0)).otherwise(
        F.lit(3600.0) * (n * stv - st * sv) / denom
    )
    return (
        m.select("user_id", "n", F.round(slope, 6).alias("value_slope_per_hour"))
        .orderBy("user_id")
    )


@register(
    "events_hourly_anomaly",
    oracle="""
    WITH buckets AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(n_events) AS BIGINT) AS s1,
             CAST(sum(n_events * n_events) AS BIGINT) AS s2
      FROM buckets GROUP BY event_type
    )
    SELECT b.event_type, b.hour, b.n_events,
           round((b.n_events - CAST(s.s1 AS DOUBLE) / s.n_buckets)
                 / sqrt(CAST(s.s2 AS DOUBLE) / s.n_buckets
                        - (CAST(s.s1 AS DOUBLE) / s.n_buckets)
                          * (CAST(s.s1 AS DOUBLE) / s.n_buckets)), 6)
             AS z_score,
           CAST(abs((b.n_events - CAST(s.s1 AS DOUBLE) / s.n_buckets)
                    / sqrt(CAST(s.s2 AS DOUBLE) / s.n_buckets
                           - (CAST(s.s1 AS DOUBLE) / s.n_buckets)
                             * (CAST(s.s1 AS DOUBLE) / s.n_buckets))) >= 2.0
                AS BOOLEAN) AS is_anomaly
    FROM buckets b
    JOIN stats s ON s.event_type = b.event_type
    WHERE s.s2 * s.n_buckets > s.s1 * s.s1
    ORDER BY b.event_type, b.hour
    """,
    tags=("agg", "time-series", "observability"),
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: z-score of each (event_type, hour)
    bucket's event count against that type's own hourly distribution —
    the standard ops alarm for traffic spikes/outages.

    Statistics come from EXACT integer moments (Σc, Σc² over buckets
    as BIGINT — partitioning-independent, same convention as
    ``orders_stats_moments``); only the final mean/σ/z are doubles,
    with identical expression structure in both engines so the 6-dp
    round is bit-stable. Plan: one groupBy to hourly buckets, one
    per-type agg over the (types × hours)-sized bucket table, broadcast
    join back — the corpus is scanned once. Zero-variance types are
    excluded by the exact integer inequality s2·n > s1² (never a float
    comparison)."""
    e = load(spark, sf_dir, "events")
    buckets = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    stats = buckets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("n_events").cast("bigint").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_buckets")
    var = F.col("s2").cast("double") / F.col("n_buckets") - mean * mean
    z = (F.col("n_events") - mean) / F.sqrt(var)
    # No broadcast hint: stats is grouped by event_type (a derivative
    # of an SF-scaled table, not provably bounded) — AQE broadcasts it
    # from size stats, per the r4 hint-hygiene rule.
    return (
        buckets.join(stats, "event_type")
        .filter(F.col("s2") * F.col("n_buckets") > F.col("s1") * F.col("s1"))
        .select(
            "event_type",
            "hour",
            "n_events",
            F.round(z, 6).alias("z_score"),
            (F.abs(z) >= 2.0).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_cum_users_hll_merge",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts)) AS m
      FROM events GROUP BY user_id
    ), new_per_month AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_new_users
      FROM first_seen GROUP BY m
    ), months AS (
      SELECT DISTINCT date_trunc('day', ts) AS m FROM events
    )
    SELECT mo.m AS day,
           CAST(coalesce(np.n_new_users, 0) AS BIGINT) AS n_new_users,
           CAST((SELECT sum(n_new_users) FROM new_per_month x
                 WHERE x.m <= mo.m) AS BIGINT) AS cum_users_exact,
           TRUE AS hll_merge_within_10pct
    FROM months mo LEFT JOIN new_per_month np ON np.m = mo.m
    ORDER BY day
    """,
    tags=("agg", "approx", "incremental"),
)
def events_cum_users_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch re-aggregation: per-DAY HLL sketches of the
    user population are UNIONED cumulatively (sketch merge, not data
    re-scan) to estimate day-end cumulative distinct users — the
    incremental-rollup pattern that makes distinct counts maintainable
    at 100 TB: persist one small sketch per day-partition, union on read,
    never rescan history.

    Contract shape (cf. ``agg_approx_distinct``): the sketch estimate
    is engine-specific, so the row carries the EXACT cumulative count
    (first-appearance days → cumulative sum) plus a boolean asserting
    the merged-sketch estimate lands within 10%; the oracle recomputes
    the exact side and expects TRUE.

    Plan: per-day sketch agg is one map-side-combined pass; the
    cumulative union joins the ~30-row sketch table to itself (m2 ≤ m1)
    instead of a global-window scan — no SinglePartition exchange."""
    e = load(spark, sf_dir, "events")
    month = F.date_trunc("day", "ts").alias("m")
    sketches = (
        e.select(month, "user_id")
        .groupBy("m")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .localCheckpoint(eager=True)  # ≤ months rows; reused both sides
    )
    cum_hll = (
        sketches.alias("a")
        .join(sketches.alias("b"), F.col("b.m") <= F.col("a.m"))
        .groupBy(F.col("a.m").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("b.sk"))).alias(
                "cum_users_hll"
            )
        )
    )
    first_seen = (
        e.select("user_id", month)
        .groupBy("user_id")
        .agg(F.min("m").alias("m"))
    )
    new_per_month = first_seen.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_users")
    ).localCheckpoint(eager=True)
    months = e.select(month).distinct().localCheckpoint(eager=True)
    # Cumulative sum anchored on ALL days (a sparse day list would drop
    # rows on the inner join: with few users every first-appearance can
    # land on day 1). Day 1 always has >= 1 new user, so the inner
    # <=-join never loses a day.
    cum_exact = (
        months.select(F.col("m").alias("day"))
        .join(new_per_month.alias("y"), F.col("y.m") <= F.col("day"))
        .groupBy("day")
        .agg(F.sum(F.col("y.n_new_users")).cast("bigint").alias("cum_users_exact"))
    )
    return (
        months.select(F.col("m").alias("day"))
        .join(
            new_per_month.select(F.col("m").alias("day"), "n_new_users"),
            "day",
            "left",
        )
        .join(cum_exact, "day")
        .join(cum_hll, "day")
        .select(
            "day",
            F.coalesce(F.col("n_new_users"), F.lit(0)).cast("bigint").alias(
                "n_new_users"
            ),
            "cum_users_exact",
            (
                F.abs(F.col("cum_users_hll") - F.col("cum_users_exact"))
                <= F.greatest(F.lit(2.0), F.col("cum_users_exact") * 0.10)
            ).alias("hll_merge_within_10pct"),
        )
        .orderBy("day")
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT f.cohort_day,
             CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts))
                  AS INT) AS age_days,
             e.user_id
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
    ), cohort_sizes AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first_seen GROUP BY cohort_day
    )
    SELECT a.cohort_day, a.age_days,
           CAST(count(*) AS BIGINT) AS n_retained,
           s.cohort_size,
           round(count(*) / CAST(s.cohort_size AS DOUBLE), 6)
             AS retention_rate
    FROM activity a JOIN cohort_sizes s ON s.cohort_day = a.cohort_day
    GROUP BY a.cohort_day, a.age_days, s.cohort_size
    ORDER BY a.cohort_day, a.age_days
    """,
    tags=("agg", "time-series"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, each
    later active day counted as (cohort, age) retention — THE product
    analytics workload, and a shape the rest of the battery lacks (an
    aggregate keyed on a dimension derived from the fact table itself).

    Plan: first-seen is one user-keyed agg; the fact re-join shuffles
    on user_id (same key — no extra exchange under co-partitioning);
    the distinct collapses each user to one row per (cohort, age)
    before the count, bounding the final agg at users × active-days.
    retention_rate is one IEEE division rounded 6 dp."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    first_seen = (
        e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "cohort_day",
            F.datediff(day, F.col("cohort_day")).cast("int").alias("age_days"),
            "user_id",
        )
        .distinct()
    )
    cohort_sizes = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_day", "age_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_retained"))
        .join(cohort_sizes, "cohort_day")
        .select(
            "cohort_day",
            "age_days",
            "n_retained",
            "cohort_size",
            F.round(
                F.col("n_retained") / F.col("cohort_size").cast("double"), 6
            ).alias("retention_rate"),
        )
        .orderBy("cohort_day", "age_days")
    )
