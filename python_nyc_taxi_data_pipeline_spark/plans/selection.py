"""Data-selection operators for training-corpus construction: DSIR
importance weighting, deterministic global shuffle/sharding, and a
cross-source vocabulary-overlap matrix.

These extend the curation suite (``plans.curation``, ``plans.sampling``)
with the *selection* stage of a large-scale pretraining pipeline:

- **DSIR importance weights** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): score every raw document
  by the log-likelihood ratio of its hashed-n-gram features under a
  target distribution vs the raw distribution, then keep the top
  scorers. The entire method is two aggregations and one broadcast
  join — no model, no Python.
- **Deterministic global shuffle → shard manifest**: the "shuffle the
  corpus before training" step, done as a *pure function of the data*
  (md5 permutation key) so any engine, any cluster size, any retry
  produces byte-identical shards. The manifest carries a
  permutation-sensitive checksum so the oracle verifies the ORDER, not
  just membership.
- **Source overlap matrix**: pairwise Jaccard similarity of source
  vocabularies (hashed bigrams) — the standard diagnostic before
  choosing mixture weights (near-duplicate sources shouldn't both get
  full weight).

Determinism contract: every fractional quantity that decides ordering
or is emitted is either (a) an integer (micro-units via
``round(x*1e6)``), or (b) a single IEEE double op (one division)
rounded to 6 dp — bit-identical across Spark and DuckDB. Log-ratio
scores are quantized to integer micro-nats BEFORE the per-doc sum, so
the sum is exact integer arithmetic and order-independent.

Scale notes (100 TB):
- DSIR: token explode → ONE map-side-combined aggregation into B=64
  feature buckets (the feature table is O(B), broadcast back); the
  per-doc score join touches each doc's distinct buckets only. No
  global sort — top-k is TakeOrderedAndProject.
- Shuffle shards: at cluster scale the window-per-shard becomes
  ``repartitionByRange(key)`` + per-partition running counts (the same
  distributed prefix-sum machinery as ``plans.curation`` packing); the
  window form here is what the oracle can verify exactly.
- Source overlap: the inverted-index self-join's posting lists are
  bounded by the number of SOURCES per bigram (≤ |sources|, by
  ``distinct``), not document frequency — the pair fan-out is
  O(vocab · |sources|²) with |sources| small and known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

DSIR_BUCKETS = 64
DSIR_TARGET_LANG = "en"
DSIR_TOP_K = 100
N_SHARDS = 16


def _tokens(d: DataFrame) -> DataFrame:
    """doc_id, lang, tok — lower-cased whitespace tokens."""
    return (
        d.select("doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )


def _bucket(col):
    """First 32 bits of md5 → bucket id in [0, DSIR_BUCKETS)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % DSIR_BUCKETS
    )


@register(
    "docs_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, tok
      FROM (SELECT doc_id, lang,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), bucketed AS (
      SELECT doc_id, lang,
             CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
                  % {DSIR_BUCKETS} AS BIGINT) AS bucket
      FROM toks
    ), feat AS (
      SELECT bucket,
             count(*) AS cnt_raw,
             count(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS cnt_tgt
      FROM bucketed GROUP BY bucket
    ), feat_lr AS (
      SELECT bucket,
             CAST(round(ln(
               ((cnt_tgt + 1.0) * (sum(cnt_raw) OVER () + {DSIR_BUCKETS}))
               / ((cnt_raw + 1.0) * (sum(cnt_tgt) OVER () + {DSIR_BUCKETS}))
             ) * 1000000.0, 0) AS BIGINT) AS lr_micro
      FROM feat
    ), doc_buckets AS (
      SELECT doc_id, bucket, count(*) AS n
      FROM bucketed GROUP BY doc_id, bucket
    )
    SELECT d.doc_id,
           CAST(sum(d.n) AS BIGINT) AS n_tokens,
           CAST(sum(d.n * f.lr_micro) AS BIGINT) AS score_micro
    FROM doc_buckets d JOIN feat_lr f USING (bucket)
    GROUP BY d.doc_id
    ORDER BY score_micro DESC, doc_id
    LIMIT {DSIR_TOP_K}
    """,
    tags=("llm", "selection", "curation"),
)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: hashed-unigram importance weights.

    Features are md5-hashed token buckets (B={DSIR_BUCKETS}); the target
    distribution is the '{DSIR_TARGET_LANG}' slice, the raw distribution
    is the whole corpus. Each doc's score is the add-one-smoothed
    log-likelihood ratio of its bucket counts, in integer micro-nats
    (quantized per-bucket, so the per-doc sum is exact and
    order-independent). Top-{DSIR_TOP_K} docs by score.

    Plan shape: one explode → one agg (map-side combined) to the B-row
    feature table → window-free smoothing (tiny table) → broadcast join
    back → per-doc sum → TakeOrderedAndProject.
    """
    d = load(spark, sf_dir, "documents")
    bucketed = _tokens(d).select("doc_id", "lang", _bucket(F.col("tok")).alias("bucket"))
    feat = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt_raw"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("cnt_tgt"),
    )
    # Global token totals as a scalar aggregate broadcast back onto the
    # B-row feature table (partial-agg-then-merge; no global window).
    totals = feat.agg(
        F.sum("cnt_raw").alias("tot_raw"), F.sum("cnt_tgt").alias("tot_tgt")
    )
    lr = F.log(
        ((F.col("cnt_tgt") + 1.0) * (F.col("tot_raw") + DSIR_BUCKETS))
        / ((F.col("cnt_raw") + 1.0) * (F.col("tot_tgt") + DSIR_BUCKETS))
    )
    feat_lr = feat.crossJoin(F.broadcast(totals)).select(
        "bucket", F.round(lr * 1000000.0, 0).cast("bigint").alias("lr_micro")
    )
    doc_buckets = bucketed.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        doc_buckets.join(F.broadcast(feat_lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.sum(F.col("n") * F.col("lr_micro")).cast("bigint").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(DSIR_TOP_K)
    )


@register(
    "docs_shuffle_shards",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(CAST(('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 4))
                       AS UBIGINT) % {N_SHARDS} AS INT) AS shard_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), ordered AS (
      SELECT shard_id, doc_id, n_tokens,
             row_number() OVER (PARTITION BY shard_id ORDER BY k, doc_id) AS rn
      FROM keyed
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
           CAST(sum(rn * doc_id) AS BIGINT) AS perm_checksum
    FROM ordered
    GROUP BY shard_id
    ORDER BY shard_id
    """,
    tags=("llm", "selection", "sharding"),
)
def docs_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard manifest.

    Every doc gets a permutation key md5('shuffle:'||doc_id); the first
    16 bits route it to one of {N_SHARDS} shards and the full key orders
    it within the shard. The manifest emits per-shard doc/token counts
    plus ``perm_checksum = Σ rank·doc_id`` — a position-sensitive
    checksum, so the oracle match proves the exact within-shard ORDER,
    not merely shard membership.

    At 100 TB the same key drives ``repartitionByRange(k)`` with
    per-partition running counts (the curation prefix-sum machinery);
    here one window per shard-partition is the oracle-verifiable form —
    it shuffles each row once, same as the range repartition would.
    """
    d = load(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    keyed = d.select(
        "doc_id",
        k.alias("k"),
        (F.conv(F.substring(k, 1, 4), 16, 10).cast("bigint") % N_SHARDS)
        .cast("int")
        .alias("shard_id"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard_id").orderBy("k", "doc_id")
    ordered = keyed.withColumn("rn", F.row_number().over(w))
    return (
        ordered.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
            F.sum(F.col("rn") * F.col("doc_id")).cast("bigint").alias("perm_checksum"),
        )
        .orderBy("shard_id")
    )


@register(
    "docs_source_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS t
      FROM documents
    ), bigrams AS (
      SELECT DISTINCT source, bg
      FROM (SELECT source,
                   unnest(list_transform(
                     list_zip(t[1:len(t) - 1], t[2:len(t)]),
                     p -> p[1] || ' ' || p[2])) AS bg
            FROM toks)
    ), per_source AS (
      SELECT source, count(*) AS n_terms FROM bigrams GROUP BY source
    ), shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS shared_terms
      FROM bigrams a JOIN bigrams b
        ON a.bg = b.bg AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           CAST(shared_terms AS BIGINT) AS shared_terms,
           CAST(pa.n_terms AS BIGINT) AS terms_a,
           CAST(pb.n_terms AS BIGINT) AS terms_b,
           round(CAST(shared_terms AS DOUBLE)
                 / (pa.n_terms + pb.n_terms - shared_terms), 6) AS jaccard
    FROM shared
    JOIN per_source pa ON pa.source = source_a
    JOIN per_source pb ON pb.source = source_b
    ORDER BY jaccard DESC, source_a, source_b
    """,
    tags=("llm", "selection", "dedup"),
)
def docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap (bigram Jaccard) between sources —
    the pre-mixture diagnostic for redundant corpora.

    Inverted-index pair emit: distinct (source, bigram) rows self-join
    on the bigram. Posting lists are bounded by |sources| (distinct-by
    construction), so the fan-out is O(vocab·|sources|²) — NOT document
    frequency — and |sources| is small and known; no df-ceiling needed.
    Per-source term counts (|sources| rows) join onto the pair
    aggregate (AQE broadcasts them from size stats — no forced hint on
    a data-dependent-cardinality aggregate). Jaccard is one IEEE
    division rounded to 6 dp — bit-identical cross-engine.
    """
    d = load(spark, sf_dir, "documents")
    t = F.split(F.lower("text"), " ")
    bigrams = (
        d.select(
            "source",
            F.explode(
                F.zip_with(
                    F.slice(t, 1, F.size(t) - 1),
                    F.slice(t, 2, F.size(t) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bg"),
        )
        .distinct()
        # Three consumers (per-source counts + both pair sides) — pin
        # the corpus explode + distinct once instead of 3x (r11; the
        # same staging a production run does before a self-join).
        .localCheckpoint(eager=True)
    )
    per_source = bigrams.groupBy("source").agg(F.count(F.lit(1)).alias("n_terms"))
    a = bigrams.select(F.col("source").alias("source_a"), "bg")
    b = bigrams.select(F.col("source").alias("source_b"), "bg")
    shared = (
        a.join(b, "bg")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_terms"))
    )
    pa = per_source.select(
        F.col("source").alias("source_a"), F.col("n_terms").alias("terms_a")
    )
    pb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_terms").alias("terms_b")
    )
    # No broadcast hints: per-source counts are grouped by source
    # (data-dependent cardinality) — AQE picks broadcast from stats.
    return (
        shared.join(pa, "source_a")
        .join(pb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("shared_terms").cast("bigint").alias("shared_terms"),
            F.col("terms_a").cast("bigint").alias("terms_a"),
            F.col("terms_b").cast("bigint").alias("terms_b"),
            F.round(
                F.col("shared_terms").cast("double")
                / (F.col("terms_a") + F.col("terms_b") - F.col("shared_terms")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "source_a", "source_b")
    )


MIX_TEMPERATURE = 0.3  # alpha of p^alpha sampling (XLM-R / mT5 convention)


@register(
    "docs_lang_temperature_mixture",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS DOUBLE) AS total,
             sum(pow(n_tokens / CAST((SELECT sum(n_tokens) FROM per_lang) AS DOUBLE),
                     {MIX_TEMPERATURE})) AS z
      FROM per_lang
    )
    SELECT p.lang, p.n_tokens,
           round(p.n_tokens / t.total, 6) AS actual_frac,
           round(pow(p.n_tokens / t.total, {MIX_TEMPERATURE}) / t.z, 6) AS temp_frac,
           round((pow(p.n_tokens / t.total, {MIX_TEMPERATURE}) / t.z)
                 / (p.n_tokens / t.total), 6) AS sample_weight
    FROM per_lang p, tot t
    ORDER BY p.lang
    """,
    tags=("llm", "selection", "sampling"),
)
def docs_lang_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (q_l ∝ p_l^α, α={MIX_TEMPERATURE})
    — the standard multilingual-pretraining rebalance (XLM-R, mT5):
    α < 1 upsamples low-resource languages without flattening to
    uniform. Complements ``docs_mixture_weights`` (uniform target,
    doc-based): this one is TOKEN-based and temperature-parameterized.

    Plan: per-lang token totals (one scan, map-side combined), a 1-row
    scalar aggregate for the normalizer, broadcast back — no window, no
    second scan. pow/÷ are double ops rounded at 6 dp; the normalizer
    sums |langs| ≈ 5 doubles whose order-sensitivity is ~1e-16
    relative — far below the rounding grain (same precedent as the ln
    quantization in ``docs_dsir_weights``)."""
    d = load(spark, sf_dir, "documents")
    per_lang = (
        d.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"))
        .localCheckpoint(eager=True)  # tiny; reused by normalizer + projection
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("double").alias("total"))
    with_frac = per_lang.crossJoin(F.broadcast(tot)).withColumn(
        "p", F.col("n_tokens") / F.col("total")
    )
    z = with_frac.agg(
        F.sum(F.pow(F.col("p"), MIX_TEMPERATURE)).alias("z")
    )
    return (
        with_frac.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_tokens",
            F.round(F.col("p"), 6).alias("actual_frac"),
            F.round(F.pow(F.col("p"), MIX_TEMPERATURE) / F.col("z"), 6).alias(
                "temp_frac"
            ),
            F.round(
                (F.pow(F.col("p"), MIX_TEMPERATURE) / F.col("z")) / F.col("p"), 6
            ).alias("sample_weight"),
        )
        .orderBy("lang")
    )


@register(
    "corpus_health_report",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, lang, md5(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_texts,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM per_doc
    ), lang_probs AS (
      SELECT lang, count(*) AS n FROM per_doc GROUP BY lang
    ), ent AS (
      SELECT sum(
               -(n / CAST((SELECT n_docs FROM base) AS DOUBLE))
               * ln(n / CAST((SELECT n_docs FROM base) AS DOUBLE))
             ) AS lang_entropy_raw
      FROM lang_probs
    )
    SELECT b.n_docs, b.total_tokens, b.n_langs,
           round(CAST(b.n_docs - b.n_distinct_texts AS DOUBLE) / b.n_docs, 6)
             AS exact_dup_frac,
           round(CAST(b.total_tokens AS DOUBLE) / b.n_docs, 6)
             AS mean_doc_tokens,
           round(e.lang_entropy_raw, 6) AS lang_entropy_nats
    FROM base b, ent e
    """,
    tags=("llm", "selection", "observability"),
)
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health dashboard: doc/token volume, exact-dup
    fraction (1 − distinct text hashes / docs), mean doc length, and
    the Shannon entropy of the language mixture (nats) — the
    at-a-glance numbers a curation run is judged by before and after
    each stage.

    Plan: a single documents scan feeds two map-side-combined
    aggregates (global counts incl. approx-free exact distinct on the
    16-byte md5, and per-lang counts) joined by broadcast — no window,
    no second scan. The entropy sums |langs| ≈ 5 ln terms — the only
    order-sensitive float; ~1e-16 relative, far below the 6-dp round
    (same precedent as ``docs_dsir_weights``)."""
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    base = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.countDistinct("h").cast("bigint").alias("n_distinct_texts"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    lang_probs = per_doc.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ent = (
        lang_probs.crossJoin(F.broadcast(base.select("n_docs")))
        .select(
            (
                -(F.col("n") / F.col("n_docs").cast("double"))
                * F.log(F.col("n") / F.col("n_docs").cast("double"))
            ).alias("term")
        )
        .agg(F.sum("term").alias("lang_entropy_raw"))
    )
    return (
        base.crossJoin(F.broadcast(ent))
        .select(
            "n_docs",
            "total_tokens",
            "n_langs",
            F.round(
                (F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("exact_dup_frac"),
            F.round(
                F.col("total_tokens").cast("double") / F.col("n_docs"), 6
            ).alias("mean_doc_tokens"),
            F.round(F.col("lang_entropy_raw"), 6).alias("lang_entropy_nats"),
        )
    )


@register(
    "docs_source_drift_psi",
    oracle=f"""
    WITH toks AS (
      SELECT source, tok
      FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), bucketed AS (
      SELECT source,
             CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
                  % {DSIR_BUCKETS} AS BIGINT) AS bucket
      FROM toks
    ), sb AS (
      SELECT source, bucket, count(*) AS n FROM bucketed GROUP BY 1, 2
    ), per_source AS (
      SELECT source, sum(n) AS tot_s FROM sb GROUP BY source
    ), per_bucket AS (
      SELECT bucket, sum(n) AS n_all FROM sb GROUP BY bucket
    ), tot AS (
      SELECT sum(n) AS total FROM sb
    ), grid AS (
      SELECT s.source, s.tot_s, b.bucket, b.n_all, t.total,
             coalesce(c.n, 0) AS n
      FROM per_source s
      CROSS JOIN per_bucket b
      CROSS JOIN tot t
      LEFT JOIN sb c ON c.source = s.source AND c.bucket = b.bucket
    ), terms AS (
      SELECT source, tot_s,
             CAST(round(
               (((n + 1.0) / (tot_s + {DSIR_BUCKETS}))
                - ((n_all + 1.0) / (total + {DSIR_BUCKETS})))
               * ln(((n + 1.0) / (tot_s + {DSIR_BUCKETS}))
                    / ((n_all + 1.0) / (total + {DSIR_BUCKETS})))
               * 1000000.0, 0) AS BIGINT) AS term_micro
      FROM grid
    )
    SELECT source,
           CAST(max(tot_s) AS BIGINT) AS n_tokens,
           CAST(sum(term_micro) AS BIGINT) AS psi_micro
    FROM terms
    GROUP BY source
    ORDER BY psi_micro DESC, source
    """,
    tags=("llm", "selection", "observability"),
)
def docs_source_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: Population Stability Index of
    each source's hashed-token bucket distribution against the whole
    corpus — the monitoring metric that flags a source whose content
    shifted (crawler drift, encoding regressions, injected boilerplate)
    before it pollutes a training mix.

    PSI = Σ_b (p_b − q_b)·ln(p_b/q_b), add-one smoothed on both sides,
    with each bucket term quantized to integer micro-units BEFORE the
    per-source sum (exact, order-free — the ``docs_dsir_weights``
    convention). Plan: one explode → one (source, bucket) agg; the
    |sources|×B dense grid is built from two broadcast-sized side
    aggregates, never from the corpus."""
    d = load(spark, sf_dir, "documents")
    toks = (
        d.select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    sb = (
        toks.select("source", _bucket(F.col("tok")).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # tiny (|sources|×B); feeds 3 aggs
    )
    per_source = sb.groupBy("source").agg(F.sum("n").alias("tot_s"))
    per_bucket = sb.groupBy("bucket").agg(F.sum("n").alias("n_all"))
    tot = sb.agg(F.sum("n").alias("total"))
    # per_bucket (≤ B rows by construction) and tot (scalar) keep their
    # hints; sb is grouped by (source, bucket) — source cardinality is
    # data-dependent, so AQE decides that join from stats.
    grid = (
        per_source.crossJoin(F.broadcast(per_bucket))
        .crossJoin(F.broadcast(tot))
        .join(sb, ["source", "bucket"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    p = (F.col("n") + 1.0) / (F.col("tot_s") + DSIR_BUCKETS)
    q = (F.col("n_all") + 1.0) / (F.col("total") + DSIR_BUCKETS)
    term_micro = F.round((p - q) * F.log(p / q) * 1000000.0, 0).cast("bigint")
    return (
        grid.select("source", "tot_s", term_micro.alias("term_micro"))
        .groupBy("source")
        .agg(
            F.max("tot_s").cast("bigint").alias("n_tokens"),
            F.sum("term_micro").cast("bigint").alias("psi_micro"),
        )
        .orderBy(F.desc("psi_micro"), "source")
    )
