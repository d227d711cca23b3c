"""Cross-corpus duplicated-span analysis (exact-substring-dedup lite).

RefinedWeb/C4-style pipelines remove text *spans* that recur across the
corpus (boilerplate, licenses, templated content) — a different signal
from whole-document near-dup (``llm.dedup``) or INTRA-document
repetition (``llm.quality``: Gopher's duplicated-n-gram fraction).
Here a span is a word 8-gram at a given position; a span VALUE is
"corpus-duplicated" when it occurs in ≥ 2 distinct documents, and each
document reports how much of it is made of such spans — the direct
input to a span-removal / document-drop decision.

Scale design (100 TB of text):
- Spans travel as 64-bit ``xxhash64`` fingerprints of the 8 words
  (8-byte shuffle keys, no 8-word strings on the wire — the same
  Broder trick as ``llm.dedup.word_trigram_hashes``).
- Three shuffles, all on compact keys: (doc_id, hash) partial counts
  (map-side combined), hash → document frequency, doc_id → final
  per-doc rollup. The df side is filtered to ``df ≥ 2`` BEFORE the
  join back, so only actually-duplicated span values are joined.
- No all-pairs anything: cost is linear in total span positions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

SPAN_N = 8  # words per span
DUP_FRACTION_FLAG = 0.5  # flag docs that are mostly duplicated spans


def span_hashes(words: Column) -> Column:
    """All positional word ``SPAN_N``-gram fingerprints (NOT distinct —
    the duplicated *fraction* weights every position)."""
    args = lambda i: [F.element_at(words, i + j) for j in range(1, SPAN_N + 1)]
    return F.when(
        F.size(words) >= SPAN_N,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - SPAN_N),
            lambda i: F.xxhash64(*args(i)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    s AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(ws) - {SPAN_N - 1}),
               i -> {" || ' ' || ".join(f"ws[i+{j}]" for j in range(SPAN_N))}
             )) AS span
      FROM w WHERE len(ws) >= {SPAN_N}
    ),
    pds AS (
      SELECT doc_id, span, count(*) AS k FROM s GROUP BY doc_id, span
    ),
    df AS (
      SELECT span, count(*) AS ndocs FROM pds GROUP BY span
    ),
    dup AS (
      SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_dup
      FROM pds JOIN df USING (span)
      WHERE ndocs >= 2
      GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id,
             CAST(greatest(len(string_split(text, ' ')) - {SPAN_N - 1}, 0)
                  AS BIGINT) AS n_spans
      FROM documents
    )
    SELECT b.doc_id,
           b.n_spans,
           CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
           round(CASE WHEN b.n_spans > 0
                      THEN CAST(coalesce(d.n_dup, 0) AS DOUBLE) / b.n_spans
                      ELSE 0.0 END, 6) AS dup_fraction,
           (CASE WHEN b.n_spans > 0
                 THEN CAST(coalesce(d.n_dup, 0) AS DOUBLE) / b.n_spans
                 ELSE 0.0 END) >= {DUP_FRACTION_FLAG} AS mostly_duplicated
    FROM base b LEFT JOIN dup d USING (doc_id)
"""


@register(
    "docs_corpus_dup_span_fraction",
    oracle=_ORACLE,
    tags=("llm", "dedup", "curation"),
)
def docs_corpus_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of positional word 8-grams whose value
    occurs in ≥ 2 distinct documents, plus a ``mostly_duplicated``
    flag at ≥ 0.5 — the span-level companion to whole-doc dedup.

    Distinct from ``docs_dup_ngram_fraction`` (quality.py), which
    reports the share of a doc's DISTINCT gram set seen elsewhere: here
    every POSITION is weighted, so a doc that repeats one boilerplate
    span 50 times scores 50 positions (coverage — what span-removal
    would delete), not 1 distinct gram.

    Shape: explode hashed spans → (doc_id, hash) counts (one shuffle,
    map-side combined) → hash→df (second shuffle; AQE reuses the hash
    partitioning for the ``df ≥ 2`` join probe) → per-doc rollup
    joined LEFT back to the full corpus so span-free docs report 0."""
    d = load(spark, sf_dir, "documents")
    # Materialize the split behind a barrier — lambda bodies are exempt
    # from CSE and projection collapse re-inlines a bare split() into
    # the span lambda, re-tokenizing the doc per element (see
    # dedup.hashed_shingle_table).
    w = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split("text", " ").alias("ws"))
        .localCheckpoint(eager=True)
    )
    spans = w.select(
        "doc_id", F.explode(span_hashes(F.col("ws"))).alias("h")
    )
    per_doc_span = spans.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("k"))
    # Document frequency as a COUNT window over the hash instead of a
    # groupBy + join-back: the rows are already (doc_id, h)-unique, so
    # count(*) over (partition by h) IS ndocs — one shuffle on the
    # 8-byte key and no second consumer recomputing the explode.
    from pyspark.sql.window import Window

    with_df = per_doc_span.withColumn(
        "ndocs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    dup = (
        with_df.filter(F.col("ndocs") >= 2)
        .groupBy("doc_id")
        .agg(F.sum("k").alias("n_dup"))
    )
    base = d.select(
        "doc_id",
        F.greatest(
            F.size(F.split("text", " ")) - (SPAN_N - 1), F.lit(0)
        ).cast("long").alias("n_spans"),
    )
    frac = F.when(
        F.col("n_spans") > 0,
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("double") / F.col("n_spans"),
    ).otherwise(F.lit(0.0))
    return (
        base.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.round(frac, 6).alias("dup_fraction"),
            (frac >= DUP_FRACTION_FLAG).alias("mostly_duplicated"),
        )
    )
