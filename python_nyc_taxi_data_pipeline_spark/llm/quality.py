"""Corpus-quality gates and exact-substring duplication analysis.

Two families of training-data-curation operators beyond the simple
length/stopword gates in ``llm.text``:

- **Gopher-style rule battery** (Rae et al. 2021, "Scaling Language
  Models: ... Gopher", §A1.1): per-document structural quality rules
  (word-count bounds, mean word length, stopword evidence, lexical
  diversity). Each rule is an independent boolean column so downstream
  consumers can re-weigh rules without re-scanning the corpus.
- **Duplicated-n-gram fraction** (Lee et al. 2021, "Deduplicating
  Training Data Makes Language Models Better"): the fraction of a
  document's word 8-grams that occur in at least one OTHER document.
  Unlike MinHash/SimHash (whole-document near-dup), this measures
  *partial* overlap — boilerplate shared across otherwise-distinct
  pages — and is the standard signal for exact-substring dedup.

Scale notes (100 TB): both are one-pass JVM column expressions plus,
for the n-gram fraction, one explode → two hash aggregations → one
inner join back on doc_id. The gram table is hashed (xxhash64, 8-byte
keys) before the shuffle, so shuffle width is independent of gram text
length; document-frequency counting is a map-side-combinable COUNT per
gram key. No all-pairs comparison anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# Gopher rule constants — tuned to the synthetic fixture's scale (docs
# are 10..100 words) while keeping the published rule STRUCTURE: the
# real corpus bounds (50..100k words etc.) are a config choice.
MIN_WORDS = 20
MAX_WORDS = 1_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_STOPWORD_HITS = 2  # "contains >= 2 of the required stop words"
MIN_DISTINCT_FRAC = 0.20  # lexical diversity: distinct words / words
REQUIRED_STOPWORDS = ("the", "a", "and", "of", "to", "with")

DUP_NGRAM_N = 8  # word 8-grams, the smallest span Lee et al. dedup


def _words(text: Column) -> Column:
    return F.split(text, " ")


@register(
    "docs_gopher_quality",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, source,
             string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS n_words,
             n_chars
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, source, n_words,
             round((CAST(n_chars AS DOUBLE) - n_words + 1) / n_words, 4)
               AS mean_word_len,
             len(list_filter(words, x -> x IN {REQUIRED_STOPWORDS!r}))
               AS stopword_hits,
             round(CAST(len(list_distinct(words)) AS DOUBLE) / n_words, 4)
               AS distinct_frac
      FROM w
    )
    SELECT doc_id, lang, source, n_words, mean_word_len, stopword_hits,
           distinct_frac,
           (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}) AS rule_word_count,
           (mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
             AS rule_mean_word_len,
           (stopword_hits >= {MIN_STOPWORD_HITS}) AS rule_stopwords,
           (distinct_frac >= {MIN_DISTINCT_FRAC}) AS rule_diversity,
           ((n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})
            AND (mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
            AND stopword_hits >= {MIN_STOPWORD_HITS}
            AND distinct_frac >= {MIN_DISTINCT_FRAC}) AS keep
    FROM r
    """,
    tags=("llm", "quality"),
)
def docs_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style structural quality rule battery, one boolean column
    per rule plus the conjunction, single codegen'd pass (no shuffle).

    mean word length is derived arithmetically from ``n_chars`` (chars
    minus the n_words-1 separating spaces, over n_words) instead of a
    second per-word pass — one fewer array traversal per row.
    """
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    mean_word_len = F.round(
        (F.col("n_chars").cast("double") - n_words + 1) / n_words, 4
    )
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*REQUIRED_STOPWORDS)))
    distinct_frac = F.round(
        F.size(F.array_distinct(words)).cast("double") / n_words, 4
    )
    rule_wc = n_words.between(MIN_WORDS, MAX_WORDS)
    rule_mwl = mean_word_len.between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
    rule_stop = stop_hits >= MIN_STOPWORD_HITS
    rule_div = distinct_frac >= MIN_DISTINCT_FRAC
    return d.select(
        "doc_id",
        "lang",
        "source",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        distinct_frac.alias("distinct_frac"),
        rule_wc.alias("rule_word_count"),
        rule_mwl.alias("rule_mean_word_len"),
        rule_stop.alias("rule_stopwords"),
        rule_div.alias("rule_diversity"),
        (rule_wc & rule_mwl & rule_stop & rule_div).alias("keep"),
    )


def doc_ngram_hashes(words: Column, n: int = DUP_NGRAM_N) -> Column:
    """Distinct word n-grams as 64-bit hashes (xxhash64 of the
    space-joined gram) from a MATERIALIZED word-array column. Hashing
    BEFORE the explode keeps the shuffled gram key at 8 bytes
    regardless of gram text length. ``words`` must be materialized
    behind a barrier (see ``dedup.hashed_shingle_table``): lambda
    bodies are exempt from common-subexpression elimination, so an
    inline ``split()`` re-tokenizes the document per element."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, n))),
    )
    # Guard BEFORE building the sequence: Spark's sequence(1, 0) counts
    # DOWN ([1, 0]), it is not empty — short docs must short-circuit.
    return F.when(
        F.size(words) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<bigint>"))


def doc_ngrams(text: Column, n: int = DUP_NGRAM_N) -> Column:
    """Distinct word n-gram hashes straight from a text column —
    convenience form for single-pass consumers; hot paths should split
    once behind a barrier and use ``doc_ngram_hashes``."""
    return doc_ngram_hashes(F.split(text, " "), n)


def _dup_ngram_oracle() -> str:
    n = DUP_NGRAM_N
    return f"""
    WITH grams AS (
      SELECT doc_id, gram
      FROM (
        SELECT doc_id,
               list_distinct([
                 array_to_string(words[i:i+{n - 1}], ' ')
                 for i in generate_series(1, len(words) - {n - 1})
               ]) AS gs
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        WHERE len(words) >= {n}
      ), unnest(gs) AS t(gram)
    ),
    df AS (
      SELECT gram, count(*) AS ndocs FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_grams,
           round(CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS dup_frac
    FROM grams g JOIN df USING (gram)
    GROUP BY g.doc_id
    """


@register("docs_dup_ngram_fraction", oracle=_dup_ngram_oracle(), tags=("llm", "dedup"))
def docs_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of distinct word 8-grams shared with at
    least one other document (exact-substring duplication signal, Lee
    et al. 2021).

    Plan shape: one explode of hashed distinct grams → partial-agg
    COUNT per 8-byte gram key (document frequency) → join grams back to
    their doc_id → partial-agg per doc. Two shuffles total, both on
    8-byte keys; gram text never crosses the wire. Documents shorter
    than 8 words have no grams and are absent from the output (same on
    the oracle side).
    """
    d = load(spark, sf_dir, "documents")
    spark_par = spark.sparkContext.defaultParallelism
    # Split once behind a barrier (projection collapse would otherwise
    # re-inline split() into the gram lambda → re-tokenize per element),
    # then materialize the per-doc gram arrays so BOTH consumers (the
    # document-frequency count and the join-back) reuse one computation.
    w = (
        d.repartition(spark_par)
        .select("doc_id", F.split("text", " ").alias("w"))
        .localCheckpoint(eager=True)
    )
    gram_arrays = w.select(
        "doc_id", doc_ngram_hashes(F.col("w")).alias("grams")
    ).localCheckpoint(eager=True)
    grams = gram_arrays.select("doc_id", F.explode("grams").alias("gram"))
    docfreq = grams.groupBy("gram").agg(F.count("*").alias("ndocs"))
    return (
        grams.join(docfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)).alias("dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "dup_grams",
            F.round(F.col("dup_grams").cast("double") / F.col("n_grams"), 4).alias(
                "dup_frac"
            ),
        )
    )
