"""Deterministic weighted sampling and per-group quality filtering —
the data-mixing stage of a training-data pipeline.

Two first-class curation operators on top of the uniform/stratified
samplers in ``plans.analytics``:

- **Token-weighted sampling** (Efraimidis–Spirakis A-ES reservoir):
  sample documents with inclusion probability proportional to their
  token count, the standard way to hit a TOKEN budget (not a document
  budget) when subsampling a corpus. Key = u^(1/w) with u a
  deterministic per-doc uniform; global top-k by key IS a w-weighted
  sample without replacement (Efraimidis & Spirakis 2006, "Weighted
  random sampling with a reservoir").
- **Top-p quality filter per language**: keep the best 30% of each
  language by a cheap integer quality ordering — the per-source
  "quality pruning" step of data-mixture construction.

Determinism contract: the uniform is derived from md5(doc_id) (first 8
hex chars → integer) — bit-identical in Spark (``conv(substr(md5))``)
and DuckDB (``('0x' || substr(md5))::UBIGINT``); the A-ES key is
rounded to 9 dp before it decides order (same precedent as the rounded
Jaccard threshold), and all tie-breaks are doc_id.

Scale notes (100 TB):
- the A-ES key is a map-side expression; global top-k is
  TakeOrderedAndProject (per-partition heaps + a k-row driver merge —
  no global sort, no shuffle of the corpus);
- the per-lang filter is one window per language partition; for a
  pathologically skewed single-language corpus the same semantics can
  be had shuffle-free via a per-lang approx-quantile threshold
  broadcast back (documented here so the trade is explicit — the
  exact window is what the oracle can verify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..llm.text import STOPWORDS
from ..registry import register

SAMPLE_K = 200
TOP_P = 0.30
# 2^32 + 1: maps the 32-bit hash (0 .. 2^32-1) into (0, 1) exclusive.
_U_DENOM = 4294967297.0


def _uniform_from_doc_id():
    """Deterministic per-doc uniform in (0,1): first 32 bits of
    md5(doc_id), shifted by +1 so u is never 0 (ln/pow-safe)."""
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return (h32 + 1) / F.lit(_U_DENOM)


@register(
    "docs_token_weighted_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1)
               / {_U_DENOM} AS u
      FROM documents
    )
    SELECT doc_id, n_words,
           round(pow(u, 1.0 / n_words), 9) AS sample_key
    FROM t
    ORDER BY sample_key DESC, doc_id
    LIMIT {SAMPLE_K}
    """,
    tags=("llm", "sampling", "curation"),
)
def docs_token_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted sample of {SAMPLE_K} documents: A-ES key
    u^(1/n_tokens), global top-k. Longer documents are proportionally
    more likely to be drawn — the right sampler when the downstream
    budget is tokens, not documents. Fully deterministic (hash-derived
    uniform), so the oracle recomputes it exactly.

    Plan: one map-side expression over the scan (no UDF, no RNG state),
    then TakeOrderedAndProject — at any corpus size the only cross-
    partition traffic is k rows per partition into the driver merge."""
    d = load(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("long")
    key = F.round(F.pow(_uniform_from_doc_id(), 1.0 / F.col("n_words")), 9)
    return (
        d.select("doc_id", n_words.alias("n_words"))
        .select("doc_id", "n_words", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(SAMPLE_K)
    )


@register(
    "docs_quality_topp_per_lang",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN {STOPWORDS!r})) AS BIGINT) AS sw_hits,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, sw_hits, n_words,
             round(percent_rank() OVER (
               PARTITION BY lang
               ORDER BY sw_hits DESC, n_words DESC, doc_id
             ), 6) AS quality_pr
      FROM scored
    )
    SELECT doc_id, lang, sw_hits, n_words, quality_pr
    FROM ranked
    WHERE quality_pr <= {TOP_P}
    """,
    tags=("llm", "sampling", "quality", "curation"),
)
def docs_quality_topp_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_P:.0%} quality filter per language: rank documents
    within each language by an integer quality ordering (stopword
    evidence desc, length desc, doc_id tie-break — engine-stable, no
    float in the ORDER BY) and keep percent_rank ≤ {TOP_P}. This is
    the per-source quality pruning step of mixture construction; the
    integer ordering makes the exact window verifiable by the oracle.

    Plan: one shuffle on lang, one window sort per language partition.
    At extreme single-language skew the same cut can be taken
    shuffle-free with a per-lang approx-quantile threshold broadcast
    back — the windowed form is the exact/verifiable variant."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sw_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("long")
    scored = d.select(
        "doc_id",
        "lang",
        sw_hits.alias("sw_hits"),
        F.size(words).cast("long").alias("n_words"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("sw_hits"), F.desc("n_words"), F.asc("doc_id")
    )
    return (
        scored.withColumn("quality_pr", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("quality_pr") <= TOP_P)
        .select("doc_id", "lang", "sw_hits", "n_words", "quality_pr")
    )
