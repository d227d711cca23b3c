"""Corpus-curation operators that COMPOSE the dedup/split primitives —
the steps a training-data pipeline actually ships:

- apply near-dup clustering to produce the deduplicated corpus
  (keep one representative per duplicate cluster);
- pack documents into fixed-token-budget training sequences
  (deterministic running-sum packing — no RNG, reproducible across
  engines and cluster sizes);
- train/test decontamination: find near-dup pairs that CROSS the
  hash-split boundary (the leakage a benchmark-contamination audit
  hunts for).

All three are pure DataFrame plans with full DuckDB oracles: the
cluster oracle reuses the recursive-CTE connected components
(`llm/clusters.py`), the packing oracle the same window running sum,
and the contamination oracle the shared Jaccard pair SQL.

Scale notes: dedup-apply is one broadcast-or-shuffle join of docs
against the (tiny) cluster map; packing is a window over a global
ordering — at 100 TB the single ORDER BY becomes range-partitioned
sort (Spark's window already does that; the pack ids stay
deterministic because the ordering key is total); contamination is the
pair join filtered by two cheap hash lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..llm.clusters import _clusters_oracle, docs_dup_clusters
from ..llm.dedup import GRAMS_CTE_SQL, JACCARD_PAIRS_SQL, docs_ngram_jaccard_pairs
from ..registry import register

PACK_BUDGET = 256  # tokens per training sequence (fixture docs are short)


@register(
    "docs_dedup_apply",
    oracle=f"""
    WITH clusters AS (
{_clusters_oracle()}
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
    WHERE c.doc_id = c.cluster_rep
    """,
    tags=("llm", "dedup", "curation"),
)
def docs_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup step APPLIED: keep exactly one representative (the
    cluster's min doc_id) per near-dup cluster, pass singletons
    through — the corpus a training run would consume. One join of the
    doc table against the cluster map (tiny: one row per doc in a
    cluster), so the full corpus shuffles at most once."""
    d = load(spark, sf_dir, "documents")
    comp = docs_dup_clusters(spark, sf_dir)
    return (
        d.join(comp, "doc_id")
        .filter(F.col("doc_id") == F.col("cluster_rep"))
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "docs_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             coalesce(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS offset_tokens
      FROM t
    )
    SELECT doc_id, n_tokens,
           offset_tokens // {PACK_BUDGET} AS pack_id
    FROM c
    """,
    tags=("llm", "packing", "curation"),
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: documents fill fixed
    token-budget training sequences in doc_id order; a document's pack
    is its cumulative token offset integer-divided by the budget.
    RNG-free (reproducible across engines/cluster sizes — the property
    rand()-based packing loses on retry) and one window over a total
    ordering — Spark range-partitions the global sort, so no single
    reducer sees the whole corpus."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "n_tokens",
        offset.alias("offset_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"offset_tokens div {PACK_BUDGET}").alias("pack_id"),
    )


@register(
    "docs_train_test_contamination",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    ),
    pairs AS (
{JACCARD_PAIRS_SQL}
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT p.doc_a, p.doc_b, p.jaccard,
           sa.split AS split_a, sb.split AS split_b
    FROM pairs p
    JOIN s sa ON p.doc_a = sa.doc_id
    JOIN s sb ON p.doc_b = sb.doc_id
    WHERE sa.split <> sb.split
    """,
    tags=("llm", "decontamination", "curation"),
)
def docs_train_test_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: near-duplicate pairs that CROSS the
    deterministic md5 train/val/test split — each one is evaluation
    leakage (the test doc has a near-copy in training). Composes the
    shared Jaccard pair plan with two broadcast lookups of the split
    label (the split is derived, not stored — zero extra state)."""
    pairs = docs_ngram_jaccard_pairs(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    hh = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(hh < "cd", "train").when(hh < "e6", "val").otherwise("test")
    s = d.select("doc_id", split.alias("split"))
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "jaccard", "split_a", "split_b")
    )
