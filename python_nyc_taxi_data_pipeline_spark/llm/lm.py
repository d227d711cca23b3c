"""Unigram-LM surprisal scoring: the CCNet-style perplexity filter.

CCNet (Wenzek et al. '20) ranks web documents by language-model
perplexity and keeps the low-perplexity head. This is that stage with
a unigram LM trained on the corpus itself, pruned to a broadcastable
top-V vocabulary (real deployments prune the KenLM model the same way):

- token unigram counts → ONE map-side-combined aggregation;
- the LM is the top-``TOP_V`` tokens by (count DESC, token) — a
  deterministic, bounded table that BROADCASTS; every other token
  scores the add-one OOV floor ``-ln(1 / (T + 1))``;
- per-token surprisal is quantized to integer micro-nats BEFORE the
  per-doc sum (the ``plans.selection`` DSIR precedent), so document
  scores are exact order-free integer sums;
- the keep flag compares each doc's MEAN surprisal against the corpus
  mean with cross-multiplied integers in DECIMAL(19,0)×DECIMAL(19,0)
  (exact, no division, no float compare; products stay far inside
  decimal(38) at any realistic scale);
- the only emitted float is one IEEE division rounded to 4 dp.

Scale (100 TB): corpus explodes once; the vocab agg and the scalar
corpus moments are metadata-sized broadcasts; the per-doc rollup is
one groupBy(doc_id). No sort, no window, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

TOP_V = 64  # pruned-LM vocabulary size (broadcastable at any corpus size)

_LM_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), cnt AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM cnt
    ), lm AS (
      SELECT tok,
             CAST(round(-ln(CAST(n AS DOUBLE)
                            / (SELECT CAST(t AS DOUBLE) FROM tot))
                        * 1000000.0, 0) AS BIGINT) AS s_micro
      FROM (
        SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rk
        FROM cnt
      ) WHERE rk <= {TOP_V}
    ), oov AS (
      SELECT CAST(round(-ln(CAST(1 AS DOUBLE)
                            / ((SELECT t FROM tot) + 1))
                        * 1000000.0, 0) AS BIGINT) AS s_micro
    ), docsum AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(coalesce(lm.s_micro, (SELECT s_micro FROM oov)))
                  AS BIGINT) AS sum_surprisal_micro
      FROM toks t LEFT JOIN lm ON lm.tok = t.tok
      GROUP BY t.doc_id
    ), corpus AS (
      SELECT CAST(sum(sum_surprisal_micro) AS BIGINT) AS s_all,
             CAST(sum(n_tokens) AS BIGINT) AS n_all
      FROM docsum
    )
    SELECT doc_id, n_tokens, sum_surprisal_micro,
           round(CAST(sum_surprisal_micro AS DOUBLE) / n_tokens, 4)
             AS mean_surprisal_micro,
           (CAST(sum_surprisal_micro AS DECIMAL(19,0))
              * (SELECT CAST(n_all AS DECIMAL(19,0)) FROM corpus))
           <= (CAST(n_tokens AS DECIMAL(19,0))
              * (SELECT CAST(s_all AS DECIMAL(19,0)) FROM corpus))
             AS keep_below_corpus_mean
    FROM docsum
"""


@register("docs_unigram_surprisal_filter", oracle=_LM_ORACLE, tags=("llm", "quality", "lm"))
def docs_unigram_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram surprisal under the pruned corpus LM, with an
    exact below-corpus-mean keep flag (see module docstring)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # vocab-sized; checkpoint so the scalar-total job and the LM build
    # don't each re-run the corpus explode
    cnt = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    total = cnt.agg(F.sum("n")).collect()[0][0]  # scalar corpus size
    lm = F.broadcast(
        cnt.orderBy(F.desc("n"), F.asc("tok"))
        .limit(TOP_V)
        .select(
            "tok",
            F.round(-F.log(F.col("n").cast("double") / float(total)) * 1e6, 0)
            .cast("bigint")
            .alias("s_micro"),
        )
    )
    oov = int(round(-math.log(1.0 / (total + 1)) * 1e6))
    # doc-count-sized; checkpoint so the corpus-moment collect and the
    # returned plan share one materialization
    docsum = (
        toks.join(lm, "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("s_micro", F.lit(oov))).alias("sum_surprisal_micro"),
        )
        .localCheckpoint(eager=True)
    )
    s_all, n_all = docsum.agg(
        F.sum("sum_surprisal_micro"), F.sum("n_tokens")
    ).collect()[0]
    return docsum.select(
        "doc_id",
        "n_tokens",
        "sum_surprisal_micro",
        F.round(
            F.col("sum_surprisal_micro").cast("double") / F.col("n_tokens"), 4
        ).alias("mean_surprisal_micro"),
        (
            F.col("sum_surprisal_micro").cast("decimal(19,0)")
            * F.lit(int(n_all)).cast("decimal(19,0)")
            <= F.col("n_tokens").cast("decimal(19,0)")
            * F.lit(int(s_all)).cast("decimal(19,0)")
        ).alias("keep_below_corpus_mean"),
    )
