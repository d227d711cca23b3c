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


TOP_B = 96  # pruned bigram-LM size (broadcastable at any corpus size)
ALPHA = 0.4  # Stupid-Backoff discount (Brants et al. '07 use 0.4)

_BG_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS a
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), pairs AS (
      SELECT doc_id,
             unnest(list_slice(a, 1, len(a) - 1)) AS p,
             unnest(list_slice(a, 2, len(a))) AS t
      FROM base
    ), bg AS (
      SELECT p, t, CAST(count(*) AS BIGINT) AS n_pt FROM pairs GROUP BY p, t
    ), ctx AS (
      SELECT p, CAST(sum(n_pt) AS BIGINT) AS n_p FROM bg GROUP BY p
    ), topb AS (
      SELECT p, t,
             CAST(round(-ln(CAST(n_pt AS DOUBLE) / CAST(n_p AS DOUBLE))
                        * 1000000.0, 0) AS BIGINT) AS bg_micro
      FROM (
        SELECT bg.p, bg.t, bg.n_pt, ctx.n_p,
               row_number() OVER (ORDER BY bg.n_pt DESC, bg.p, bg.t) AS rk
        FROM bg JOIN ctx ON ctx.p = bg.p
      ) WHERE rk <= {TOP_B}
    ), toks AS (
      SELECT doc_id, unnest(a) AS tok FROM base
    ), ucnt AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM ucnt
    ), topv AS (
      SELECT tok,
             CAST(round(-ln({ALPHA} * (CAST(n AS DOUBLE)
                                       / (SELECT CAST(t AS DOUBLE) FROM tot)))
                        * 1000000.0, 0) AS BIGINT) AS u_micro
      FROM (
        SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rk
        FROM ucnt
      ) WHERE rk <= {TOP_V}
    ), oov AS (
      SELECT CAST(round(-ln({ALPHA} * (CAST(1 AS DOUBLE)
                                       / ((SELECT t FROM tot) + 1)))
                        * 1000000.0, 0) AS BIGINT) AS s_micro
    ), docsum AS (
      SELECT pr.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CASE WHEN tb.bg_micro IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_bigram_hits,
             CAST(sum(CASE WHEN tb.bg_micro IS NULL
                            AND tv.u_micro IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_unigram_backoffs,
             CAST(sum(CASE WHEN tb.bg_micro IS NULL AND tv.u_micro IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(sum(coalesce(tb.bg_micro, tv.u_micro,
                               (SELECT s_micro FROM oov)))
                  AS BIGINT) AS sum_surprisal_micro
      FROM pairs pr
      LEFT JOIN topb tb ON tb.p = pr.p AND tb.t = pr.t
      LEFT JOIN topv tv ON tv.tok = pr.t
      GROUP BY pr.doc_id
    ), corpus AS (
      SELECT CAST(sum(sum_surprisal_micro) AS BIGINT) AS s_all,
             CAST(sum(n_bigrams) AS BIGINT) AS n_all
      FROM docsum
    )
    SELECT doc_id, n_bigrams, n_bigram_hits, n_unigram_backoffs, n_oov,
           sum_surprisal_micro,
           round(CAST(sum_surprisal_micro AS DOUBLE) / n_bigrams, 4)
             AS mean_surprisal_micro,
           (CAST(sum_surprisal_micro AS DECIMAL(19,0))
              * (SELECT CAST(n_all AS DECIMAL(19,0)) FROM corpus))
           <= (CAST(n_bigrams AS DECIMAL(19,0))
              * (SELECT CAST(s_all AS DECIMAL(19,0)) FROM corpus))
             AS keep_below_corpus_mean
    FROM docsum
"""


@register(
    "docs_bigram_backoff_surprisal",
    oracle=_BG_ORACLE,
    tags=("llm", "quality", "lm"),
)
def docs_bigram_backoff_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram Stupid-Backoff surprisal (Brants et al. '07, the LM
    scheme designed FOR MapReduce-scale corpora): each in-doc bigram
    scores -ln(c(p,t)/c(p)) from the pruned top-``TOP_B`` bigram
    table, backs off to -ln(ALPHA * c(t)/T) from the top-``TOP_V``
    unigram table, and floors at the ALPHA-discounted add-one OOV
    score. Same exactness discipline as the unigram filter above:
    per-bigram scores quantize to integer micro-nats BEFORE the
    per-doc sum, and the keep flag is a cross-multiplied
    DECIMAL(19,0) compare against the corpus mean (no float compare).
    The per-doc backoff-level counts (bigram hit / unigram backoff /
    OOV) are exact integers and make the pruning observable.

    Scale (100 TB): one bigram-count aggregation (map-side combined)
    + one token-count aggregation; both LM tables prune to
    broadcastable constants BEFORE any corpus-sized join, so scoring
    is two broadcast-hash lookups and one groupBy(doc_id). No window,
    no sort, no Python. The bigram-count relation itself is the one
    vocab^2-bounded intermediate; it is aggregated and pruned in the
    same stage, never joined at corpus size."""
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("a")).where(
        F.size("a") >= 2
    )
    pairs = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(a) - 1),"
                " i -> struct(element_at(a, i) AS p,"
                "             element_at(a, i + 1) AS t))"
            )
        ).alias("pr"),
    ).select("doc_id", "pr.p", "pr.t")
    # vocab^2-bounded; checkpoint so the context rollup and the top-B
    # prune don't each re-run the corpus explode
    bg = (
        pairs.groupBy("p", "t")
        .agg(F.count(F.lit(1)).alias("n_pt"))
        .localCheckpoint(eager=True)
    )
    ctx = bg.groupBy("p").agg(F.sum("n_pt").alias("n_p"))
    topb = F.broadcast(
        bg.join(ctx, "p")
        .orderBy(F.desc("n_pt"), F.asc("p"), F.asc("t"))
        .limit(TOP_B)
        .select(
            "p",
            "t",
            F.round(
                -F.log(F.col("n_pt").cast("double") / F.col("n_p").cast("double"))
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("bg_micro"),
        )
    )
    # vocab-sized; checkpoint so the scalar-total job and the top-V
    # prune share one materialization
    ucnt = (
        base.select(F.explode("a").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    total = ucnt.agg(F.sum("n")).collect()[0][0]  # scalar corpus size
    topv = F.broadcast(
        ucnt.orderBy(F.desc("n"), F.asc("tok"))
        .limit(TOP_V)
        .select(
            F.col("tok").alias("t"),
            F.round(
                -F.log(F.lit(ALPHA) * (F.col("n").cast("double") / float(total)))
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("u_micro"),
        )
    )
    oov = int(round(-math.log(ALPHA * (1.0 / (total + 1))) * 1e6))
    # doc-count-sized; checkpoint so the corpus-moment collect and the
    # returned plan share one materialization
    docsum = (
        pairs.join(topb, ["p", "t"], "left")
        .join(topv, "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("bg_micro").isNotNull(), 1).otherwise(0)
            ).alias("n_bigram_hits"),
            F.sum(
                F.when(
                    F.col("bg_micro").isNull() & F.col("u_micro").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_unigram_backoffs"),
            F.sum(
                F.when(
                    F.col("bg_micro").isNull() & F.col("u_micro").isNull(), 1
                ).otherwise(0)
            ).alias("n_oov"),
            F.sum(
                F.coalesce("bg_micro", "u_micro", F.lit(oov))
            ).alias("sum_surprisal_micro"),
        )
        .localCheckpoint(eager=True)
    )
    s_all, n_all = docsum.agg(
        F.sum("sum_surprisal_micro"), F.sum("n_bigrams")
    ).collect()[0]
    return docsum.select(
        "doc_id",
        "n_bigrams",
        "n_bigram_hits",
        "n_unigram_backoffs",
        "n_oov",
        "sum_surprisal_micro",
        F.round(
            F.col("sum_surprisal_micro").cast("double") / F.col("n_bigrams"), 4
        ).alias("mean_surprisal_micro"),
        (
            F.col("sum_surprisal_micro").cast("decimal(19,0)")
            * F.lit(int(n_all)).cast("decimal(19,0)")
            <= F.col("n_bigrams").cast("decimal(19,0)")
            * F.lit(int(s_all)).cast("decimal(19,0)")
        ).alias("keep_below_corpus_mean"),
    )
