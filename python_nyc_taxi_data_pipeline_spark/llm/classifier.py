"""Model-based document classification and embedding label probes.

Two supervised evaluation/filtering operators a training-data pipeline
runs on top of the unsupervised curation stack:

- ``docs_nb_lang_classifier`` — a multinomial Naive Bayes document
  classifier (class = ``lang``) trained on the corpus itself and
  applied corpus-wide. This is the fastText-classifier shape of
  model-based filtering (CCNet's LM filter, fineweb-edu's quality
  classifier): train token statistics per class, score every document
  as Σ -log P(token|class) - log P(class), keep/route by the argmax.
  All class-conditional scores are quantized to integer micro-nats
  BEFORE the per-doc sum (the ``llm.lm`` surprisal precedent), so
  document costs are exact order-free integer sums and the argmax is
  exactly reproducible by the DuckDB oracle.

- ``embeddings_knn_label_probe`` — the standard k-NN probe of
  embedding quality: classify a bounded eval split by majority label
  of its k nearest neighbors (leave-one-out) and report per-query
  verdicts. Rounded cosine + deterministic tie-breaks make the probe
  exactly oracle-checkable.

Scale notes (100 TB):
- NB training is two map-side-combined aggregations over one corpus
  explode (per-class token counts; per-class totals); the model —
  V×C scores + C class rows — is metadata-sized and BROADCASTS at any
  corpus size (V=64 vocab buckets + 1 OOV bucket, C = #classes).
- NB scoring re-explodes the corpus once into per-doc distinct-token
  counts, joins the broadcast score table, and reduces with one
  groupBy(doc_id) — no shuffle wider than the per-doc rollup, no
  Python.
- The k-NN probe bounds the QUERY side (an eval split, here the
  lowest {PROBE_EVAL_MAX} vec_ids), so work is q·n with the query
  block broadcast — the ``knn_cosine_bruteforce`` design; the corpus
  side streams. At production scale the same probe runs the shortlist
  through the LSH/IVF candidate generators instead of the full scan
  (``knn_cosine_lsh`` / ``knn_cosine_partitioned``).

Reference parity: the reference pipeline has no model-based filter —
this module is part of the beyond-reference LLM-curation suite (same
status as dedup/ANN/BPE; the build brief's training-data-pipeline
scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, load_fanned
from ..registry import register
from .similarity import _as_double, _dot, _norm

NB_TOP_V = 64  # vocabulary buckets (broadcastable at any corpus size)
PROBE_EVAL_MAX = 100  # eval split: vec_id < 100 (bounded, scale-free)
PROBE_K = 5

_NB_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
        FROM toks GROUP BY tok
      ) WHERE rk <= {NB_TOP_V}
    ), classes AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_c
      FROM documents GROUP BY lang
    ), cls AS (
      SELECT c.lang, c.n_docs, c.t_c,
             c.t_c - coalesce(iv.n_iv, 0) AS oov_c,
             c.t_c + {NB_TOP_V} + 1 AS denom
      FROM classes c LEFT JOIN (
        SELECT t.lang, CAST(count(*) AS BIGINT) AS n_iv
        FROM toks t JOIN vocab v ON v.tok = t.tok
        GROUP BY t.lang
      ) iv ON iv.lang = c.lang
    ), total_docs AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS nd FROM cls
    ), scores AS (
      SELECT c.lang, v.tok,
             CAST(round(-ln(CAST(coalesce(ct.n, 0) + 1 AS DOUBLE)
                            / CAST(c.denom AS DOUBLE)) * 1000000.0, 0)
                  AS BIGINT) AS s_micro
      FROM cls c CROSS JOIN vocab v
      LEFT JOIN (
        SELECT t.lang, t.tok, CAST(count(*) AS BIGINT) AS n
        FROM toks t JOIN vocab vv ON vv.tok = t.tok
        GROUP BY t.lang, t.tok
      ) ct ON ct.lang = c.lang AND ct.tok = v.tok
    ), cmeta AS (
      SELECT lang,
             CAST(round(-ln(CAST(oov_c + 1 AS DOUBLE)
                            / CAST(denom AS DOUBLE)) * 1000000.0, 0)
                  AS BIGINT) AS oov_micro,
             CAST(round(-ln(CAST(n_docs AS DOUBLE)
                            / CAST((SELECT nd FROM total_docs) AS DOUBLE))
                        * 1000000.0, 0) AS BIGINT) AS prior_micro
      FROM cls
    ), dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM toks GROUP BY doc_id, tok
    ), doc_iv AS (
      SELECT dt.doc_id, s.lang,
             CAST(sum(dt.cnt * s.s_micro) AS BIGINT) AS iv_cost
      FROM dt JOIN scores s ON s.tok = dt.tok
      GROUP BY dt.doc_id, s.lang
    ), doc_oov AS (
      SELECT dt.doc_id, CAST(sum(dt.cnt) AS BIGINT) AS n_oov
      FROM dt LEFT JOIN vocab v ON v.tok = dt.tok
      WHERE v.tok IS NULL
      GROUP BY dt.doc_id
    ), costs AS (
      SELECT d.doc_id, d.lang,
             m.lang AS cls,
             m.prior_micro + coalesce(iv.iv_cost, 0)
               + coalesce(o.n_oov, 0) * m.oov_micro AS cost_micro
      FROM documents d
      CROSS JOIN cmeta m
      LEFT JOIN doc_iv iv ON iv.doc_id = d.doc_id AND iv.lang = m.lang
      LEFT JOIN doc_oov o ON o.doc_id = d.doc_id
    )
    SELECT doc_id, lang, cls AS pred_lang, cost_micro,
           (cls = lang) AS correct
    FROM costs
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY cost_micro, cls
    ) = 1
"""


@register(
    "docs_nb_lang_classifier",
    oracle=_NB_ORACLE,
    tags=("llm", "quality", "classifier"),
)
def docs_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained on the
    corpus's own ``lang`` labels and applied to every document: per
    class, Laplace-smoothed token probabilities over a top-{NB_TOP_V}
    vocabulary + one OOV bucket; per document, integer micro-nat cost
    ``prior + Σ count(tok)·s(class, tok)``; prediction is the exact
    argmin with (cost, class) tie-break. Returns one row per document
    (doc_id, lang, pred_lang, cost_micro, correct)."""
    # Fanning this scan was measured and REJECTED in r12 (interleaved
    # 3×2 A/B: warm 2.37/2.19 plain vs 3.91/3.21 fanned) — the frame is
    # UNPINNED with four consumers, so the guard's probe + repartition
    # re-planned per consumer and the added exchanges swamped the
    # parallelism; the scoring path already fans via its own
    # repartition("doc_id").
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    # vocab-sized after the agg; checkpoint so the three model builds
    # below don't each re-run the corpus explode
    cnt = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    vocab = F.broadcast(
        cnt.orderBy(F.desc("n"), F.asc("tok")).limit(NB_TOP_V).select("tok")
    )
    # ---- model build: everything below the explode aggregates to
    # class-sized or V×C-sized frames (metadata at any corpus scale) --
    classes = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("t_c"),
    )
    iv_per_class = (
        toks.join(vocab, "tok").groupBy("lang").agg(F.count(F.lit(1)).alias("n_iv"))
    )
    cls = (
        classes.join(iv_per_class, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "t_c",
            (F.col("t_c") - F.coalesce("n_iv", F.lit(0))).alias("oov_c"),
            (F.col("t_c") + F.lit(NB_TOP_V + 1)).alias("denom"),
        )
        .localCheckpoint(eager=True)  # C rows; 3 consumers below
    )
    n_docs_total = int(cls.agg(F.sum("n_docs")).collect()[0][0])

    def _micro(num, den):
        return (
            F.round(-F.log(num.cast("double") / den.cast("double")) * 1e6, 0)
            .cast("bigint")
        )

    ct = (
        toks.join(vocab, "tok")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scores = F.broadcast(
        cls.select("lang", "denom")
        .crossJoin(vocab)
        .join(ct, ["lang", "tok"], "left")
        .select(
            "lang",
            "tok",
            _micro(F.coalesce("n", F.lit(0)) + F.lit(1), F.col("denom")).alias(
                "s_micro"
            ),
        )
    )
    cmeta0 = cls.select(
        "lang",
        _micro(F.col("oov_c") + F.lit(1), F.col("denom")).alias("oov_micro"),
        _micro(F.col("n_docs"), F.lit(n_docs_total)).alias("prior_micro"),
    ).withColumnRenamed("lang", "cls")
    # 0-based lexicographic class index for the packed argmin (min idx
    # == min cls string, preserving the struct-min tie-break). Rank by
    # triangular join on the C-row frame — the constant-size-frame
    # idiom instead of a single-partition window.
    ahead = cmeta0.select(F.col("cls").alias("b_cls"))
    cmeta = F.broadcast(
        cmeta0.join(F.broadcast(ahead), F.col("b_cls") < F.col("cls"), "left")
        .groupBy("cls", "oov_micro", "prior_micro")
        .agg(F.count("b_cls").alias("cls_idx"))
        .localCheckpoint(eager=True)
    )
    # ---- scoring: one more corpus explode -> per-doc distinct-token
    # counts, broadcast-model joins, one groupBy(doc_id) argmin. Two
    # deliberate scale choices, both measured in the stress harness:
    # (1) the rollup keys on the token's 64-bit xxhash64 FINGERPRINT,
    # not the string (the hashed-shingle trick from llm.dedup) — fixed
    # 8-byte shuffle keys independent of token length (a fingerprint
    # collision between a vocab and non-vocab token is
    # ~V·|vocab_corpus|/2^64, < 1e-12 here, and would fail the oracle
    # loudly, never silently); (2) the exploded tokens repartition on
    # doc_id ONCE before the per-doc aggregation — hash(doc_id)
    # satisfies every downstream clustered distribution ((doc_id,
    # tok_h) agg, (doc_id, cls) agg and join, final groupBy(doc_id)),
    # so this is the scoring path's ONLY corpus-sized exchange.
    # Without it, dt rides the (doc_id, tok_h)-hashed layout and each
    # doc fragments across every partition, so the downstream
    # (doc_id, cls) PARTIAL aggregates emit one row per (doc,
    # partition) instead of per doc — measured exponent 1.48 under
    # fixture inflation (AQE coalesces small scales into few
    # partitions, hiding the fragmentation there), vs 1.0 with the
    # doc-aligned layout.
    dt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .select("doc_id", F.xxhash64("tok").alias("tok_h"))
        .repartition("doc_id")
        .groupBy("doc_id", "tok_h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # consumed by iv_cost AND n_oov
    )
    vocab_h = F.broadcast(vocab.select(F.xxhash64("tok").alias("tok_h")))
    scores_h = F.broadcast(
        scores.select(F.xxhash64("tok").alias("tok_h"), "lang", "s_micro")
    )
    doc_iv = (
        dt.join(scores_h, "tok_h")
        .groupBy("doc_id", F.col("lang").alias("cls"))
        .agg(F.sum(F.col("cnt") * F.col("s_micro")).alias("iv_cost"))
    )
    doc_oov = (
        dt.join(vocab_h, "tok_h", "left_anti")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_oov"))
    )
    # the doc's own label rides the aggregate as its CLASS INDEX (an
    # int — every lang is a class by construction): F.first on a
    # STRING has a non-primitive buffer, which alone forces the whole
    # aggregate to SortAggregate even when everything else packs.
    lang_idx = F.broadcast(
        cmeta.select(F.col("cls").alias("lang"), F.col("cls_idx").alias("lang_idx"))
    )
    costs = (
        d.select("doc_id", "lang")
        .join(lang_idx, "lang")
        .join(doc_oov, "doc_id", "left")
        .crossJoin(cmeta)
        .join(doc_iv, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "lang_idx",
            "cls_idx",
            (
                F.col("prior_micro")
                + F.coalesce("iv_cost", F.lit(0))
                + F.coalesce("n_oov", F.lit(0)) * F.col("oov_micro")
            ).alias("cost_micro"),
        )
    )
    # argmin as a PRIMITIVE-LONG min: cost_micro packed with the 8-bit
    # class index — min(pack) picks lowest cost, tie-broken by lowest
    # class index (== lexicographic cls, matching the previous
    # struct-min semantics). A struct min plans as SortAggregate and
    # SORTS the |docs|·C cost frame within partitions; the packed form
    # is a map-side-combinable HashAggregate (the segdedup keeper
    # idiom). Per-row raise_error guard on both fields' ranges.
    pk = F.expr(
        f"if(cost_micro >= 0 AND cost_micro < {1 << 55}"
        " AND cls_idx >= 0 AND cls_idx < 256,"
        " cost_micro * 256 + cls_idx,"
        " raise_error('docs_nb_lang_classifier: (cost_micro, cls_idx)"
        " outside the packed-argmin range'))"
    )
    best = (
        costs.select("doc_id", "lang_idx", pk.alias("pk"))
        .groupBy("doc_id")
        .agg(F.first("lang_idx").alias("lang_idx"), F.min("pk").alias("pk"))
    )
    cls_lookup = F.broadcast(
        cmeta.select("cls_idx", F.col("cls").alias("pred_lang"))
    )
    return (
        best.withColumn("cls_idx", F.col("pk").bitwiseAND(F.lit(255)))
        .join(cls_lookup, "cls_idx")
        .join(
            F.broadcast(
                cmeta.select(
                    F.col("cls_idx").alias("lang_idx"), F.col("cls").alias("lang")
                )
            ),
            "lang_idx",
        )
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            F.shiftright(F.col("pk"), 8).alias("cost_micro"),
            (F.col("cls_idx") == F.col("lang_idx")).alias("correct"),
        )
    )


_PROBE_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
      FROM v
    ), nn AS (
      SELECT q.vec_id AS query_id, q.label AS qlabel,
             c.label AS nlabel,
             round(list_reduce(list_transform(list_zip(q.v, c.v),
                                              p -> p[1] * p[2]),
                               (acc, x) -> acc + x)
                   / (q.nrm * c.nrm), 6) AS cos,
             c.vec_id AS neighbor_id
      FROM n q, n c
      WHERE q.vec_id < {PROBE_EVAL_MAX} AND q.vec_id <> c.vec_id
    ), topk AS (
      SELECT query_id, qlabel, nlabel
      FROM nn
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
      ) <= {PROBE_K}
    ), votes AS (
      SELECT query_id, qlabel, nlabel, CAST(count(*) AS BIGINT) AS votes
      FROM topk GROUP BY query_id, qlabel, nlabel
    )
    SELECT query_id AS vec_id, qlabel AS label,
           nlabel AS pred_label, votes,
           (nlabel = qlabel) AS correct
    FROM votes
    QUALIFY row_number() OVER (
      PARTITION BY query_id ORDER BY votes DESC, nlabel
    ) = 1
"""


@register(
    "embeddings_knn_label_probe",
    oracle=_PROBE_ORACLE,
    tags=("llm", "similarity", "classifier"),
)
def embeddings_knn_label_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN label probe over a bounded eval split: for
    every vector with vec_id < {PROBE_EVAL_MAX}, find its {PROBE_K}
    nearest neighbors by rounded cosine (neighbor_id tie-break) in the
    FULL corpus minus itself, and predict the majority neighbor label
    (votes DESC, label ASC tie-break). Returns one row per eval vector
    (vec_id, label, pred_label, votes, correct) — the standard probe
    of whether an embedding space separates its labels."""
    # load_fanned (guide §2.5): the leave-one-out scoring streams
    # |corpus|×|eval| interpreted 64-dim dot products off this scan
    # (the margin_mining shape — its A/B won warm 3.58→1.96); guarded
    # no-op once the scan is wide.
    e = load_fanned(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    n = e.select("vec_id", "label", "v", _norm(F.col("v")).alias("nrm"))
    q = n.filter(F.col("vec_id") < PROBE_EVAL_MAX).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cand = n.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    topk = (
        cand.select(
            "query_id",
            "qlabel",
            F.col("label").alias("nlabel"),
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PROBE_K)
    )
    votes = topk.groupBy("query_id", "qlabel", "nlabel").agg(
        F.count(F.lit(1)).alias("votes")
    )
    # majority vote as a PRIMITIVE-LONG min: (K - votes) in the high
    # bits, the label in the low 10 — min(pack) picks max votes then
    # min label, the same (votes DESC, label ASC) tie-break the
    # previous struct min expressed, without its SortAggregate
    # fallback. Guarded per row (labels must fit 10 bits).
    pk = F.expr(
        f"if(nlabel >= 0 AND nlabel < 1024,"
        f" ({PROBE_K} - votes) * 1024 + nlabel,"
        " raise_error('embeddings_knn_label_probe: nlabel outside the"
        " packed-argmin range'))"
    )
    return (
        votes.select("query_id", "qlabel", pk.alias("pk"))
        .groupBy("query_id")
        .agg(F.first("qlabel").alias("qlabel"), F.min("pk").alias("pk"))
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("qlabel").alias("label"),
            F.col("pk").bitwiseAND(F.lit(1023)).alias("pred_label"),
            (F.lit(PROBE_K) - F.shiftright(F.col("pk"), 10)).alias("votes"),
            (F.col("pk").bitwiseAND(F.lit(1023)) == F.col("qlabel")).alias(
                "correct"
            ),
        )
    )
