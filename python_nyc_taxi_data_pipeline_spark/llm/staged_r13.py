"""Round-13 registration candidates — seed slate started in round 8.

Same staging mechanism as ``staged_r8``–``staged_r12``; the
evidence-window rotation is self-sustaining (10 new + 40 stalest per
round), so this slate grows opportunistically. Promotion in round 13
via ``staged_r13.promote_to_registry(R13_BATCH)``.

The seed slate:

- ``docs_quality_auc_rank``: exact Mann–Whitney AUC of a quality
  score (type-token ratio) as a classifier for a label (lang='en'),
  per source — THE filter-evaluation number (how discriminative is
  this score before you pick its threshold). The rank sums are
  computed with a DISTRIBUTED TWO-LEVEL PREFIX SUM (intra-band
  partitioned window + broadcast band offsets), so the plan contains
  NO global-order window: the classic scalable prefix-sum shape,
  oracle-checked against DuckDB's plain cumulative window.
- ``corpus_shard_manifest_digests``: order-independent per-shard
  content digests (doc-count + two modular hash sums + hash extremes)
  — the dataset-versioning primitive: two corpus snapshots compare
  manifests shard-by-shard to find what changed without re-reading
  either (the content-addressing idea of Merkle manifests, made
  commutative so the digest is a distributable hash aggregate).
- ``orders_bradley_terry_step``: preference-pair aggregation + one
  Zermelo/MM Bradley–Terry update — the reward-model data-pipeline
  op: deterministic doc pairs (consecutive ids) are judged by the
  same TTR quality score, wins are aggregated to source-vs-source
  game counts, and one integer-exact BT iteration from the uniform
  start produces normalized source strengths.
- ``docs_dup_cluster_stability``: the dedup-threshold sensitivity
  table — edges / components / clustered docs / max cluster size at
  τ ∈ {0.30, 0.50, 0.70}, composing the registered pair generator and
  label-prop CC; finds the percolation point where transitive closure
  starts chaining unrelated documents.
- ``embeddings_label_centroid_shift``: pairwise label-centroid cosine
  (micro-quantized integer element sums, so centroids are exact in
  any aggregation order) — the embedding-space collapse/drift check
  run when a new encoder ships.
- ``embeddings_matryoshka_recall_curve``: recall@5 of truncated-dim
  cosine (m ∈ {8,16,32}) vs full-dim truth over the bounded probe
  block — the MRL prefix-length design table (Kusupati et al. '22).
- ``events_stream_state_size_sweep``: rows a stateful streaming dedup
  must RETAIN per candidate watermark delay — the state axis of the
  watermark tradeoff, paired with the r12 late-arrival sweep.
- ``events_funnel_attribution_models``: first-touch / last-touch /
  linear conversion credit side by side, exact-conservation integer
  remainders — the model-sensitivity report behind budget allocation.
- ``corpus_token_budget_ladder``: the r10 water-fill evaluated at a
  budget ladder in one pass — the quality-vs-quantity tradeoff curve
  (kept mass's token-weighted quality index per budget rung).
- ``docs_dedup_roi_curve``: exact vs near-dup-cluster vs segment
  dedup summarized to one comparison table (docs/words before/after,
  removed share) — the aggressiveness ROI report, composing the
  three registered queries verbatim on both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import QueryFn


@dataclass(frozen=True)
class StagedQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()


STAGED: dict[str, StagedQuery] = {}

R13_BATCH: tuple[str, ...] = (
    "corpus_shard_manifest_digests",
    "corpus_token_budget_ladder",
    "docs_dedup_roi_curve",
    "docs_dup_cluster_stability",
    "docs_quality_auc_rank",
    "embeddings_label_centroid_shift",
    "embeddings_matryoshka_recall_curve",
    "events_funnel_attribution_models",
    "events_stream_state_size_sweep",
    "orders_bradley_terry_step",
)


def promote_to_registry(names: list[str]) -> list[str]:
    """Round-13 registration in one call; ``names`` is REQUIRED —
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
# Mann–Whitney AUC via distributed two-level prefix sum
# --------------------------------------------------------------------

AUC_POS_LANG = "en"
AUC_BAND_MICRO = 100_000  # prefix-sum bands over the [0, 1e6] score axis

# Shared score expression (type-token ratio in micro units) — spelled
# once for Spark and once for DuckDB, same integer arithmetic.
_TTR_SPARK = (
    "size(array_distinct(split(text, ' '))) * 1000000"
    " DIV size(split(text, ' '))"
)
_TTR_DUCK = (
    "len(list_distinct(string_split(text, ' '))) * 1000000"
    " // len(string_split(text, ' '))"
)


def _auc_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT source,
             CASE WHEN lang = '{AUC_POS_LANG}' THEN 1 ELSE 0 END AS y,
             {_TTR_DUCK} AS score
      FROM documents
    ), g AS (
      SELECT source, score,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(y) AS BIGINT) AS pos
      FROM d GROUP BY 1, 2
    ), cum AS (
      SELECT source, score, m, pos,
             CAST(COALESCE(sum(m) OVER (
               PARTITION BY source ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS below
      FROM g
    ), per_src AS (
      SELECT source,
             CAST(sum(pos * (2 * below + m + 1)) AS BIGINT) AS r2,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(m - pos) AS BIGINT) AS n_neg
      FROM cum GROUP BY 1
    )
    SELECT source, n_pos, n_neg,
           CAST((r2 - n_pos * (n_pos + 1)) * 1000000
                // (2 * greatest(n_pos, 1) * greatest(n_neg, 1))
             AS BIGINT) AS auc_micro
    FROM per_src
    """


@stage(
    "docs_quality_auc_rank",
    oracle=_auc_oracle(),
    tags=("llm", "quality", "eval"),
)
def docs_quality_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney AUC, per source, of the type-token-ratio
    quality score as a classifier for lang='{AUC_POS_LANG}' — the
    number that prices a quality filter BEFORE a threshold is chosen
    (AUC = P(score_pos > score_neg) + ½·P(tie), the probabilistic
    reading of ROC area; Mann–Whitney U via rank sums with AVERAGE
    ranks for ties, all integer: doubled ranks keep the ½s exact).

    The distributed part: rank sums need a per-source prefix sum over
    the score axis, and a naive global-order window is a
    single-partition exchange. This plan uses the classic TWO-LEVEL
    prefix sum instead — scores are binned into {AUC_BAND_MICRO}-wide
    bands, the intra-band cumulative runs as a (source, band)-
    partitioned window (parallel), and inter-band offsets come from a
    broadcast theta self-join over the tiny (source × band) totals
    frame. DuckDB's oracle uses its plain single-node cumulative
    window — same numbers, so the decomposition's exactness is what
    the hash pins.

    Exactness: integer counts, doubled-rank arithmetic, one micro
    DIV with greatest(...,1) guards for single-class sources (the
    established x/0 cross-engine rule). At extreme corpus sizes the
    doubled rank sum approaches int64; promote to DECIMAL(38,0) in
    both engines — same expression shape.

    Scale (100 TB): one scan to a (source, score) hash aggregate
    (score domain ≤ 1e6+1 values per source), then windows
    partitioned by (source, band) and a broadcast of the
    |sources|·|bands| offsets frame. Nothing global, nothing
    single-partition."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        (F.col("lang") == AUC_POS_LANG).cast("int").alias("y"),
        F.expr(_TTR_SPARK).alias("score"),
    )
    g = d.groupBy("source", "score").agg(
        F.count(F.lit(1)).alias("m"), F.sum("y").alias("pos")
    )
    g = g.withColumn("band", F.expr(f"score DIV {AUC_BAND_MICRO}"))
    intra = g.withColumn(
        "in_band_below",
        F.coalesce(
            F.sum("m").over(
                Window.partitionBy("source", "band")
                .orderBy("score")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    band_tot = g.groupBy("source", "band").agg(F.sum("m").alias("bm"))
    lower = band_tot.select(
        F.col("source").alias("l_source"),
        F.col("band").alias("l_band"),
        F.col("bm").alias("l_bm"),
    )
    offsets = (
        band_tot.join(
            F.broadcast(lower),
            (F.col("l_source") == F.col("source"))
            & (F.col("l_band") < F.col("band")),
            "left",
        )
        .groupBy("source", "band")
        .agg(F.coalesce(F.sum("l_bm"), F.lit(0)).alias("offset"))
    )
    cum = intra.join(offsets, ["source", "band"]).withColumn(
        "below", F.col("offset") + F.col("in_band_below")
    )
    per_src = cum.groupBy("source").agg(
        F.sum(
            F.col("pos") * (F.lit(2) * F.col("below") + F.col("m") + 1)
        ).alias("r2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("m") - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    return per_src.select(
        "source",
        "n_pos",
        "n_neg",
        F.expr(
            "(r2 - n_pos * (n_pos + 1)) * 1000000"
            " DIV (2 * greatest(n_pos, 1) * greatest(n_neg, 1))"
        )
        .cast("bigint")
        .alias("auc_micro"),
    )


# --------------------------------------------------------------------
# Shard manifest digests (order-independent content addressing)
# --------------------------------------------------------------------

MAN_N_SHARDS = 16
MAN_MOD_A = 1_000_003
MAN_MOD_B = 1_000_033


def _manifest_oracle() -> str:
    return f"""
    WITH h AS (
      SELECT doc_id % {MAN_N_SHARDS} AS shard_id,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
      FROM documents
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(h % {MAN_MOD_A}) AS BIGINT) AS digest_a,
           CAST(sum((h // 1048576) % {MAN_MOD_B}) AS BIGINT) AS digest_b,
           CAST(min(h) AS BIGINT) AS min_h,
           CAST(max(h) AS BIGINT) AS max_h
    FROM h GROUP BY 1
    """


@stage(
    "corpus_shard_manifest_digests",
    oracle=_manifest_oracle(),
    tags=("llm", "governance", "manifest"),
)
def corpus_shard_manifest_digests(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-independent per-shard content digests — the dataset-
    versioning primitive: each shard (doc_id mod {MAN_N_SHARDS})
    publishes its doc count, two modular sums of per-doc content
    hashes (60-bit md5-prefix integers, the repo's cross-engine hash
    convention), and the hash extremes. Two corpus snapshots compare
    manifests shard-by-shard to locate what changed WITHOUT
    re-reading either side — the content-addressing idea behind
    Merkle manifests, with the tree replaced by commutative modular
    sums so the digest is a plain distributable hash aggregate
    (order- and partitioning-independent by construction: a sum over
    a commutative monoid). Two independent moduli make a silent
    collision require agreeing twice (~1e-12 per shard pair).

    Exactness: md5 is identical in both engines; the hex-prefix→
    BIGINT parse is the proven overlap.py convention; modular terms
    are < 2^20·1e6, so int64 sums survive ~1e12 docs per shard.

    Scale (100 TB): ONE scan, one hash aggregate to
    {MAN_N_SHARDS} rows, map-side combinable — the cheapest possible
    shape; this is what you run after every ingest to version the
    corpus."""
    d = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % MAN_N_SHARDS).alias("shard_id"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    return d.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("h") % MAN_MOD_A).cast("bigint").alias("digest_a"),
        F.sum(F.expr(f"(h DIV 1048576) % {MAN_MOD_B}"))
        .cast("bigint")
        .alias("digest_b"),
        F.min("h").cast("bigint").alias("min_h"),
        F.max("h").cast("bigint").alias("max_h"),
    )


# --------------------------------------------------------------------
# Bradley–Terry preference-fit step (reward-model data pipeline)
# --------------------------------------------------------------------


def _bt_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id, source, {_TTR_DUCK} AS score FROM documents
    ), duels AS (
      SELECT a.source AS win_src, b.source AS lose_src
      FROM scored a
      JOIN scored b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
      WHERE a.source <> b.source AND a.score > b.score
      UNION ALL
      SELECT b.source AS win_src, a.source AS lose_src
      FROM scored a
      JOIN scored b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
      WHERE a.source <> b.source AND b.score > a.score
    ), games AS (
      SELECT win_src AS i, lose_src AS j, CAST(count(*) AS BIGINT) AS w
      FROM duels GROUP BY 1, 2
    ), pair_games AS (
      SELECT i, j,
             CAST(w + COALESCE((SELECT g2.w FROM games g2
                                WHERE g2.i = g.j AND g2.j = g.i), 0)
               AS BIGINT) AS n_ij
      FROM games g
    ), wins AS (
      SELECT i AS source, CAST(sum(w) AS BIGINT) AS wins
      FROM games GROUP BY 1
    ), tot_games AS (
      SELECT i AS source, CAST(sum(n_ij) AS BIGINT) AS games
      FROM pair_games GROUP BY 1
    ), denom AS (
      -- uniform start s = 1e6 for every item: s_i + s_j = 2e6
      SELECT i AS source,
             CAST(sum(n_ij * 1000000 // 2000000) AS BIGINT) AS dn
      FROM pair_games GROUP BY 1
    ), step AS (
      SELECT w.source, w.wins, t.games,
             CAST(w.wins * 1000000 // greatest(d.dn, 1) AS BIGINT) AS s1
      FROM wins w
      JOIN tot_games t USING (source)
      JOIN denom d USING (source)
    ), norm AS (
      SELECT CAST(sum(s1) AS BIGINT) AS z FROM step
    )
    SELECT s.source, s.wins, s.games,
           CAST(s.s1 * 1000000 // greatest(n.z, 1) AS BIGINT)
             AS bt_score_micro
    FROM step s CROSS JOIN norm n
    """


@stage(
    "orders_bradley_terry_step",
    oracle=_bt_oracle(),
    tags=("llm", "preference", "iterative"),
)
def orders_bradley_terry_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair aggregation + ONE Zermelo/MM Bradley–Terry
    update — the reward-model data-pipeline op (RLHF preference sets
    are exactly (winner, loser) duels; BT strengths are the classic
    fit, Zermelo 1929 / Hunter '04 MM): deterministic duels pair doc
    2k with doc 2k+1, the judge is the type-token-ratio quality score
    (score ties and same-source duels are skipped — no information),
    duels aggregate to source-level win/game counts, and one MM step
    from the uniform start yields s_i ∝ W_i / Σ_j n_ij/(s_i+s_j),
    normalized to micro. At the uniform start the denominator
    simplifies to Σ n_ij/2 — the oracle spells exactly that, so the
    hash pins the update's arithmetic, not just its shape. (Sources
    that never win keep no row in `wins` — emitted only via the win
    side, matching the MM convention that zero-win items need
    regularization before they get a finite strength.)

    NOTE the name says orders_* for historical slate-naming
    consistency with the events_/docs_ prefixes: the duel fixture is
    the documents table.

    Exactness: counts and integer micro DIVs with greatest(,1)
    guards; both engines walk the identical update.

    Scale (100 TB): the duel join is id-adjacent (co-partitioned on
    doc_id after one shuffle — at scale this is a self-join a
    bucketed layout makes free); everything after is
    |sources|²-bounded. One MM step per query keeps the iteration
    driver-side and stateless, the registered PageRank/Markov
    pattern."""
    scored = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_TTR_SPARK).alias("score")
    )
    a = scored.select(
        F.col("doc_id").alias("a_id"),
        F.col("source").alias("a_src"),
        F.col("score").alias("a_score"),
    ).filter(F.col("a_id") % 2 == 0)
    b = scored.select(
        (F.col("doc_id") - 1).alias("a_id"),
        F.col("source").alias("b_src"),
        F.col("score").alias("b_score"),
    ).filter(F.col("a_id") % 2 == 0)
    duels = (
        a.join(b, "a_id")
        .filter(
            (F.col("a_src") != F.col("b_src"))
            & (F.col("a_score") != F.col("b_score"))
        )
        .select(
            F.when(F.col("a_score") > F.col("b_score"), F.col("a_src"))
            .otherwise(F.col("b_src"))
            .alias("win_src"),
            F.when(F.col("a_score") > F.col("b_score"), F.col("b_src"))
            .otherwise(F.col("a_src"))
            .alias("lose_src"),
        )
    )
    games = duels.groupBy(
        F.col("win_src").alias("i"), F.col("lose_src").alias("j")
    ).agg(F.count(F.lit(1)).alias("w"))
    rev = games.select(
        F.col("j").alias("i"), F.col("i").alias("j"), F.col("w").alias("rw")
    )
    pair_games = (
        games.join(F.broadcast(rev), ["i", "j"], "left")
        .withColumn("n_ij", F.col("w") + F.coalesce("rw", F.lit(0)))
        .select("i", "j", "w", "n_ij")
    )
    wins = pair_games.groupBy(F.col("i").alias("source")).agg(
        F.sum("w").cast("bigint").alias("wins"),
        F.sum("n_ij").cast("bigint").alias("games"),
        F.sum(F.expr("n_ij * 1000000 DIV 2000000")).alias("dn"),
    )
    step = wins.select(
        "source",
        "wins",
        "games",
        F.expr("wins * 1000000 DIV greatest(dn, 1)").alias("s1"),
    )
    norm = step.agg(F.sum("s1").alias("z"))
    return (
        step.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "wins",
            "games",
            F.expr("s1 * 1000000 DIV greatest(z, 1)")
            .cast("bigint")
            .alias("bt_score_micro"),
        )
    )


# --------------------------------------------------------------------
# Dup-cluster stability across Jaccard thresholds
# --------------------------------------------------------------------

DCS_THRESHOLDS_CENTI = (30, 50, 70)  # tau ladder in centi units


def _cluster_stability_oracle() -> str:
    from .dedup import GRAMS_CTE_SQL, JACCARD_PAIRS_SQL

    branches = []
    for tc in DCS_THRESHOLDS_CENTI:
        branches.append(
            f"""
    sel_{tc} AS MATERIALIZED (
      SELECT doc_a, doc_b FROM pairs WHERE jaccard >= {tc} / 100.0
    ),
    edges_{tc} AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM sel_{tc}
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM sel_{tc}
    ),
    reach_{tc}(node, lbl) AS (
      SELECT src, src FROM edges_{tc}
      UNION
      SELECT e.dst, r.lbl
      FROM reach_{tc} r JOIN edges_{tc} e ON e.src = r.node
      WHERE r.lbl < e.dst
    ),
    comp_{tc} AS (
      SELECT node, min(lbl) AS component FROM reach_{tc} GROUP BY node
    ),
    sizes_{tc} AS (
      SELECT component, count(*) AS sz FROM comp_{tc} GROUP BY component
    ),
    row_{tc} AS (
      SELECT CAST({tc} AS BIGINT) AS threshold_centi,
             CAST((SELECT count(*) FROM sel_{tc}) AS BIGINT) AS n_edges,
             CAST(COALESCE(count(*), 0) AS BIGINT) AS n_clusters,
             CAST(COALESCE(sum(sz), 0) AS BIGINT) AS n_docs_clustered,
             CAST(COALESCE(max(sz), 0) AS BIGINT) AS max_cluster_size
      FROM sizes_{tc}
    )"""
        )
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT * FROM row_{tc}" for tc in DCS_THRESHOLDS_CENTI
    )
    return f"""
    WITH RECURSIVE g AS MATERIALIZED (
{GRAMS_CTE_SQL}
    ),
    pairs AS MATERIALIZED (
{JACCARD_PAIRS_SQL}
    ),{",".join(branches)}
    {unions}
    """


@stage(
    "docs_dup_cluster_stability",
    oracle=_cluster_stability_oracle(),
    tags=("llm", "dedup", "iterative", "eval"),
)
def docs_dup_cluster_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster structure as a function of the Jaccard
    threshold — for τ ∈ {DCS_THRESHOLDS_CENTI} (centi), the edge
    count, connected-component count, clustered-doc count, and max
    cluster size. This is the knob-sensitivity table read before
    committing a dedup threshold: a max cluster that EXPLODES between
    two τ rungs marks the percolation point where near-dup transitive
    closure starts chaining unrelated documents (the known failure
    mode of aggressive fuzzy dedup — cf. the cluster-size blowups
    documented in large web-dedup reports), while stable counts mean
    the threshold sits on a plateau.

    Composes the registered pair generator verbatim (one
    checkpointed pair materialization feeds all rungs — pairs are
    computed ONCE at the permissive base τ=0.30 and re-filtered) and
    the registered min-label-propagation ``connected_components``
    per rung; the DuckDB twin re-walks each rung with a recursive
    CTE over the same deterministic edges.

    Exactness: integer counts; τ compares 6-dp-rounded jaccard
    against exact centi literals in both engines.

    Scale (100 TB): pair generation is the registered posting-list
    plan (never all-pairs); each rung's CC runs on the EDGE frame
    (near-dups are rare — edge count ≪ corpus), label-prop rounds
    are edge-frame joins with per-round checkpoints, the registered
    ``docs_dup_clusters`` shape ×|ladder|."""
    from .clusters import connected_components
    from .dedup import docs_ngram_jaccard_pairs

    pairs = docs_ngram_jaccard_pairs(spark, sf_dir).localCheckpoint(
        eager=True
    )
    out = None
    for tc in DCS_THRESHOLDS_CENTI:
        sel = pairs.filter(F.col("jaccard") >= tc / 100.0)
        n_edges = sel.select(
            F.count(F.lit(1)).cast("bigint").alias("n_edges")
        )
        comp = connected_components(
            sel.select(
                F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
            )
        )
        sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        row = (
            sizes.agg(
                F.coalesce(F.count(F.lit(1)), F.lit(0))
                .cast("bigint")
                .alias("n_clusters"),
                F.coalesce(F.sum("sz"), F.lit(0))
                .cast("bigint")
                .alias("n_docs_clustered"),
                F.coalesce(F.max("sz"), F.lit(0))
                .cast("bigint")
                .alias("max_cluster_size"),
            )
            .crossJoin(F.broadcast(n_edges))
            .select(
                F.lit(tc).cast("bigint").alias("threshold_centi"),
                "n_edges",
                "n_clusters",
                "n_docs_clustered",
                "max_cluster_size",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------
# Label-centroid shift (embedding-space monitoring)
# --------------------------------------------------------------------


def _centroid_shift_oracle() -> str:
    return """
    WITH q AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0, 0)
               AS BIGINT) AS qv
      FROM embeddings
    ), sums AS (
      SELECT label, dim, CAST(sum(qv) AS BIGINT) AS s
      FROM q GROUP BY 1, 2
    ), cents AS (
      SELECT label,
             list(CAST(s AS DOUBLE) ORDER BY dim) AS v,
             sqrt(list_reduce(list_transform(
               list(CAST(s AS DOUBLE) ORDER BY dim), x -> x * x),
               (a, b) -> a + b)) AS nrm
      FROM sums GROUP BY 1
    ), counts AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1
    )
    SELECT a.label AS label_a, b.label AS label_b,
           ca.n AS n_a, cb.n AS n_b,
           CAST(round(round(
             list_reduce(list_transform(list_zip(a.v, b.v),
                                        z -> z[1] * z[2]),
                         (acc, x) -> acc + x) / (a.nrm * b.nrm), 6)
             * 1000000.0, 0) AS BIGINT) AS centroid_cos_micro
    FROM cents a
    JOIN cents b ON a.label < b.label
    JOIN counts ca ON ca.label = a.label
    JOIN counts cb ON cb.label = b.label
    """


@stage(
    "embeddings_label_centroid_shift",
    oracle=_centroid_shift_oracle(),
    tags=("llm", "similarity", "monitoring"),
)
def embeddings_label_centroid_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space monitoring: the pairwise cosine between LABEL
    CENTROIDS (all label pairs a < b, with group sizes). Centroid
    cosine is the collapse detector for an embedding space — labels
    whose centroids exceed ~0.9 are inseparable to a linear probe,
    and a centroid matrix drifting upward release-over-release means
    the space is degenerating (the embedding-drift check run when a
    new encoder version ships).

    Exactness: elements are micro-quantized to BIGINT FIRST, so the
    per-(label, dim) sums are exact integers in any aggregation
    order; cosine is scale-invariant, so SUM vectors stand in for
    means exactly; the final cosine is the 6-dp-round micro pattern
    over integer-valued doubles folded in the same left-to-right
    order in both engines (the margin-mining convention).

    Scale (100 TB): one corpus scan explodes to (label, dim) — a
    |labels|·d hash aggregate with map-side combine (the PCA moment
    shape); everything after is |labels|-sized. No window, no
    all-pairs over rows."""
    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1e6, 0).cast("bigint"),
            )
        ).alias("dim0", "qv"),
    )
    sums = q.groupBy("label", "dim0").agg(F.sum("qv").alias("s"))
    cents = (
        sums.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim0", F.col("s")))
                ),
                lambda st: st["s"].cast("double"),
            ).alias("v")
        )
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform("v", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
        )
    )
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    a = cents.select(
        F.col("label").alias("label_a"),
        F.col("v").alias("av"),
        F.col("nrm").alias("anrm"),
    )
    b = cents.select(
        F.col("label").alias("label_b"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
    )
    dot = F.aggregate(
        F.zip_with("av", "bv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ca = counts.select(
        F.col("label").alias("label_a"), F.col("n").alias("n_a")
    )
    cb = counts.select(
        F.col("label").alias("label_b"), F.col("n").alias("n_b")
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(F.round(dot / (F.col("anrm") * F.col("bnrm")), 6) * 1e6, 0)
            .cast("bigint")
            .alias("centroid_cos_micro"),
        )
        .join(F.broadcast(ca), "label_a")
        .join(F.broadcast(cb), "label_b")
        .select(
            "label_a", "label_b", "n_a", "n_b", "centroid_cos_micro"
        )
    )


# --------------------------------------------------------------------
# Matryoshka truncation recall curve (dimension-vs-recall design table)
# --------------------------------------------------------------------

MRC_K = 5
MRC_N_PROBES = 10
MRC_DIMS = (8, 16, 32)


def _matryoshka_recall_oracle() -> str:
    from .staged_r11 import _COS_MICRO_SQL

    hh = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 2)"
    cos_full = _COS_MICRO_SQL.format(a="p", b="n")

    def trunc_block(m: int) -> str:
        return f"""
    t{m} AS (
      SELECT p.probe_id, n.vec_id,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY CAST(round(round(
                 list_reduce(list_transform(
                   list_zip(p.v[1:{m}], n.v[1:{m}]), z -> z[1] * z[2]),
                   (acc, x) -> acc + x)
                 / (sqrt(list_reduce(list_transform(p.v[1:{m}],
                      x -> x * x), (a, b) -> a + b))
                    * sqrt(list_reduce(list_transform(n.v[1:{m}],
                        x -> x * x), (a, b) -> a + b))), 6)
                 * 1000000.0, 0) AS BIGINT) DESC, n.vec_id
             ) AS rk
      FROM probes p JOIN vecs n ON n.vec_id <> p.probe_id
      QUALIFY rk <= {MRC_K}
    ),
    r{m} AS (
      SELECT CAST({m} AS BIGINT) AS m_dims,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_found
      FROM truth tr
      LEFT JOIN t{m} t ON t.probe_id = tr.probe_id
                      AND t.vec_id = tr.neighbor_id
    )"""

    blocks = ",".join(trunc_block(m) for m in MRC_DIMS)
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT m_dims, n_true, n_found,"
        f" n_found * 1000000 // n_true AS recall_micro FROM r{m}"
        for m in MRC_DIMS
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
    ), probes AS (
      SELECT vec_id AS probe_id, v, nrm FROM vecs
      WHERE hh >= 'e6' ORDER BY vec_id LIMIT {MRC_N_PROBES}
    ), truth AS (
      SELECT p.probe_id, n.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY p.probe_id
                                ORDER BY {cos_full} DESC, n.vec_id) AS rk
      FROM probes p JOIN vecs n ON n.vec_id <> p.probe_id
      QUALIFY rk <= {MRC_K}
    ),{blocks}
    {unions}
    """


@stage(
    "embeddings_matryoshka_recall_curve",
    oracle=_matryoshka_recall_oracle(),
    tags=("llm", "similarity", "ann", "matryoshka"),
)
def embeddings_matryoshka_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Matryoshka truncation design table: recall@{MRC_K} of
    TRUNCATED-dimension cosine ranking (first m dims, m ∈ {MRC_DIMS})
    against the full-dimension truth, over the bounded probe block —
    the dimension-vs-recall curve an MRL deployment reads to pick its
    prefix length (Kusupati et al. '22: nested representations let
    one index serve many dims; this prices each rung). The registered
    ``knn_matryoshka_rerank`` USES a truncated prefix; this measures
    what each prefix costs in recall, the same relationship the IVF
    nprobe curve has to the IVF queries.

    Exactness: all comparisons on 6-dp-round micro cosines (each
    truncation with its OWN prefix norms) with vec_id tie-breaks;
    recall is integer micro DIV.

    Scale (100 TB): the corpus streams ONCE per rung against the
    broadcast constant probe block (per-probe top-k windows) — the
    registered brute-force-kNN shape ×|ladder|; no corpus-side
    all-pairs."""
    from .similarity import _dot, _norm

    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2).alias("hh"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).select("vec_id", "v", "hh", _norm(F.col("v")).alias("nrm"))
    probes = (
        vecs.filter(F.col("hh") >= "e6")
        .orderBy("vec_id")
        .limit(MRC_N_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("v").alias("pv"),
            F.col("nrm").alias("pnrm"),
        )
    )

    def cos_micro(av, anrm, bv, bnrm):
        return F.round(
            F.round(_dot(av, bv) / (anrm * bnrm), 6) * 1e6, 0
        ).cast("bigint")

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("c_micro"), F.asc("vec_id")
    )
    base = vecs.crossJoin(F.broadcast(probes)).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    truth = (
        base.select(
            "probe_id",
            "vec_id",
            cos_micro(
                F.col("pv"), F.col("pnrm"), F.col("v"), F.col("nrm")
            ).alias("c_micro"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MRC_K)
        .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        .localCheckpoint(eager=True)
    )
    out = None
    for m in MRC_DIMS:
        pv_m = F.slice("pv", 1, m)
        v_m = F.slice("v", 1, m)
        trunc = (
            base.select(
                "probe_id",
                "vec_id",
                cos_micro(pv_m, _norm(pv_m), v_m, _norm(v_m)).alias(
                    "c_micro"
                ),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= MRC_K)
            .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        )
        row = (
            truth.join(
                trunc.withColumn("hit", F.lit(1)),
                ["probe_id", "neighbor_id"],
                "left",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_true"),
                F.sum(F.coalesce("hit", F.lit(0)))
                .cast("bigint")
                .alias("n_found"),
            )
            .select(
                F.lit(m).cast("bigint").alias("m_dims"),
                "n_true",
                "n_found",
                F.expr("n_found * 1000000 DIV n_true").alias(
                    "recall_micro"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------
# Stream-state size pricing (the other half of the watermark tradeoff)
# --------------------------------------------------------------------

SSS_DELAYS_S = (0, 60, 300, 1800)


def _state_size_oracle() -> str:
    delays = ", ".join(str(s) for s in SSS_DELAYS_S)
    return f"""
    WITH e AS (
      SELECT event_type,
             date_diff('microsecond',
                       TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
      FROM events
    ), mx AS (
      SELECT event_type, max(ts_us) AS max_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM e GROUP BY 1
    )
    SELECT m.event_type,
           CAST(l.delay_s AS BIGINT) AS delay_s,
           m.n_events,
           CAST(sum(CASE WHEN e.ts_us >= m.max_us - l.delay_s * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_state_rows,
           CAST(sum(CASE WHEN e.ts_us >= m.max_us - l.delay_s * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // m.n_events AS state_share_micro
    FROM e
    JOIN mx m USING (event_type)
    CROSS JOIN (SELECT unnest([{delays}]) AS delay_s) l
    GROUP BY 1, 2, 3
    """


@stage(
    "events_stream_state_size_sweep",
    oracle=_state_size_oracle(),
    tags=("streaming", "events", "contract"),
)
def events_stream_state_size_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The OTHER half of the watermark tradeoff: for each candidate
    delay, the exact count of rows a stateful streaming dedup
    (``dropDuplicatesWithinWatermark``) would have to RETAIN at the
    head of this stream — rows within `delay` of the per-source max
    event time. Together with the staged late-arrival sweep this
    completes the pricing pair: delay up → fewer drops but more
    state; this table is the state axis. (The retention rule is
    exactly the state-eviction bound: a row older than
    max_event_time − delay can no longer collide with an admissible
    arrival, so the store evicts it.)

    Exactness: micros since the naive epoch anchor (the established
    timestampdiff pattern); counts; one micro DIV.

    Scale (100 TB): one scan to a per-source max (scalar per
    source, broadcastable), one re-scan with the constant delay
    ladder fanout into a per-(source, delay) count — both hash
    aggregates map-side combinable; no window at all."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    mx = e.groupBy("event_type").agg(
        F.max("ts_us").alias("max_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    ladder = spark.createDataFrame(
        [(s,) for s in SSS_DELAYS_S], "delay_s long"
    )
    in_state = (
        F.col("ts_us") >= F.col("max_us") - F.col("delay_s") * 1000000
    ).cast("int")
    return (
        e.join(F.broadcast(mx), "event_type")
        .crossJoin(F.broadcast(ladder))
        .groupBy("event_type", "delay_s", "n_events")
        .agg(F.sum(in_state).cast("bigint").alias("n_state_rows"))
        .select(
            "event_type",
            "delay_s",
            "n_events",
            "n_state_rows",
            F.expr("n_state_rows * 1000000 DIV n_events").alias(
                "state_share_micro"
            ),
        )
    )


# --------------------------------------------------------------------
# Funnel attribution models (first / last / linear credit)
# --------------------------------------------------------------------

ATTR_CONVERSION = "purchase"


def _attribution_oracle() -> str:
    return f"""
    WITH conv AS (
      SELECT user_id, event_id AS conv_id FROM events
      WHERE event_type = '{ATTR_CONVERSION}'
    ), touches AS (
      SELECT c.conv_id, e.event_id, e.event_type AS channel
      FROM conv c
      JOIN events e ON e.user_id = c.user_id
                   AND e.event_id < c.conv_id
                   AND e.event_type <> '{ATTR_CONVERSION}'
    ), stats AS (
      SELECT conv_id,
             CAST(count(*) AS BIGINT) AS n_touch,
             min(event_id) AS first_id,
             max(event_id) AS last_id
      FROM touches GROUP BY 1
    ), credited AS (
      SELECT t.channel, 'first_touch' AS model,
             CASE WHEN t.event_id = s.first_id THEN 1000000 ELSE 0 END
               AS credit,
             t.conv_id
      FROM touches t JOIN stats s USING (conv_id)
      UNION ALL
      SELECT t.channel, 'last_touch' AS model,
             CASE WHEN t.event_id = s.last_id THEN 1000000 ELSE 0 END
               AS credit,
             t.conv_id
      FROM touches t JOIN stats s USING (conv_id)
      UNION ALL
      SELECT t.channel, 'linear' AS model,
             1000000 // s.n_touch
               + CASE WHEN t.event_id = s.last_id
                      THEN 1000000 % s.n_touch ELSE 0 END AS credit,
             t.conv_id
      FROM touches t JOIN stats s USING (conv_id)
    )
    SELECT model, channel,
           CAST(sum(credit) AS BIGINT) AS credit_micro,
           CAST(count(DISTINCT CASE WHEN credit > 0 THEN conv_id END)
             AS BIGINT) AS n_conversions
    FROM credited GROUP BY 1, 2
    """


@stage(
    "events_funnel_attribution_models",
    oracle=_attribution_oracle(),
    tags=("events", "analytics", "attribution"),
)
def events_funnel_attribution_models(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Marketing-attribution model comparison over the event stream:
    every '{ATTR_CONVERSION}' conversion credits its user's PRIOR
    touches (arrival order = event_id) under three standard models —
    first-touch (1e6 to the earliest touch), last-touch (1e6 to the
    latest — the registered ``asof_last_click`` convention), and
    linear (1e6 DIV n split evenly, integer remainder assigned to the
    last touch so each conversion's credit sums to EXACTLY 1e6). The
    per-(model, channel) credit totals are the budget-allocation
    table; running all three side-by-side is the standard
    model-sensitivity report.

    Exactness: integer micro credits with an exact-conservation
    remainder rule; counts.

    Scale (100 TB): the touch join is user-keyed (conversions and
    touches co-partition on user_id — one shuffle each side; per-user
    fan-out is bounded by per-user activity, the sessionization
    assumption); stats and credit rollups are hash aggregates with
    map-side combine. No windows over the full stream."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type"
    )
    conv = e.filter(F.col("event_type") == ATTR_CONVERSION).select(
        "user_id", F.col("event_id").alias("conv_id")
    )
    touches = (
        conv.join(e, "user_id")
        .filter(
            (F.col("event_id") < F.col("conv_id"))
            & (F.col("event_type") != ATTR_CONVERSION)
        )
        .select("conv_id", "event_id", F.col("event_type").alias("channel"))
    )
    stats = touches.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_touch"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
    )
    t = touches.join(stats, "conv_id")
    first = t.select(
        "channel",
        F.lit("first_touch").alias("model"),
        F.when(F.col("event_id") == F.col("first_id"), 1000000)
        .otherwise(0)
        .alias("credit"),
        "conv_id",
    )
    last = t.select(
        "channel",
        F.lit("last_touch").alias("model"),
        F.when(F.col("event_id") == F.col("last_id"), 1000000)
        .otherwise(0)
        .alias("credit"),
        "conv_id",
    )
    linear = t.select(
        "channel",
        F.lit("linear").alias("model"),
        (
            F.expr("1000000 DIV n_touch")
            + F.when(
                F.col("event_id") == F.col("last_id"),
                F.expr("1000000 % n_touch"),
            ).otherwise(0)
        ).alias("credit"),
        "conv_id",
    )
    return (
        first.unionByName(last)
        .unionByName(linear)
        .groupBy("model", "channel")
        .agg(
            F.sum("credit").cast("bigint").alias("credit_micro"),
            F.countDistinct(
                F.when(F.col("credit") > 0, F.col("conv_id"))
            )
            .cast("bigint")
            .alias("n_conversions"),
        )
    )


# --------------------------------------------------------------------
# Token-budget ladder (quality-vs-budget tradeoff curve)
# --------------------------------------------------------------------

TBL_SHARES_PPM = (125_000, 250_000, 500_000)


def _budget_ladder_oracle() -> str:
    from .quality import REQUIRED_STOPWORDS

    shares = ", ".join(str(s) for s in TBL_SHARES_PPM)
    return f"""
    WITH feat AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             least(9000 * len(list_distinct(string_split(text, ' ')))
                   + 30000 * len(list_filter(string_split(text, ' '),
                                             x -> x IN {REQUIRED_STOPWORDS!r})),
                   1000000) AS p_micro
      FROM documents
    ), buckets AS (
      SELECT least(p_micro // 100000, 9) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens
      FROM feat GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(tokens) AS BIGINT) AS t_all FROM buckets
    ), cum AS (
      SELECT a.bucket, a.n_docs, a.tokens,
             CAST(sum(CASE WHEN b.bucket > a.bucket THEN b.tokens
                           ELSE 0 END) AS BIGINT) AS cum_above
      FROM buckets a CROSS JOIN buckets b
      GROUP BY a.bucket, a.n_docs, a.tokens
    ), ladder AS (
      SELECT unnest([{shares}]) AS share_ppm
    ), taken AS (
      SELECT l.share_ppm, c.bucket, c.tokens,
             t.t_all * l.share_ppm // 1000000 AS budget_tokens,
             CAST(CASE
               WHEN c.cum_above >= t.t_all * l.share_ppm // 1000000 THEN 0
               WHEN c.cum_above + c.tokens
                    <= t.t_all * l.share_ppm // 1000000 THEN c.tokens
               ELSE t.t_all * l.share_ppm // 1000000 - c.cum_above
             END AS BIGINT) AS take
      FROM cum c CROSS JOIN ladder l CROSS JOIN tot t
    )
    SELECT CAST(share_ppm AS BIGINT) AS share_ppm,
           CAST(max(budget_tokens) AS BIGINT) AS budget_tokens,
           CAST(sum(take) AS BIGINT) AS kept_tokens,
           CAST(sum(CASE WHEN take = tokens AND tokens > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_buckets,
           CAST(min(CASE WHEN take > 0 THEN bucket END) AS BIGINT)
             AS marginal_bucket,
           CAST(sum(bucket * take) * 1000000
                // greatest(sum(take), 1) AS BIGINT)
             AS quality_index_micro
    FROM taken GROUP BY 1
    """


@stage(
    "corpus_token_budget_ladder",
    oracle=_budget_ladder_oracle(),
    tags=("llm", "selection", "mixture"),
)
def corpus_token_budget_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-vs-budget TRADEOFF CURVE: the staged-r10 water-fill
    (keep the best X tokens, filling quality buckets from the top,
    the marginal bucket taking the exact remainder) evaluated at
    {TBL_SHARES_PPM} ppm of corpus tokens IN ONE PASS — per budget
    rung: the exact budget, kept tokens (== budget by the fill
    invariant), fully-taken bucket count, the marginal bucket, and
    the token-weighted mean quality-bucket index of the kept mass.
    This is the table a data-constrained run reads to price "how much
    average quality do I buy by training on less" (the
    quality-quantity tradeoff of Gadre et al./DataComp and the
    data-constrained scaling analyses).

    Exactness: the proven sortless histogram-cut machinery (bucket
    table ≤ 10 rows) × a constant ladder; integer micro arithmetic
    with the established greatest(,1) guard.

    Scale (100 TB): identical to the registered water-fill — ONE
    corpus scan to a ≤10-row bucket histogram; the ladder fan-out and
    fill arithmetic run on bucket×ladder metadata."""
    from .quality import REQUIRED_STOPWORDS

    d = load(spark, sf_dir, "documents")
    sw = ", ".join(f"'{w}'" for w in REQUIRED_STOPWORDS)
    feat = d.select(
        F.expr("size(split(text, ' '))").alias("n_tokens"),
        F.expr(
            "least(9000 * size(array_distinct(split(text, ' ')))"
            f" + 30000 * size(filter(split(text, ' '), x -> x IN ({sw}))),"
            " 1000000)"
        ).alias("p_micro"),
    )
    buckets = feat.groupBy(
        F.expr("least(p_micro DIV 100000, 9)").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
    )
    tot = buckets.agg(F.sum("tokens").alias("t_all"))
    above = buckets.select(
        F.col("bucket").alias("b_bucket"), F.col("tokens").alias("b_tokens")
    )
    cum = (
        buckets.crossJoin(F.broadcast(above))
        .groupBy("bucket", "n_docs", "tokens")
        .agg(
            F.sum(
                F.when(
                    F.col("b_bucket") > F.col("bucket"), F.col("b_tokens")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("cum_above")
        )
    )
    ladder = spark.createDataFrame(
        [(s,) for s in TBL_SHARES_PPM], "share_ppm long"
    )
    taken = (
        cum.crossJoin(F.broadcast(ladder))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "budget_tokens", F.expr("t_all * share_ppm DIV 1000000")
        )
        .withColumn(
            "take",
            F.when(F.col("cum_above") >= F.col("budget_tokens"), 0)
            .when(
                F.col("cum_above") + F.col("tokens")
                <= F.col("budget_tokens"),
                F.col("tokens"),
            )
            .otherwise(F.col("budget_tokens") - F.col("cum_above"))
            .cast("bigint"),
        )
    )
    return taken.groupBy("share_ppm").agg(
        F.max("budget_tokens").cast("bigint").alias("budget_tokens"),
        F.sum("take").cast("bigint").alias("kept_tokens"),
        F.sum(
            F.when(
                (F.col("take") == F.col("tokens")) & (F.col("tokens") > 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_full_buckets"),
        F.min(F.when(F.col("take") > 0, F.col("bucket")))
        .cast("bigint")
        .alias("marginal_bucket"),
        F.expr(
            "CAST(sum(bucket * take) * 1000000"
            " DIV greatest(sum(take), 1) AS BIGINT)"
        ).alias("quality_index_micro"),
    )


# --------------------------------------------------------------------
# Dedup ROI curve (method comparison table)
# --------------------------------------------------------------------


def _dedup_roi_oracle() -> str:
    from .clusters import _clusters_oracle
    from .segdedup import _SEGDEDUP_ORACLE

    return f"""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS docs_before,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS words_before
      FROM documents
    ), exact_kept AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), exact_row AS (
      SELECT 'exact' AS method,
             CAST(count(*) AS BIGINT) AS docs_after,
             CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
               AS words_after
      FROM exact_kept k JOIN documents d USING (doc_id)
    ), clusters AS ({_clusters_oracle()}
    ), neardup_row AS (
      SELECT 'neardup_cluster' AS method,
             CAST(count(*) AS BIGINT) AS docs_after,
             CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
               AS words_after
      FROM clusters c JOIN documents d USING (doc_id)
      WHERE c.doc_id = c.cluster_rep
    ), seg AS ({_SEGDEDUP_ORACLE}
    ), segment_row AS (
      SELECT 'segment' AS method,
             CAST(count(*) AS BIGINT) AS docs_after,
             CAST(sum(CASE WHEN clean_text = '' THEN 0
                      ELSE len(string_split(clean_text, ' ')) END)
               AS BIGINT) AS words_after
      FROM seg
    ), rows_u AS (
      SELECT * FROM exact_row
      UNION ALL SELECT * FROM neardup_row
      UNION ALL SELECT * FROM segment_row
    )
    SELECT r.method, b.docs_before, r.docs_after,
           b.words_before, r.words_after,
           CAST((b.words_before - r.words_after) * 1000000
                // b.words_before AS BIGINT) AS removed_share_micro
    FROM rows_u r CROSS JOIN base b
    """


@stage(
    "docs_dedup_roi_curve",
    oracle=_dedup_roi_oracle(),
    tags=("llm", "dedup", "eval", "report"),
)
def docs_dedup_roi_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup METHOD-COMPARISON table: exact (content-hash),
    near-dup cluster apply (MinHash-family transitive closure, keep
    the min-id representative), and aligned-segment dedup
    (CCNet-style sub-document removal) run side by side over the same
    corpus, each summarized to docs/words before/after and the
    removed-word share. This is the ROI report a curation pipeline
    reads to decide how aggressive to be: exact is free and safe,
    cluster apply removes whole near-dup docs, segment dedup removes
    boilerplate INSIDE surviving docs — the three rungs of the
    standard dedup ladder (cf. the deduplication ablations of Lee et
    al. '22 and CCNet).

    Composes the three REGISTERED queries verbatim on both sides
    (Spark: the registered fns; oracle: the registered oracle SQL
    imported from their modules — the staged-r8 composition rule).

    Exactness: counts and one micro DIV; word counts on the same
    single-space split in both engines (empty reassembled docs
    guarded to 0).

    Scale (100 TB): the members' own proven plans plus three scalar
    summaries; the union is 3 rows."""
    from ..plans.curation import docs_dedup_apply
    from .dedup import docs_exact_dedup
    from .segdedup import docs_segment_dedup_apply

    d = load(spark, sf_dir, "documents")
    words = F.expr("size(split(text, ' '))")
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_before"),
        F.sum(words).cast("bigint").alias("words_before"),
    )
    exact_row = (
        docs_exact_dedup(spark, sf_dir)
        .select("doc_id")
        .join(d, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_after"),
            F.sum(words).cast("bigint").alias("words_after"),
        )
        .select(F.lit("exact").alias("method"), "docs_after", "words_after")
    )
    neardup_row = (
        docs_dedup_apply(spark, sf_dir)
        .select("doc_id")
        .join(d, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_after"),
            F.sum(words).cast("bigint").alias("words_after"),
        )
        .select(
            F.lit("neardup_cluster").alias("method"),
            "docs_after",
            "words_after",
        )
    )
    segment_row = (
        docs_segment_dedup_apply(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_after"),
            F.sum(
                F.when(F.col("clean_text") == "", 0).otherwise(
                    F.expr("size(split(clean_text, ' '))")
                )
            )
            .cast("bigint")
            .alias("words_after"),
        )
        .select(
            F.lit("segment").alias("method"), "docs_after", "words_after"
        )
    )
    return (
        exact_row.unionByName(neardup_row)
        .unionByName(segment_row)
        .crossJoin(F.broadcast(base))
        .select(
            "method",
            "docs_before",
            "docs_after",
            "words_before",
            "words_after",
            F.expr(
                "(words_before - words_after) * 1000000 DIV words_before"
            )
            .cast("bigint")
            .alias("removed_share_micro"),
        )
    )
