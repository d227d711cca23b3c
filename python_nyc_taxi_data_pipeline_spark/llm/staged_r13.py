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
    "docs_quality_auc_rank",
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
