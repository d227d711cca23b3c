"""Round-14 registration candidates — seed slate started in round 8.

Same staging mechanism as ``staged_r8``–``staged_r13``; the
evidence-window rotation is self-sustaining, so this slate grows
opportunistically. Promotion in round 14 via
``staged_r14.promote_to_registry(R14_BATCH)``.

The seed slate:

- ``embeddings_pq_adc_recall_curve``: the PQ design table — recall@5
  of asymmetric-distance (ADC) ranking vs the exact-L2 truth for
  M ∈ {2, 4, 8} subquantizers, over the bounded probe block. The
  registered PQ trio (codes → distortion → ADC search) prices ONE
  configuration; this curve prices the M axis, the byte-budget knob
  an IVF-PQ deployment actually turns (Jégou et al. '11).
- ``docs_string_pruning_contract``: zone-map file skipping for STRING
  predicates — per pseudo-file min/max text footers, the
  ``LIKE 'p%'`` qualification rule (min ≤ p‖'{' AND max ≥ p), and
  per-prefix counts of qualifying vs truly-matching files. The
  numeric z-order contract (registered r7) covers numeric zone maps;
  strings are where engines drift (collation, prefix-increment
  upper bounds), so the arithmetic gets its own oracle.
- ``docs_license_propagation_contract``: compliance propagation
  through dedup — each near-dup cluster's kept representative must
  carry the MOST RESTRICTIVE license among its members (max rank
  over a deterministic source→license map), with per-class kept and
  escalated counts. Dedup that silently launders a restricted
  document into a permissive representative is a legal bug, and this
  is the audit that catches it. Composes the registered cluster map
  verbatim on both engines.
- ``docs_bpe_vocab_size_curve``: corpus tokens + fertility as a
  function of the BPE merge budget (0/2/4/6, exact serial trainer) —
  the compression-vs-vocab curve; the oracle replays one training
  trajectory and summarizes its intermediate word tables.
- ``docs_image_text_alignment_contract``: cross-modal retrieval
  plumbing — deterministic image (patch-sum) and text (word-hash
  histogram) feature stubs, integer dot score matrix, per-text top-1
  with exact tie-breaks; the eval shape CLIP-style pairing uses.
- ``events_session_survival_curve``: session-duration CCDF at a
  threshold ladder over the registered 30-min-gap sessionization —
  the engagement survival table (exact Kaplan–Meier special case,
  no censoring in a bounded replay).
- ``lineitem_salted_join_contract``: the salted-JOIN skew pattern —
  fact side salted, dim side replicated per salt, joined on
  (key, salt); the plain three-table join is the oracle, proving the
  decomposition loses and duplicates nothing. The join-side twin of
  the registered salted-distinct contract.
- ``orders_temporal_dim_join``: SCD2 as-of dimension lookup — every
  order joins the dim version whose half-open validity interval
  contains its date; the oracle pins the boundary convention.
- ``nation_trade_reciprocity``: weighted reciprocity per exporter
  over the registered PageRank's trade edges (Σ min(w_ij, w_ji) /
  Σ w_ij) — hub-and-spoke vs balanced bilateral trade, the
  complementary structural read to PageRank's importance ranking.

Round-11 growth (slate 9 -> 10):

- ``docs_simhash_bit_bias``: fingerprint-health screen — per SimHash
  bit lane, the fraction of documents setting it (a healthy Charikar
  sketch is ≈50% everywhere); runs the production vote pipeline over
  the cross-engine md5 hash so DuckDB replays every vote.
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

R14_BATCH: tuple[str, ...] = (
    "docs_bpe_vocab_size_curve",
    "docs_image_text_alignment_contract",
    "docs_license_propagation_contract",
    "docs_simhash_bit_bias",
    "docs_string_pruning_contract",
    "embeddings_pq_adc_recall_curve",
    "events_session_survival_curve",
    "lineitem_salted_join_contract",
    "nation_trade_reciprocity",
    "orders_temporal_dim_join",
)


def promote_to_registry(names: list[str]) -> list[str]:
    """Round-14 registration in one call; ``names`` is REQUIRED —
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
# PQ-ADC recall curve over the subquantizer-count ladder
# --------------------------------------------------------------------

PQR_K = 5
PQR_N_PROBES = 10
PQR_MS = (2, 4, 8)  # subquantizer counts (d=64 divides all)
PQR_CODES = 4  # codebook entries per subspace: sub-vectors of vec_id < 4

# Distances compared as 6-dp-rounded micro ints (the established
# exactness pattern), with vec_id tie-breaks everywhere.
_D2_MICRO = "CAST(round(round({expr}, 6) * 1000000.0, 0) AS BIGINT)"


def _pq_recall_oracle() -> str:
    def sub_d2(av: str, bv: str, m: str, sd: str) -> str:
        """Squared L2 between subspace m of two DOUBLE[] lists."""
        return (
            f"list_reduce([({av}[{m} * {sd} + i] - {bv}[{m} * {sd} + i])"
            f" * ({av}[{m} * {sd} + i] - {bv}[{m} * {sd} + i])"
            f" for i in generate_series(1, {sd})], (a, b) -> a + b)"
        )

    def block(mm: int) -> str:
        sd = f"(64 // {mm})"
        d2_vs = sub_d2("v.v", "s.v", "sub.m", sd)
        d2_ps = sub_d2("p.v", "s.v", "sub.m", sd)
        return f"""
    codes_{mm} AS (
      SELECT v.vec_id, sub.m, s.code
      FROM e v
      CROSS JOIN (SELECT unnest(generate_series(0, {mm - 1})) AS m) sub
      CROSS JOIN seeds s
      QUALIFY row_number() OVER (
        PARTITION BY v.vec_id, sub.m
        ORDER BY {_D2_MICRO.format(expr=d2_vs)}, s.code) = 1
    ),
    lut_{mm} AS (
      SELECT p.probe_id, sub.m, s.code,
             {_D2_MICRO.format(expr=d2_ps)} AS d2_micro
      FROM probes p
      CROSS JOIN (SELECT unnest(generate_series(0, {mm - 1})) AS m) sub
      CROSS JOIN seeds s
    ),
    adc_{mm} AS (
      SELECT l.probe_id, c.vec_id,
             row_number() OVER (
               PARTITION BY l.probe_id
               ORDER BY sum(l.d2_micro) ASC, c.vec_id) AS rk
      FROM codes_{mm} c
      JOIN lut_{mm} l ON l.m = c.m AND l.code = c.code
      WHERE c.vec_id <> l.probe_id
      GROUP BY l.probe_id, c.vec_id
      QUALIFY rk <= {PQR_K}
    ),
    r_{mm} AS (
      SELECT CAST({mm} AS BIGINT) AS m_subq,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_found
      FROM truth t
      LEFT JOIN adc_{mm} a ON a.probe_id = t.probe_id
                          AND a.vec_id = t.neighbor_id
    )"""

    full_d2 = (
        "list_reduce(list_transform(list_zip(p.v, n.v),"
        " z -> (z[1] - z[2]) * (z[1] - z[2])), (a, b) -> a + b)"
    )
    hh = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 2)"
    blocks = ",".join(block(mm) for mm in PQR_MS)
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT m_subq, n_true, n_found,"
        f" n_found * 1000000 // n_true AS recall_micro FROM r_{mm}"
        for mm in PQR_MS
    )
    return f"""
    WITH e AS (
      SELECT vec_id, {hh} AS hh,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), seeds AS (
      SELECT vec_id AS code, v FROM e WHERE vec_id < {PQR_CODES}
    ), probes AS (
      SELECT vec_id AS probe_id, v FROM e
      WHERE hh >= 'e6' ORDER BY vec_id LIMIT {PQR_N_PROBES}
    ), truth AS (
      SELECT p.probe_id, n.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY {_D2_MICRO.format(expr=full_d2)} ASC, n.vec_id
             ) AS rk
      FROM probes p JOIN e n ON n.vec_id <> p.probe_id
      QUALIFY rk <= {PQR_K}
    ),{blocks}
    {unions}
    """


@stage(
    "embeddings_pq_adc_recall_curve",
    oracle=_pq_recall_oracle(),
    tags=("llm", "similarity", "ann", "pq"),
)
def embeddings_pq_adc_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PQ byte-budget design table: recall@{PQR_K} of
    asymmetric-distance (ADC) ranking vs the exact-L2 truth, for
    M ∈ {PQR_MS} subquantizers (codebook = sub-vectors of the
    {PQR_CODES} lowest vec_ids per subspace — the registered
    ``embeddings_pq_codes`` seeding convention). ADC sums the
    probe's per-subspace distance to each CANDIDATE'S CODE (not its
    raw sub-vector): the exact search a PQ index executes, where the
    probe side is exact and the corpus side is quantized (Jégou,
    Douze & Schmid '11). More subquantizers = finer quantization =
    higher recall at M bytes/vector; this curve prices that axis the
    way the registered IVF nprobe and Matryoshka dim curves price
    theirs.

    Exactness: every distance is a 6-dp-round micro int (per
    subspace BEFORE summation, so the ADC accumulation is integer);
    ranks tie-break on vec_id; recall is integer micro DIV.

    Scale (100 TB): per rung, assignment streams the corpus once
    against the broadcast M·{PQR_CODES}-entry codebook (zero
    shuffle), the probe LUT is |probes|·M·{PQR_CODES} rows
    (broadcast), and ADC is one (probe, vec) hash aggregate over the
    coded corpus + a per-probe top-k window — never a raw-vector
    pair join."""
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2).alias("hh"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)
    seeds = vecs.filter(F.col("vec_id") < PQR_CODES).select(
        F.col("vec_id").alias("code"), F.col("v").alias("sv")
    )
    probes = (
        vecs.filter(F.col("hh") >= "e6")
        .orderBy("vec_id")
        .limit(PQR_N_PROBES)
        .select(F.col("vec_id").alias("probe_id"), F.col("v").alias("pv"))
    )

    def d2_micro(av, bv, m: int, sd: int):
        return F.round(
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(av, m * sd + 1, sd),
                        F.slice(bv, m * sd + 1, sd),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            * 1e6,
            0,
        ).cast("bigint")

    full = F.round(
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("pv"), F.col("v"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        * 1e6,
        0,
    ).cast("bigint")
    w_truth = Window.partitionBy("probe_id").orderBy(
        F.asc("d2"), F.asc("vec_id")
    )
    truth = (
        vecs.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", full.alias("d2"))
        .withColumn("rk", F.row_number().over(w_truth))
        .filter(F.col("rk") <= PQR_K)
        .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        .localCheckpoint(eager=True)
    )
    out = None
    for mm in PQR_MS:
        sd = 64 // mm
        m_ids = spark.createDataFrame([(m,) for m in range(mm)], "m int")
        # corpus -> per-subspace code (argmin over the broadcast codebook)
        w_code = Window.partitionBy("vec_id", "m").orderBy(
            F.asc("d2"), F.asc("code")
        )
        codes = None
        lut = None
        for m in range(mm):
            c_m = (
                vecs.crossJoin(F.broadcast(seeds))
                .select(
                    "vec_id",
                    F.lit(m).alias("m"),
                    "code",
                    d2_micro(F.col("v"), F.col("sv"), m, sd).alias("d2"),
                )
            )
            codes = c_m if codes is None else codes.unionByName(c_m)
            l_m = (
                probes.crossJoin(F.broadcast(seeds))
                .select(
                    "probe_id",
                    F.lit(m).alias("m"),
                    "code",
                    d2_micro(F.col("pv"), F.col("sv"), m, sd).alias(
                        "d2_micro"
                    ),
                )
            )
            lut = l_m if lut is None else lut.unionByName(l_m)
        codes = (
            codes.withColumn("rn", F.row_number().over(w_code))
            .filter(F.col("rn") == 1)
            .select("vec_id", "m", "code")
        )
        w_adc = Window.partitionBy("probe_id").orderBy(
            F.asc("adc"), F.asc("vec_id")
        )
        adc = (
            codes.join(F.broadcast(lut), ["m", "code"])
            .filter(F.col("vec_id") != F.col("probe_id"))
            .groupBy("probe_id", "vec_id")
            .agg(F.sum("d2_micro").alias("adc"))
            .withColumn("rk", F.row_number().over(w_adc))
            .filter(F.col("rk") <= PQR_K)
            .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        )
        row = (
            truth.join(
                adc.withColumn("hit", F.lit(1)),
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
                F.lit(mm).cast("bigint").alias("m_subq"),
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
# String zone-map pruning contract
# --------------------------------------------------------------------

SPC_FILE_MOD = 24
SPC_PREFIXES = ("spark", "key", "zz")  # hit-heavy, hit-light, miss


def _string_pruning_oracle() -> str:
    rows = ", ".join(f"('{p}')" for p in SPC_PREFIXES)
    return f"""
    WITH files AS (
      SELECT doc_id % {SPC_FILE_MOD} AS file_id, text FROM documents
    ), footers AS (
      SELECT file_id, min(text) AS mn, max(text) AS mx,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM files GROUP BY 1
    ), preds AS (
      SELECT * FROM (VALUES {rows}) AS p(prefix)
    ), qual AS (
      SELECT p.prefix, f.file_id, f.n_rows,
             (f.mn <= p.prefix || '{{' AND f.mx >= p.prefix) AS qualifies
      FROM footers f CROSS JOIN preds p
    ), matches AS (
      SELECT p.prefix, fl.file_id,
             CAST(count(*) AS BIGINT) AS n_match_rows
      FROM files fl
      CROSS JOIN preds p
      WHERE fl.text LIKE p.prefix || '%'
      GROUP BY 1, 2
    )
    SELECT q.prefix,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN q.qualifies THEN 1 ELSE 0 END) AS BIGINT)
             AS n_files_qualifying,
           CAST(sum(CASE WHEN m.file_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_files_matching,
           CAST(COALESCE(sum(m.n_match_rows), 0) AS BIGINT) AS n_match_rows,
           CAST(sum(CASE WHEN m.file_id IS NOT NULL AND NOT q.qualifies
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_prunes
    FROM qual q
    LEFT JOIN matches m ON m.prefix = q.prefix AND m.file_id = q.file_id
    GROUP BY q.prefix
    """


@stage(
    "docs_string_pruning_contract",
    oracle=_string_pruning_oracle(),
    tags=("layout", "pruning", "contract"),
)
def docs_string_pruning_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone-map file skipping for STRING predicates, oracle-pinned:
    pseudo-files (doc_id mod {SPC_FILE_MOD}) publish min/max text
    footers, and a ``LIKE 'p%'`` predicate may skip any file failing
    ``min ≤ p‖'{{' AND max ≥ p`` (the prefix-increment upper bound —
    '{{' sorts just above 'z', so every string starting with p is
    < p‖'{{' on this all-lowercase fixture; a production engine uses
    the successor byte, same arithmetic). Per prefix the contract
    reports total/qualifying/truly-matching file counts, matching
    rows, and — the invariant the whole technique rests on —
    ``n_false_prunes`` (files with matches that the zone map would
    have skipped), pinned at ZERO by the oracle. The registered
    z-order contract proves numeric zone maps; strings are where
    engines actually drift (collation, truncated footers, successor
    computation), so the string rule gets its own oracle.

    Exactness: lexicographic string comparison over ASCII text is
    identical in both engines; counts only.

    Scale (100 TB): one scan to per-file min/max/count footers (the
    metadata a real writer persists anyway), one predicate-ladder
    fanout on the footer frame, one scan for the truth side — and at
    scale the truth side IS the skipped scan, so the contract costs
    what it saves."""
    d = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % SPC_FILE_MOD).alias("file_id"), "text"
    )
    footers = d.groupBy("file_id").agg(
        F.min("text").alias("mn"),
        F.max("text").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    preds = spark.createDataFrame(
        [(p,) for p in SPC_PREFIXES], "prefix string"
    )
    qual = footers.crossJoin(F.broadcast(preds)).select(
        "prefix",
        "file_id",
        (
            (F.col("mn") <= F.concat(F.col("prefix"), F.lit("{")))
            & (F.col("mx") >= F.col("prefix"))
        ).alias("qualifies"),
    )
    matches = (
        d.crossJoin(F.broadcast(preds))
        .filter(F.col("text").startswith(F.col("prefix")))
        .groupBy("prefix", "file_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_match_rows"))
    )
    return (
        qual.join(matches, ["prefix", "file_id"], "left")
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.col("qualifies").cast("int"))
            .cast("bigint")
            .alias("n_files_qualifying"),
            F.sum(F.col("n_match_rows").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_files_matching"),
            F.coalesce(F.sum("n_match_rows"), F.lit(0))
            .cast("bigint")
            .alias("n_match_rows"),
            F.sum(
                (
                    F.col("n_match_rows").isNotNull()
                    & ~F.col("qualifies")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_false_prunes"),
        )
    )


# --------------------------------------------------------------------
# License propagation through dedup (compliance audit)
# --------------------------------------------------------------------

# Deterministic source -> license-class map: rank 0 permissive,
# 1 attribution, 2 restricted. Class = numeric source suffix mod 3.
LIC_CLASSES = ("permissive", "attribution", "restricted")


def _license_oracle() -> str:
    from .clusters import _clusters_oracle

    return f"""
    WITH clusters AS ({_clusters_oracle()}
    ), lic AS (
      SELECT d.doc_id, c.cluster_rep,
             CAST(CAST(substr(d.source, 4) AS BIGINT) % 3 AS BIGINT)
               AS own_rank
      FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
    ), prop AS (
      SELECT cluster_rep,
             CAST(max(own_rank) AS BIGINT) AS prop_rank,
             CAST(count(*) AS BIGINT) AS n_members
      FROM lic GROUP BY 1
    ), kept AS (
      SELECT l.doc_id, l.own_rank, p.prop_rank, p.n_members
      FROM lic l
      JOIN prop p ON p.cluster_rep = l.doc_id
      WHERE l.doc_id = l.cluster_rep
    )
    SELECT CASE prop_rank WHEN 0 THEN 'permissive'
                          WHEN 1 THEN 'attribution'
                          ELSE 'restricted' END AS license_class,
           CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN prop_rank > own_rank THEN 1 ELSE 0 END)
             AS BIGINT) AS n_escalated,
           CAST(sum(n_members - 1) AS BIGINT) AS n_members_absorbed
    FROM kept GROUP BY 1
    """


@stage(
    "docs_license_propagation_contract",
    oracle=_license_oracle(),
    tags=("llm", "governance", "contract"),
)
def docs_license_propagation_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compliance propagation through dedup: after near-dup cluster
    dedup (the registered ``docs_dup_clusters`` map, composed
    verbatim on both engines), every kept representative must carry
    the MOST RESTRICTIVE license among its absorbed members — max
    rank over the deterministic source→class map (numeric source
    suffix mod 3 → permissive/attribution/restricted). A dedup step
    that keeps the permissive copy of a restricted document and
    forgets the restriction has silently laundered a license; the
    ``n_escalated`` column counts exactly the representatives whose
    own class was WEAKER than what they now must carry — the rows a
    compliance review reads.

    Exactness: integer ranks, counts, exact string classes.

    Scale (100 TB): the cluster map's own proven plan plus one
    cluster-keyed max aggregate and a doc-keyed join — license
    metadata rides the dedup shuffle that already exists."""
    from .clusters import docs_dup_clusters

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    comp = docs_dup_clusters(spark, sf_dir)
    lic = d.join(comp, "doc_id").select(
        "doc_id",
        "cluster_rep",
        F.expr("CAST(CAST(substr(source, 4) AS BIGINT) % 3 AS BIGINT)").alias(
            "own_rank"
        ),
    )
    prop = lic.groupBy("cluster_rep").agg(
        F.max("own_rank").alias("prop_rank"),
        F.count(F.lit(1)).alias("n_members"),
    )
    kept = lic.filter(F.col("doc_id") == F.col("cluster_rep")).join(
        prop, "cluster_rep"
    )
    return (
        kept.groupBy(
            F.when(F.col("prop_rank") == 0, "permissive")
            .when(F.col("prop_rank") == 1, "attribution")
            .otherwise("restricted")
            .alias("license_class")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
            F.sum((F.col("prop_rank") > F.col("own_rank")).cast("int"))
            .cast("bigint")
            .alias("n_escalated"),
            F.sum(F.col("n_members") - 1)
            .cast("bigint")
            .alias("n_members_absorbed"),
        )
    )


# --------------------------------------------------------------------
# BPE vocab-size curve (tokens-vs-merge-budget design table)
# --------------------------------------------------------------------

BVC_BUDGETS = (0, 2, 4, 6)  # merge budgets; 0 = character baseline


def _bpe_vocab_curve_oracle() -> str:
    from .bpe import N_MERGES, _bpe_oracle

    assert max(BVC_BUDGETS) <= N_MERGES
    rows = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({m} AS BIGINT) AS n_merges_budget,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(sum(freq) AS BIGINT) AS corpus_words,
           CAST(sum(freq * len(syms)) AS BIGINT) AS corpus_tokens,
           CAST(sum(freq * len(syms)) * 1000000 // sum(freq) AS BIGINT)
             AS fertility_micro
    FROM r{m}_words"""
        for m in BVC_BUDGETS
    )
    return _bpe_oracle(max(BVC_BUDGETS)) + f"\n    {rows}"


@stage(
    "docs_bpe_vocab_size_curve",
    oracle=_bpe_vocab_curve_oracle(),
    tags=("llm", "tokenizer", "eval"),
)
def docs_bpe_vocab_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer vocab-size design table: corpus token count and
    fertility (tokens per word, micro) as a function of the BPE merge
    budget m ∈ {BVC_BUDGETS} — m=0 is the character baseline, each
    rung replays the EXACT serial trainer (the registered
    ``docs_bpe_merges`` algorithm) to its budget and measures what
    the corpus costs to encode under that vocabulary. This is the
    curve read when sizing a vocabulary: fertility falls
    monotonically with merges, and the knee prices each additional
    merge in saved tokens (the compression-vs-vocab tradeoff every
    tokenizer paper plots; registered ``docs_bpe_fertility_report``
    is one point of it).

    Exactness: the oracle replays the identical training trajectory
    (one CTE chain to the max budget; each rung summarizes that
    chain's intermediate word table), so merges, segmentations and
    counts are bit-identical; outputs are integer counts + micro DIV.

    Scale (100 TB): training cost is the registered serial trainer's
    (per merge: one pair-count shuffle over the DISTINCT-word frame —
    Zipf-compressed vs the corpus — and a driver argmax scalar);
    the curve adds only per-rung scalar aggregates of that frame."""
    from .bpe import bpe_train_serial

    # ONE training trajectory to the max budget with per-rung snapshots
    # (r12): greedy serial training is deterministic, so the word table
    # after m merges IS the budget-m result — the oracle already replays
    # exactly this single CTE chain. Previously each rung retrained from
    # scratch (0+2+4+6 = 12 merge rounds; now 6).
    _, final_words, snaps = bpe_train_serial(
        spark, sf_dir, n_merges=max(BVC_BUDGETS), snapshot_rounds=BVC_BUDGETS
    )
    out = None
    for m in BVC_BUDGETS:
        # missing rung ⟺ pair exhaustion before round m, where training
        # stops at the same state the per-budget call would have
        words = snaps.get(m, final_words)
        row = words.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_words"),
            F.sum("freq").cast("bigint").alias("corpus_words"),
            F.sum(F.col("freq") * F.size("syms"))
            .cast("bigint")
            .alias("corpus_tokens"),
        ).select(
            F.lit(m).cast("bigint").alias("n_merges_budget"),
            "n_distinct_words",
            "corpus_words",
            "corpus_tokens",
            F.expr("corpus_tokens * 1000000 DIV corpus_words").alias(
                "fertility_micro"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------
# Image-text alignment contract (cross-modal retrieval plumbing)
# --------------------------------------------------------------------

ITA_N_DOCS = 120
ITA_DIM = 16  # feature dimension: 16 patch sums / 16 text-hash bins
ITA_BUCKET = 30  # report granularity (4 buckets of 30 docs)


def _alignment_oracle() -> str:
    # image feature d of doc j: sum of the 4x4 patch at raster pos d
    # of the synthetic image pixel(x,y) = (j*131 + x*7 + y*13) % 256
    img_feat = (
        "[ list_reduce([ (j.doc_id * 131"
        "   + ((d - 1) % 4 * 4 + (t - 1) % 4) * 7"
        "   + ((d - 1) // 4 * 4 + (t - 1) // 4) * 13) % 256"
        "   for t in generate_series(1, 16) ], (a, b) -> a + b)"
        " for d in generate_series(1, 16) ]"
    )
    txt_feat = (
        "[ len(list_filter(string_split(i.text, ' '),"
        "   w -> w <> '' AND (len(w) * 7 + ord(w[1])) % 16 = d - 1))"
        " for d in generate_series(1, 16) ]"
    )
    return f"""
    WITH block AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {ITA_N_DOCS}
    ), tf AS (
      SELECT i.doc_id, {txt_feat} AS tv FROM block i
    ), imf AS (
      SELECT j.doc_id, {img_feat} AS iv FROM block j
    ), scores AS (
      SELECT t.doc_id AS text_id, m.doc_id AS img_id,
             CAST(list_reduce(list_transform(list_zip(t.tv, m.iv),
               z -> z[1] * z[2]), (a, b) -> a + b) AS BIGINT) AS score
      FROM tf t CROSS JOIN imf m
    ), ranked AS (
      SELECT text_id, img_id, score,
             row_number() OVER (PARTITION BY text_id
                                ORDER BY score DESC, img_id) AS rk
      FROM scores
    )
    SELECT CAST(text_id // {ITA_BUCKET} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_texts,
           CAST(sum(CASE WHEN img_id = text_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_top1_self,
           CAST(sum(score) AS BIGINT) AS sum_top1_score
    FROM ranked WHERE rk = 1
    GROUP BY 1
    """


@stage(
    "docs_image_text_alignment_contract",
    oracle=_alignment_oracle(),
    tags=("llm", "multimodal", "retrieval", "contract"),
)
def docs_image_text_alignment_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal retrieval PLUMBING, oracle-pinned: each doc in the
    bounded block carries an image-side feature vector (the 16 patch
    sums of its synthetic image — the patchify contract's reduction)
    and a text-side vector (a 16-bin word-hash histogram); the
    text→image score matrix is the integer dot product, and per
    text the top-1 image is retrieved (score desc, id tie-break).
    The features are DETERMINISTIC STUBS (per the multimodal-stub
    convention — a real deployment swaps in CLIP embeddings), but
    the plan is the real cross-modal eval: per-query top-1 over a
    dense score matrix with exact tie-breaks, the shape of every
    retrieval-accuracy eval. The oracle replays both feature
    constructions and the argmax closed-form, so a transposed
    patch axis, a shifted hash bin, or an unstable tie-break all
    hash-mismatch.

    Exactness: all-integer features, scores, counts.

    Scale (100 TB): the block is constant-size (a retrieval EVAL is
    query-side-bounded by construction); production would broadcast
    the query block against the corpus-side feature table — the
    registered kNN shape."""
    block = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < ITA_N_DOCS
    )
    tf = block.select(
        F.col("doc_id").alias("text_id"),
        F.expr(
            "transform(sequence(1, 16), d ->"
            " size(filter(split(text, ' '),"
            " w -> w <> '' AND"
            " (length(w) * 7 + ascii(substring(w, 1, 1))) % 16"
            " = d - 1)))"
        ).alias("tv"),
    )
    imf = block.select(
        F.col("doc_id").alias("img_id"),
        F.expr(
            "transform(sequence(1, 16), d ->"
            " aggregate(transform(sequence(1, 16), t ->"
            "   (img_id * 131"
            "    + ((d - 1) % 4 * 4 + (t - 1) % 4) * 7"
            "    + ((d - 1) DIV 4 * 4 + (t - 1) DIV 4) * 13) % 256),"
            "  0L, (a, b) -> a + b))"
        ).alias("iv"),
    )
    w = Window.partitionBy("text_id").orderBy(
        F.desc("score"), F.asc("img_id")
    )
    scores = (
        tf.crossJoin(F.broadcast(imf))
        .select(
            "text_id",
            "img_id",
            F.aggregate(
                F.zip_with("tv", "iv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return (
        scores.groupBy(
            F.expr(f"text_id DIV {ITA_BUCKET}").cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_texts"),
            F.sum((F.col("img_id") == F.col("text_id")).cast("int"))
            .cast("bigint")
            .alias("n_top1_self"),
            F.sum("score").cast("bigint").alias("sum_top1_score"),
        )
    )


# --------------------------------------------------------------------
# Session survival curve (duration CCDF over the sessionized stream)
# --------------------------------------------------------------------

SSC_GAP_S = 1800  # the registered 30-minute session gap
SSC_THRESH_S = (0, 60, 300, 1800)


def _session_survival_oracle() -> str:
    th = ", ".join(str(t) for t in SSC_THRESH_S)
    return f"""
    WITH e AS (
      SELECT user_id, event_id,
             date_diff('microsecond',
                       TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
      FROM events
    ), marked AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  > {SSC_GAP_S} * 1000000 OR lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id)
                  IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM e
    ), sess AS (
      SELECT user_id, ts_us,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sess_id
      FROM marked
    ), durations AS (
      SELECT user_id, sess_id,
             max(ts_us) - min(ts_us) AS dur_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(l.t AS BIGINT) AS threshold_s,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN d.dur_us >= l.t * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
           CAST(sum(CASE WHEN d.dur_us >= l.t * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // CAST(count(*) AS BIGINT) AS survival_micro
    FROM durations d
    CROSS JOIN (SELECT unnest([{th}]) AS t) l
    GROUP BY 1
    """


@stage(
    "events_session_survival_curve",
    oracle=_session_survival_oracle(),
    tags=("events", "analytics", "sessions"),
)
def events_session_survival_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-duration SURVIVAL curve: sessions cut at the
    registered {SSC_GAP_S}-second gap (the ``window_session_30m``
    convention, keyed per user), then for each duration threshold in
    {SSC_THRESH_S} seconds, the exact count and share of sessions
    lasting at least that long — the complementary CDF an engagement
    dashboard plots (no censoring in a bounded replay, so this is
    the Kaplan–Meier curve's exact special case). Threshold 0 is the
    all-sessions row (share = 1e6 by construction — a built-in
    sanity anchor for the hash).

    Exactness: micros since the naive anchor, integer counts, one
    micro DIV.

    Scale (100 TB): one per-user window pass (gap marking + running
    session id — keyed, parallel across users), one hash aggregate
    to sessions, one constant-ladder fanout over the session frame.
    The session frame is the corpus compressed ~events-per-session
    fold."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(
            F.lag("ts_us").over(w_order).isNull()
            | (
                F.col("ts_us") - F.lag("ts_us").over(w_order)
                > SSC_GAP_S * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("sess_id", F.sum("new_sess").over(w_cum))
    durations = sess.groupBy("user_id", "sess_id").agg(
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us")
    )
    ladder = spark.createDataFrame(
        [(t,) for t in SSC_THRESH_S], "t long"
    )
    return (
        durations.crossJoin(F.broadcast(ladder))
        .groupBy(F.col("t").alias("threshold_s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(
                (F.col("dur_us") >= F.col("t") * 1000000).cast("int")
            )
            .cast("bigint")
            .alias("n_surviving"),
        )
        .select(
            "threshold_s",
            "n_sessions",
            "n_surviving",
            F.expr("n_surviving * 1000000 DIV n_sessions").alias(
                "survival_micro"
            ),
        )
    )


# --------------------------------------------------------------------
# Salted broadcast-replicated JOIN contract (the other skew half)
# --------------------------------------------------------------------

SJC_SALTS = 16


def _salted_join_oracle() -> str:
    return """
    SELECT l.l_returnflag,
           n.n_name AS supplier_nation,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """


@stage(
    "lineitem_salted_join_contract",
    oracle=_salted_join_oracle(),
    tags=("tpch", "skew", "contract"),
)
def lineitem_salted_join_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The skew-mitigation SALTED JOIN as an oracle-pinned contract —
    the join-side twin of the registered salted-distinct contract:
    the fact side gets a random-free salt (pmod(xxhash64(orderkey),
    {SJC_SALTS})), the dim side (supplier⋈nation, pre-joined small)
    is REPLICATED once per salt value, and the join key becomes
    (suppkey, salt) — so a hot supplier's rows spread over
    {SJC_SALTS} reducers instead of one, while the replicated dim
    adds only |dim|·{SJC_SALTS} rows. The oracle is the PLAIN
    three-table join aggregate, so the hash proves the
    salt-replicate-join decomposition loses and duplicates nothing.
    (AQE's skew-join split does this adaptively for sort-merge
    joins; the explicit form is how you write it when the dim is
    broadcastable and the skew is known — the documented pattern for
    hot-key fact-dim joins.)

    Exactness: integer counts and BIGINT quantity sums.

    Scale (100 TB): the dim side is |suppliers|·{SJC_SALTS} rows
    (still broadcast-sized for a real dim); the fact side shuffles
    once on the salted key with bounded per-reducer skew — the whole
    point. The final rollup is a |flags|·|nations| hash aggregate."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_suppkey",
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(SJC_SALTS)).alias("salt"),
    )
    dim = (
        load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supplier_nation"))
    )
    salts = spark.createDataFrame(
        [(s,) for s in range(SJC_SALTS)], "salt long"
    )
    dim_rep = dim.crossJoin(F.broadcast(salts))
    return (
        li.join(
            F.broadcast(dim_rep),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (li["salt"] == dim_rep["salt"]),
        )
        .groupBy("l_returnflag", "supplier_nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------
# Temporal (as-of) dimension join — SCD2 lookup without equality keys
# --------------------------------------------------------------------

# Synthetic SCD2 dim: each order priority gets 3 tariff versions with
# contiguous validity epochs over the order-date span.
TDJ_EPOCHS = (
    ("1995-01-01", "1997-01-01", 100),
    ("1997-01-01", "1999-06-01", 150),
    ("1999-06-01", "2002-01-01", 175),
)


def _temporal_join_oracle() -> str:
    rows = ", ".join(
        f"(DATE '{a}', DATE '{b}', {r})" for a, b, r in TDJ_EPOCHS
    )
    return f"""
    WITH dim AS (
      SELECT * FROM (VALUES {rows}) AS d(valid_from, valid_to, tariff)
    )
    SELECT d.valid_from,
           CAST(d.tariff AS BIGINT) AS tariff,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             AS BIGINT) AS sum_price_cents,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                * d.tariff // 10000 AS BIGINT) AS tariffed_cents
    FROM orders o
    JOIN dim d ON CAST(o.o_orderdate AS DATE) >= d.valid_from
              AND CAST(o.o_orderdate AS DATE) < d.valid_to
    GROUP BY d.valid_from, d.tariff
    """


@stage(
    "orders_temporal_dim_join",
    oracle=_temporal_join_oracle(),
    tags=("warehouse", "scd2", "range-join"),
)
def orders_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (as-of) dimension lookup — the SCD2 consumption
    pattern: every order joins the dim VERSION whose validity
    interval contains its order date (half-open [from, to)), here a
    3-epoch tariff table, then a per-epoch rollup applies the
    epoch's tariff to the epoch's order volume in exact cents. This
    is the join every type-2 dimension exists for; its correctness
    hazards are the interval boundary conventions (half-open vs
    closed — an order ON a version boundary must land in exactly one
    epoch), which is precisely what the oracle's hash pins.

    Exactness: DATE comparisons, cent-quantized money (round half-up
    at 2 dp on both engines — the established DECIMAL convention),
    integer tariff basis points with one integer DIV.

    Scale (100 TB): the dim is a version table (tiny — broadcast);
    the range join is a broadcast-nested-loop against ≤|versions|
    intervals with each fact row matching exactly one — no shuffle
    beyond the final |versions|-row rollup. For a large dim,
    bucketize by (natural key) first and range-join within key — the
    registered as-of join's shape."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
    )
    dim = spark.createDataFrame(
        [(a, b, r) for a, b, r in TDJ_EPOCHS],
        "valid_from string, valid_to string, tariff long",
    ).select(
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
        "tariff",
    )
    return (
        o.join(
            F.broadcast(dim),
            (F.col("od") >= F.col("valid_from"))
            & (F.col("od") < F.col("valid_to")),
        )
        .groupBy("valid_from", "tariff")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price_cents").cast("bigint").alias("sum_price_cents"),
        )
        .select(
            "valid_from",
            "tariff",
            "n_orders",
            "sum_price_cents",
            F.expr("sum_price_cents * tariff DIV 10000").alias(
                "tariffed_cents"
            ),
        )
    )


# --------------------------------------------------------------------
# Trade-flow reciprocity (directed-graph symmetry metric)
# --------------------------------------------------------------------


def _reciprocity_oracle() -> str:
    return """
    WITH edges AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS w_e4
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2
    ), paired AS (
      SELECT e.src, e.dst, e.w_e4,
             COALESCE(r.w_e4, 0) AS w_rev
      FROM edges e
      LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
    ), per_src AS (
      SELECT src,
             CAST(count(*) AS BIGINT) AS n_out_edges,
             CAST(sum(CASE WHEN w_rev > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reciprocated,
             CAST(sum(w_e4) AS BIGINT) AS w_out_e4,
             CAST(sum(least(w_e4, w_rev)) AS BIGINT) AS w_balanced_e4
      FROM paired GROUP BY src
    )
    SELECT n.n_name AS nation,
           p.n_out_edges, p.n_reciprocated,
           p.w_out_e4, p.w_balanced_e4,
           CAST((p.w_balanced_e4 // 10000) * 1000000
                // greatest(p.w_out_e4 // 10000, 1) AS BIGINT)
             AS reciprocity_micro
    FROM per_src p JOIN nation n ON n.n_nationkey = p.src
    """


@stage(
    "nation_trade_reciprocity",
    oracle=_reciprocity_oracle(),
    tags=("tpch", "graph", "report"),
)
def nation_trade_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph RECIPROCITY over the nation trade graph — the
    same supplier-nation → customer-nation revenue edges the
    registered ``nation_trade_pagerank`` walks (self-loops excluded),
    asking the complementary structural question: per exporter, how
    much of its outbound flow is BALANCED by a reverse flow
    (weighted reciprocity = Σ min(w_ij, w_ji) / Σ w_ij — the
    Squartini/Garlaschelli weighted form), plus the unweighted
    reciprocated-edge count. PageRank ranks importance; reciprocity
    separates hub-and-spoke trade (low) from balanced bilateral trade
    (high) — together they are the two standard first looks at any
    directed flow graph.

    Exactness: the edge weight is the proven PageRank convention
    (DECIMAL(18,4)-accumulated revenue ×1e4 → BIGINT); min/sum on
    those integers. The micro ratio first scales BOTH operands to
    whole currency units with integer DIV (identical positive-value
    truncation in both engines) so the ×1e6 product stays inside
    int64 out to ~9e12 per-nation revenue; past that, promote the
    ratio to DECIMAL(38,0) — the reported w_*_e4 columns stay
    exact regardless.

    Scale (100 TB): the corpus-sized work is the SAME two-join edge
    aggregate the registered PageRank runs (nation-pair domain ≤
    |nations|²); the reverse-edge pairing is a self-join of that
    ≤625-row frame."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (F.lit(1) - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("w_e4")
        )
        .localCheckpoint(eager=True)
    )
    rev = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("w_e4").alias("w_rev"),
    )
    paired = edges.join(F.broadcast(rev), ["src", "dst"], "left").withColumn(
        "w_rev", F.coalesce("w_rev", F.lit(0))
    )
    per_src = paired.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_out_edges"),
        F.sum((F.col("w_rev") > 0).cast("int"))
        .cast("bigint")
        .alias("n_reciprocated"),
        F.sum("w_e4").cast("bigint").alias("w_out_e4"),
        F.sum(F.least("w_e4", "w_rev")).cast("bigint").alias("w_balanced_e4"),
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("src"), F.col("n_name").alias("nation")
    )
    return per_src.join(F.broadcast(n), "src").select(
        "nation",
        "n_out_edges",
        "n_reciprocated",
        "w_out_e4",
        "w_balanced_e4",
        F.expr(
            "(w_balanced_e4 DIV 10000) * 1000000"
            " DIV greatest(w_out_e4 DIV 10000, 1)"
        ).alias("reciprocity_micro"),
    )


# --------------------------------------------------------------------
# SimHash bit-bias health screen (round-11 growth: slate 9 -> 10)
# --------------------------------------------------------------------

SIMHASH_BIAS_BITS = 60  # md5's first 15 hex digits -> 60 exact bits


def _bit_bias_oracle() -> str:
    return f"""
    WITH posts AS (
      SELECT DISTINCT doc_id, w,
             ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id,
               unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents
      )
      WHERE w <> ''
    ), votes AS (
      SELECT p.doc_id, b.bit,
             sum(CASE WHEN (p.h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
               AS v
      FROM posts p
      CROSS JOIN (
        SELECT unnest(generate_series(0, {SIMHASH_BIAS_BITS - 1})) AS bit
      ) b
      GROUP BY 1, 2
    ), perbit AS (
      SELECT bit,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_set
      FROM votes GROUP BY 1
    )
    SELECT CAST(bit AS BIGINT) AS bit, n_docs, n_set,
           CAST(n_set * 1000000 // n_docs AS BIGINT) AS set_ppm,
           CAST(n_set * 1000000 // n_docs - 500000 AS BIGINT) AS dev_ppm
    FROM perbit
    """


@stage(
    "docs_simhash_bit_bias",
    oracle=_bit_bias_oracle(),
    tags=("llm", "dedup", "sketch", "diagnostics"),
)
def docs_simhash_bit_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash FINGERPRINT-HEALTH screen — per bit lane, the fraction
    of documents whose fingerprint sets that bit. A healthy Charikar
    sketch is unbiased (every lane ≈ 50% over a diverse corpus); a
    skewed lane means a broken hash mix, a vote-threshold bug, or a
    degenerate vocabulary, and every Hamming-distance threshold
    downstream silently loses resolution. The production fingerprint
    (``dedup.simhash_table``) rides xxhash64; this contract runs the
    SAME vote pipeline over the repo's cross-engine md5 hash
    ({SIMHASH_BIAS_BITS} exact bits) so DuckDB can replay every vote.

    Exactness: the hash is the established md5-15-hex convention;
    votes, signs, and the >0 set rule are exact integers; ppm is
    integer ``DIV``.

    Scale (100 TB): one scan → word explode (map-side) → ONE
    (doc_id) hash aggregate carrying {SIMHASH_BIAS_BITS} partial-sum
    vote columns (the measured-fastest simhash_table layout, cites
    ``llm/dedup.py:813``) → a {SIMHASH_BIAS_BITS}-wide unpivot into a
    ≤{SIMHASH_BIAS_BITS}-group aggregate. No joins, no windows; the
    oracle's bit cross-join is the oracle's problem, not the plan's."""
    d = load(spark, sf_dir, "documents")
    posts = (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.col("text"), " "))
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .selectExpr(
            "doc_id",
            "CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT) AS h",
        )
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BIAS_BITS)
    ]
    agg = posts.groupBy("doc_id").agg(*votes)
    stack_args = ", ".join(
        f"{b}L, b{b}" for b in range(SIMHASH_BIAS_BITS)
    )
    lanes = agg.selectExpr(
        f"stack({SIMHASH_BIAS_BITS}, {stack_args}) AS (bit, v)"
    )
    return (
        lanes.groupBy("bit")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("v") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_set"),
        )
        .selectExpr(
            "bit",
            "n_docs",
            "n_set",
            "CAST(n_set * 1000000 DIV n_docs AS BIGINT) AS set_ppm",
            "CAST(n_set * 1000000 DIV n_docs - 500000 AS BIGINT)"
            " AS dev_ppm",
        )
    )


docs_simhash_bit_bias.__doc__ = docs_simhash_bit_bias.__doc__.replace(
    "{SIMHASH_BIAS_BITS}", str(SIMHASH_BIAS_BITS)
)
