"""Document deduplication for training-data pipelines.

Exact dedup (hash-groupBy), n-gram Jaccard near-dup (blocked pair
join), MinHash+LSH near-dup (shingle → minhash signature → band →
bucket-join → verify), SimHash. All JVM-side — array/lambda functions,
no Python UDFs.

Scale design:
- exact dedup groups on md5(text) — a 16-byte shuffle key instead of
  the full document;
- Jaccard pairs are blocked (here by ``lang``) so the pair join is a
  shuffle join on the block key, never a global cross join;
- MinHash-LSH candidates come from a groupBy on (band_idx, band_hash):
  cost is O(n · bands), independent of n² — the standard web-scale
  near-dedup layout (cf. the MinHash sections of Broder '97);
- the verify step re-joins the shingle sets only for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

JACCARD_THRESHOLD = 0.30
# 16 perms in 8 bands × 2 rows: the LSH s-curve midpoint (1/b)^(1/r)
# ≈ 0.35 sits just above the 0.30 verify threshold — good recall there
# at half the hashing cost of a 32-perm family (hash count is the
# dominant cost of signature computation; measured, not guessed).
MINHASH_PERMS = 16
LSH_BANDS = 8
# Hot-shingle posting-list ceiling for the inverted-index Jaccard path:
# grams shared by more documents than this are boilerplate (no near-dup
# signal) and would emit O(df²) candidate pairs — the classic skew bomb
# of inverted-index dedup. 64 sits ~4× above the max df observed on the
# fixtures (5 at sf0.01, 14 at sf0.1; measured via DuckDB), so the cap
# is provably recall-neutral there (docs_jaccard_df_ceiling_contract)
# while bounding the per-gram emit at any corpus size.
DF_CEILING = 64


def word_trigrams(words: Column) -> Column:
    """Distinct word 3-gram shingles as STRINGS from a MATERIALIZED
    word-array column. Empty when the text has fewer than 3 words.
    Like ``word_trigram_hashes`` below, ``words`` must not be an
    inline ``split()`` expression — lambda bodies are exempt from
    common-subexpression elimination, so an inline split re-tokenizes
    the document for every element access (measured ~2x slower on the
    bloom-decontamination plan)."""
    return F.when(
        F.size(words) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 3),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i + 1), F.element_at(words, i + 2), F.element_at(words, i + 3)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_trigram_hashes(words: Column) -> Column:
    """Distinct word 3-gram shingles as 64-bit fingerprints
    (``xxhash64(w_i, w_{i+1}, w_{i+2})`` — no intermediate string is
    ever built). Broder-style hashed shingles: set operations
    (intersection / distinct / minhash) on 8-byte longs instead of
    ~100-byte strings, which shrinks both CPU and shuffle volume by an
    order of magnitude. Single-space tokenization makes the word-triple
    → hash mapping injective modulo 64-bit collisions (~1e-8 at 1e6
    distinct shingles — below any observable effect on Jaccard).

    ``words`` must be a MATERIALIZED array column (not an inline
    ``split()`` expression): lambda bodies are exempt from common-
    subexpression elimination, so an inline split re-tokenizes the
    document for every element access (measured 10× slower)."""
    return F.when(
        F.size(words) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 3),
                lambda i: F.xxhash64(
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                    F.element_at(words, i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def hashed_shingle_table(
    spark: SparkSession, d: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra_cols, grams array<bigint>) with both the word
    split and the shingle derivation materialized via localCheckpoint:
    the split barrier stops projection collapse from re-inlining
    ``split()`` into the trigram lambda, and the shingle barrier lets
    the (multi-branch) consumers reuse one computation. Repartitions
    first — the fixture is a single input split and shingling is the
    dominant CPU cost."""
    w = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", *extra_cols, F.split("text", " ").alias("w"))
        .localCheckpoint(eager=True)
    )
    return (
        w.select(
            "doc_id", *extra_cols, word_trigram_hashes(F.col("w")).alias("grams")
        )
        .filter(F.size("grams") >= 1)
        .localCheckpoint(eager=True)
    )


@register(
    "docs_exact_dedup",
    oracle="""
    SELECT min(doc_id) AS doc_id, md5(text) AS text_hash, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("llm", "dedup"),
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one representative (min doc_id) per
    distinct text. The shuffle key is the 32-hex md5, not the document."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "text_hash", "n_copies")
    )


_INCR_BATCH_MOD = 10  # doc_id % 10 == 0 → the "newly ingested" batch
# Re-keyed ids of the replayed (re-delivered) slice. 1e9 keeps clear of
# the 10M-per-copy doc_id shift tools/scale_stress.py uses for inflated
# fixtures (x4 tops out under 40M); the per-row guard below still
# catches any corpus that reaches it.
_REPLAY_SHIFT = 1_000_000_000


@register(
    "docs_incremental_exact_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT md5(text) AS text_hash FROM documents
      WHERE doc_id % {_INCR_BATCH_MOD} <> 0
    ), batch AS (
      SELECT doc_id, md5(text) AS text_hash FROM documents
      WHERE doc_id % {_INCR_BATCH_MOD} = 0
      UNION ALL
      SELECT doc_id + {_REPLAY_SHIFT}, md5(text) FROM documents
      WHERE doc_id % {_INCR_BATCH_MOD} = 1
    )
    SELECT doc_id, text_hash,
           (NOT EXISTS (SELECT 1 FROM corpus c
                        WHERE c.text_hash = b.text_hash)
            AND row_number() OVER (
                  PARTITION BY text_hash ORDER BY doc_id
                ) = 1) AS accepted
    FROM batch b
    """,
    tags=("llm", "dedup", "incremental"),
)
def docs_incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT dedup — the production daily-ingest shape: an
    arriving batch is admitted only where its content hash is absent
    from the existing corpus AND it is the first occurrence within the
    batch. The batch is the fresh slice (doc_id % {_INCR_BATCH_MOD}
    == 0, the incremental-minhash convention) PLUS a REPLAYED slice
    (the % == 1 docs re-keyed by +{_REPLAY_SHIFT}) — a re-delivered
    file whose contents already live in the corpus, the failure mode
    this operator exists to absorb; every replayed row must come back
    ``accepted = false``, so the reject path is exercised (and
    hash-checked) at every SF. Returns every batch row with its
    verdict.

    This is the ``insert_if_absent`` anti-join (SURVEY §2.7 U1,
    reference ``bronze_incremental_load.sql:61-62``) lifted to content
    hashes, in ONE batch lineage: left-join the distinct corpus hash
    set (in production a persisted hash index, like the persisted band
    index of ``docs_minhash_incremental_pairs`` — then the corpus side
    reads 16-byte hashes, not documents), and fold membership + the
    within-batch keep-first window into the verdict expression. No
    anti-join-then-join-back: the earlier two-branch form re-derived
    the whole batch lineage per consumer (six document scans in the
    plan); this one scans each batch slice once. NULL semantics are
    pinned equi-join-style on BOTH engines (oracle uses NOT EXISTS,
    not NOT IN, so a NULL hash can never poison the corpus test)."""
    d = load(spark, sf_dir, "documents")
    corpus_hashes = (
        d.filter(F.col("doc_id") % _INCR_BATCH_MOD != 0)
        .select(F.md5("text").alias("text_hash"))
        .dropDuplicates(["text_hash"])
        .withColumn("__in_corpus", F.lit(True))
    )
    # Tests and consumers classify replayed-vs-fresh by doc_id >=
    # _REPLAY_SHIFT; a corpus whose ids reach the shift would silently
    # alias the two populations. Guard per row (same pattern as
    # merge_into_orders' INSERT_KEY_SHIFT guard) rather than fail
    # quietly at larger SFs.
    guarded_id = F.expr(
        f"if(doc_id < {_REPLAY_SHIFT}, doc_id,"
        " raise_error('docs_incremental_exact_dedup: doc_id >="
        " _REPLAY_SHIFT; replayed ids would alias fresh ids —"
        " raise _REPLAY_SHIFT'))"
    )
    batch = (
        d.filter(F.col("doc_id") % _INCR_BATCH_MOD == 0)
        .select(guarded_id.alias("doc_id"), F.md5("text").alias("text_hash"))
        .unionByName(
            d.filter(F.col("doc_id") % _INCR_BATCH_MOD == 1).select(
                (guarded_id + _REPLAY_SHIFT).alias("doc_id"),
                F.md5("text").alias("text_hash"),
            )
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("text_hash").orderBy("doc_id")
    )
    return (
        batch.join(corpus_hashes, "text_hash", "left")
        .select(
            "doc_id",
            "text_hash",
            (F.coalesce("__in_corpus", F.lit(False)) == F.lit(False)).alias(
                "__absent"
            ),
        )
        .withColumn("accepted", F.col("__absent") & (rn == 1))
        .select("doc_id", "text_hash", "accepted")
    )


# DuckDB word-trigram shingle CTE, shared by the Jaccard-pair oracle and
# the connected-components oracle in ``clusters.py``.
GRAMS_CTE_SQL = """
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1] || ' ' ||
                    string_split(text, ' ')[i+2]
             )) AS grams
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
"""

JACCARD_PAIRS_SQL = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                 6) AS jaccard
    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                6) >= {JACCARD_THRESHOLD}
"""


def posting_pair_emit(
    posts: DataFrame, block_cols: tuple[str, ...], df_ceiling: int | None
) -> DataFrame:
    """Inverted-index pair emit, the shared core of every
    posting-list dedup plan here (trigram Jaccard / containment /
    winnowed-fingerprint overlap / SimHash band buckets): group
    ``(doc_id, *block_cols, gram)`` postings per ``(block, gram)``,
    then emit every ``doc_a < doc_b`` combination of each sorted
    posting list — ONE row per shared gram — for the caller to count
    (intersection size) or distinct (candidate set).

    ``df_ceiling``: drop posting lists longer than this (hot-key cap)
    before the quadratic combination emit; ``None`` = exact. A gram
    shared by > df_ceiling documents is boilerplate (template headers,
    navigation chrome), carries no near-dup signal, and would emit
    O(df²) pairs — at web scale a df-1e6 shingle alone is 5e11 pairs.
    Dropping it bounds the emit at df_ceiling²/2 pairs per gram.
    Trade-off: a TRUE near-dup pair whose entire overlap rides capped
    grams is missed; ``docs_jaccard_df_ceiling_contract`` proves the
    cap is engaged yet recall-neutral on the fixtures.

    Grouping the posting list and emitting combinations with a nested
    ``transform`` shuffles the postings ONCE (groupBy) instead of
    twice (the a/b sides of a self-join) and skips the join probe
    entirely — measured ~30% faster than the equi-self-join form at
    sf0.1 and strictly less shuffle at any scale."""
    ids = F.sort_array(F.collect_list("doc_id"))
    grouped = (
        posts.groupBy(*block_cols, "gram")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if df_ceiling is not None:
        grouped = grouped.filter(F.size("ids") <= df_ceiling)
    # All (a < b) combinations from the sorted posting list: element i
    # paired with every later element. slice() is 1-based; the two-arg
    # lambda receives (element, 0-based index).
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i.cast("int") + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return grouped.select(F.explode(combos).alias("p")).select(
        F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b")
    )


def _jaccard_pairs_from(
    spark: SparkSession, d: DataFrame, df_ceiling: int | None
) -> DataFrame:
    """Shared inverted-index Jaccard-pair plan over a documents frame.
    ``df_ceiling``: drop posting lists longer than this (hot-shingle
    cap) before the quadratic combination emit; ``None`` = exact."""
    # The plan uses the shingle table on THREE branches (postings +
    # two size sides); hashed_shingle_table materializes it once (the
    # same staging a 100 TB run would do before a self-join).
    g = hashed_shingle_table(spark, d, extra_cols=("lang",))
    sizes = g.select("doc_id", F.size("grams").alias("n_grams"))
    posts = g.select("doc_id", "lang", F.explode("grams").alias("gram"))
    inter = (
        posting_pair_emit(posts, ("lang",), df_ceiling)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.round(
        F.col("inter").cast("double")
        / (F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("inter")),
        6,
    )
    # sizes is 12 bytes/doc but still one row PER DOC — SF-scaled, so no
    # forced broadcast hint (at 1e10 docs the size map is ~120 GB and a
    # hint would kill the driver). AQE sees the materialized shuffle
    # size at runtime and converts these to broadcast joins while the
    # map actually fits; past that they fall back to sort-merge on
    # doc_id, which is the correct 100 TB behavior.
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@register(
    "docs_ngram_jaccard_pairs",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    )
{JACCARD_PAIRS_SQL}
    """,
    tags=("llm", "dedup", "similarity"),
)
def docs_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-trigram Jaccard ≥ 0.30 within a
    ``lang`` block, via an INVERTED INDEX: explode shingles → group
    postings per (lang, gram) → emit doc-id combinations JVM-side →
    count shared grams per pair → Jaccard.

    Scale: cost is Σ_gram df(gram)·(df(gram)-1)/2 (pairs that actually
    share a shingle) instead of the O(n²) all-pairs array_intersect —
    pairs with zero overlap are never materialized, and they can't pass
    any positive threshold. Grouping the posting list and emitting
    combinations with a nested ``transform`` shuffles the postings ONCE
    (groupBy) instead of twice (the a/b sides of a self-join) and
    skips the join probe entirely — measured ~30% faster than the
    equi-self-join form at sf0.1 and strictly less shuffle at any
    scale. Skew guard: posting lists longer than ``DF_CEILING`` are
    DROPPED before the quadratic emit (boilerplate shingles carry no
    near-dup signal); ``docs_jaccard_df_ceiling_contract`` proves the
    cap is engaged yet pair-recall-neutral on the fixtures.
    """
    d = load(spark, sf_dir, "documents")
    return _jaccard_pairs_from(spark, d, DF_CEILING)


@register(
    "docs_jaccard_df_ceiling_contract",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    ),
    posts AS (
      SELECT doc_id, lang, unnest(grams) AS gram FROM g
    ),
    dfs AS (
      SELECT lang, gram, count(*) AS df FROM posts GROUP BY 1, 2
    ),
    pairs AS (
{JACCARD_PAIRS_SQL}
    )
    SELECT CAST({DF_CEILING} AS BIGINT) AS ceiling,
           CAST(max(df) AS BIGINT) AS max_df,
           CAST(count(*) FILTER (df > {DF_CEILING}) AS BIGINT) AS n_hot_grams,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs_capped,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs_exact
    FROM dfs
    """,
    tags=("llm", "dedup", "contract"),
)
def docs_jaccard_df_ceiling_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proves the DF_CEILING hot-shingle cap is (a) ENGAGED in the
    production pair plan and (b) recall-neutral on this corpus: the
    capped pair count must equal the exact (uncapped) pair count.

    The oracle computes the EXACT pair count for both columns, so if a
    regenerated fixture ever contains a shingle hotter than the ceiling
    whose removal changes the pair set, the Spark side (which really
    caps) hash-mismatches the oracle — a red row, not a silent recall
    loss. max_df/n_hot_grams expose how much headroom remains."""
    d = load(spark, sf_dir, "documents")
    return _jaccard_contract_counts(spark, d, DF_CEILING)


def _jaccard_contract_counts(
    spark: SparkSession, d: DataFrame, ceiling: int
) -> DataFrame:
    """Fused capped-vs-exact pair census over a documents frame.
    Equivalence to the production capped plan is pinned by
    ``test_df_ceiling_contract_matches_production_capped_plan``."""
    # ONE shingle pass and ONE pair-emit pass serve both variants: each
    # posting list is tagged hot (df > ceiling) at emit time, and the
    # per-pair aggregation counts shared grams twice — all grams
    # (exact semantics) and cool-only grams (capped semantics: a pair
    # whose overlap rides only hot grams gets inter_capped = 0 and
    # drops below threshold, exactly like the production plan that
    # never emits it). The diagnostic deliberately DOES emit hot
    # combos (it must, to compute the exact side) — fine at fixture
    # scale; the production query never does.
    g = hashed_shingle_table(spark, d, extra_cols=("lang",))
    sizes = g.select("doc_id", F.size("grams").alias("n_grams"))
    posts = g.select("doc_id", "lang", F.explode("grams").alias("gram"))
    ids = F.sort_array(F.collect_list("doc_id"))
    grouped = (
        posts.groupBy("lang", "gram")
        .agg(ids.alias("ids"))
        .withColumn("hot", F.size("ids") > ceiling)
    )
    stats = grouped.agg(
        F.max(F.size("ids")).cast("long").alias("max_df"),
        F.sum(F.col("hot").cast("long")).cast("long").alias("n_hot_grams"),
    )
    multi = grouped.filter(F.size("ids") >= 2)
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i.cast("int") + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    inter = (
        multi.select("hot", F.explode(combos).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter_all"),
            F.sum((~F.col("hot")).cast("long")).alias("inter_cool"),
        )
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    # Denominators differ: the production capped plan computes
    # inter = cool-only, so its union is n_a + n_b - inter_cool.
    size_sum = F.col("sa.n_grams") + F.col("sb.n_grams")
    jac_exact = F.round(
        F.col("inter_all").cast("double") / (size_sum - F.col("inter_all")), 6
    )
    jac_capped = F.round(
        F.col("inter_cool").cast("double") / (size_sum - F.col("inter_cool")), 6
    )
    counts = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .agg(
            F.sum((jac_capped >= JACCARD_THRESHOLD).cast("long"))
            .cast("long")
            .alias("n_pairs_capped"),
            F.sum((jac_exact >= JACCARD_THRESHOLD).cast("long"))
            .cast("long")
            .alias("n_pairs_exact"),
        )
    )
    return stats.crossJoin(counts).select(
        F.lit(ceiling).cast("long").alias("ceiling"),
        "max_df",
        "n_hot_grams",
        "n_pairs_capped",
        "n_pairs_exact",
    )


def minhash_signature(grams: Column, num_perms: int = MINHASH_PERMS) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, i). JVM-side, deterministic, no UDF.

    Measured alternatives that did NOT win: pre-hashing each shingle
    once then permuting the long (projection collapse inlines the base
    transform into all N uses — lambda-bound expressions are exempt
    from common-subexpression elimination); explode+groupBy (shuffle
    cost exceeds the saved hashing); linear a*x+b permutations (ANSI
    mode rejects intentional long wraparound). Hash count is the real
    cost → ``MINHASH_PERMS`` is the lever."""

    def perm_hash(i: int):
        # closure factory (a default-arg lambda would be mis-detected
        # by pyspark as an (element, index) lambda)
        return lambda s: F.xxhash64(s, F.lit(i))

    sigs = [
        F.array_min(F.transform(grams, perm_hash(i))) for i in range(num_perms)
    ]
    return F.array(*sigs)


def minhash_band_index(g: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) LSH index rows for a shingle
    table. This is the artifact a production deployment PERSISTS
    (parquet, bucketed/partitioned by (band_idx, band_hash)) so that
    incremental batches join it directly instead of re-hashing the
    corpus — see ``docs_minhash_incremental_pairs``. Band hashes are
    pure per-document functions (no corpus statistics), which is what
    makes the index append-only under ingestion."""
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    sig = g.select("doc_id", minhash_signature(F.col("grams")).alias("sig"))
    return sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda band: F.struct(
                    band.alias("band_idx"),
                    F.xxhash64(
                        F.slice(F.col("sig"), band * rows_per_band + 1, rows_per_band),
                        band,
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


@register(
    "docs_minhash_lsh_pairs",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                 6) AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                6) >= {JACCARD_THRESHOLD}
    """,
    tags=("llm", "dedup", "lsh"),
)
def docs_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH(8 bands × 2 rows) candidate generation,
    then exact-Jaccard verification at ≥ 0.30.

    Oracle: the UNBLOCKED brute-force pair set (all doc pairs, not just
    same-lang blocks, with exact Jaccard ≥ threshold). The verify step
    makes precision exact by construction; recall is probabilistic in
    general but deterministic for fixed hashes + fixed data, and on the
    fixtures the banded signatures recover every qualifying pair
    (verified 28/25/256 of 28/25/256 at sf0.001/0.01/0.1) — so the
    output IS the exact near-dup pair set and hash-checks against the
    brute-force oracle. The unit test additionally referees against the
    lang-blocked inverted-index plan.
    """
    d = load(spark, sf_dir, "documents")
    # reused by the signature branch and both verify sides — one
    # materialized shingle table (see docs_ngram_jaccard_pairs).
    # Shingles are 64-bit fingerprints, so each of the 16 permutation
    # hashes reads 8 bytes instead of re-hashing a ~100-char string.
    g = hashed_shingle_table(spark, d)
    return _verify_jaccard(g, _lsh_candidates(g))


def _lsh_candidates(g: DataFrame) -> DataFrame:
    """LSH candidate (doc_a < doc_b) pairs of a shingle table.
    Candidate generation shuffles only (doc_id, band_hash) — 16 bytes
    a row — never the shingle arrays.

    Bucket-then-combine: group each LSH bucket's (sorted) member list
    and emit (a < b) combinations JVM-side — one shuffle of the tiny
    (doc_id, band) rows instead of a two-sided self-join (same
    transformation as the inverted-index pair emit in
    ``docs_ngram_jaccard_pairs``). Bucket width is the LSH tuning
    knob: near-dup buckets stay small by construction."""
    banded = minhash_band_index(g)
    ids = F.sort_array(F.collect_list("doc_id"))
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i.cast("int") + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _verify_jaccard(g: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against a (doc_id, grams) shingle table; keeps pairs ≥ threshold.
    The candidate set is usually the small side (LSH prunes to
    near-dups) but it is DATA-DEPENDENT — a high-duplication corpus
    (common at web scale) makes it enormous, and the joined frame
    additionally carries the gram arrays. No forced broadcast: AQE
    broadcasts from the materialized runtime size while the set fits
    and falls back to a doc_id shuffle join when it doesn't."""
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    verified = ga.join(candidates, "doc_a").join(gb, "doc_b")
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = F.size("grams_a") + F.size("grams_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        verified.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# MinHash estimator calibration ceiling: with 16 permutations the
# per-pair sd of the match-fraction estimator is sqrt(J(1-J)/16) ≤
# 0.125; measured max |est − exact| over the verified near-dup pairs is
# 0.097 / 0.088 / 0.201 at sf0.001/0.01/0.1 (mean ≈ 0.03), so 0.25
# (2 sd of the worst case) holds with margin. Deterministic for fixed
# hash functions + fixed data, like the LSH recall contract.
MINHASH_EST_ERR_CEILING = 0.25


@register(
    "docs_minhash_estimate_calibration",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                 6) AS jaccard,
           TRUE AS est_err_bounded
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                6) >= {JACCARD_THRESHOLD}
    """,
    tags=("llm", "dedup", "lsh"),
)
def docs_minhash_estimate_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration contract for the MinHash Jaccard ESTIMATOR the LSH
    pipeline trusts: for every verified near-dup pair (exact Jaccard ≥
    {JACCARD_THRESHOLD} — the set the dedup pipeline acts on, and the
    set the brute-force oracle can recompute), compare the
    signature-estimated Jaccard (fraction of equal components across
    the {MINHASH_PERMS} permutations) against the exact shingle
    Jaccard, and pin |est − exact| ≤ {MINHASH_EST_ERR_CEILING} per
    pair. The estimate is signature-dependent (DuckDB has no xxhash64)
    so its VALUE can't be oracle-matched — the BOUND boolean can (the
    ``embeddings_semdedup_ivf_contract`` pattern: Spark computes the
    real check, the oracle pins the expected verdict), and the exact
    Jaccard column is fully recomputed by the oracle. A drifted
    signature implementation (wrong permutation count, broken
    array-min, reordered hashing) flips booleans and fails the driver
    hash."""
    d = load(spark, sf_dir, "documents")
    g = hashed_shingle_table(spark, d)
    sig = g.select("doc_id", minhash_signature(F.col("grams")).alias("sig"))
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    joined = (
        _lsh_candidates(g)
        .join(ga, "doc_a")
        .join(gb, "doc_b")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    exact = inter.cast("double") / union
    est = (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x)
        ).cast("double")
        / MINHASH_PERMS
    )
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(exact, 6).alias("jaccard"),
            (F.abs(est - exact) <= MINHASH_EST_ERR_CEILING).alias(
                "est_err_bounded"
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@register(
    "docs_minhash_incremental_pairs",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                 6) AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE (a.doc_id % {_INCR_BATCH_MOD} = 0 OR b.doc_id % {_INCR_BATCH_MOD} = 0)
      AND round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
                6) >= {JACCARD_THRESHOLD}
    """,
    tags=("llm", "dedup", "lsh", "incremental"),
)
def docs_minhash_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup detection — the operation a 100 TB corpus
    actually runs on every ingest: find all near-dup pairs touching a
    NEW batch (batch↔corpus and batch↔batch) by joining the batch's
    band rows against the persisted corpus band index, WITHOUT
    re-hashing or re-pairing the existing corpus.

    Here the batch is ``doc_id % {_INCR_BATCH_MOD} == 0`` and the corpus
    index is built inline from the complement (in production it is the
    parquet artifact of ``minhash_band_index``, bucketed by
    (band_idx, band_hash), appended on every ingest — band hashes are
    per-document, so the index is append-only). Cost per ingest:
    O(|batch|·bands) index probes + verification of the candidates —
    independent of corpus size except for the bucket-join fan-out.

    The oracle is the batch-touching subset of the brute-force exact
    pair set: on the fixtures banding recovers every qualifying pair
    (same recall argument as ``docs_minhash_lsh_pairs``), so the
    incremental path must reproduce it exactly."""
    d = load(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % _INCR_BATCH_MOD) == 0
    corpus_g = hashed_shingle_table(spark, d.filter(~is_batch))
    batch_g = hashed_shingle_table(spark, d.filter(is_batch))
    index = minhash_band_index(corpus_g)  # persisted in production
    batch_bands = minhash_band_index(batch_g)

    # batch ↔ corpus: probe the index buckets with the batch bands.
    cross = (
        batch_bands.select(
            F.col("doc_id").alias("b_id"), "band_idx", "band_hash"
        )
        .join(
            index.select(F.col("doc_id").alias("c_id"), "band_idx", "band_hash"),
            ["band_idx", "band_hash"],
        )
        .select(
            F.least("b_id", "c_id").alias("doc_a"),
            F.greatest("b_id", "c_id").alias("doc_b"),
        )
    )
    # batch ↔ batch: bucket-then-combine within the batch bands only.
    ids = F.sort_array(F.collect_list("doc_id"))
    buckets = (
        batch_bands.groupBy("band_idx", "band_hash")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i.cast("int") + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    internal = buckets.select(F.explode(combos).alias("p")).select(
        F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b")
    )
    candidates = cross.union(internal).dropDuplicates(["doc_a", "doc_b"])
    g_all = corpus_g.select("doc_id", "grams").union(
        batch_g.select("doc_id", "grams")
    )
    return _verify_jaccard(g_all, candidates)


def simhash_table(
    spark: SparkSession, sf_dir: str, only_docs: DataFrame | None = None
) -> DataFrame:
    """64-bit SimHash per document from word hashes (Charikar '02 shape):
    bit b of the fingerprint is the sign of Σ_words (±1 depending on bit
    b of xxhash64(word)). Deterministic; verified structurally in tests
    (stable across runs, identical texts → identical fingerprints).

    Layout: explode(distinct words) → 64 partial-aggregated bit votes
    per doc (one shuffle, map-side combine). Measured alternative that
    did NOT win: lane-packing the 64 ones-counts into 16 longs of four
    16-bit lanes (16 SUMs instead of 64) is ~1.8× SLOWER cold — the
    per-row shift/mask/shiftleft chains cost more than the when/±1
    sums whole-stage codegen compiles for the unpacked form. Documents
    with no words keep fingerprint 0 via the left join.

    ``only_docs`` (a one-column ``doc_id`` frame) restricts the
    computation to its members via a semi-join BEFORE the explode —
    callers that only need fingerprints for a known small doc set
    (e.g. candidate-pair participants) skip hashing the rest of the
    corpus entirely. The doc set is data-dependent, so no forced
    broadcast — AQE broadcasts it while it fits.
    """
    d = load(spark, sf_dir, "documents")
    if only_docs is not None:
        d = d.join(only_docs.select("doc_id"), "doc_id", "semi")
    words = F.array_distinct(F.split(F.col("text"), " "))
    posts = d.select("doc_id", F.explode(words).alias("w")).withColumn(
        "h", F.xxhash64("w")
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = posts.groupBy("doc_id").agg(*votes)
    simhash = None
    for b in range(64):
        bit_value = (1 << b) if b < 63 else -(1 << 63)
        c = (
            F.when(F.col(f"b{b}") > 0, F.lit(bit_value).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        simhash = c if simhash is None else simhash + c
    fp = agg.select("doc_id", simhash.alias("simhash"))
    return (
        d.select("doc_id")
        .join(fp, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


SIMHASH_NEARDUP_HAMMING = 12  # measured max over fixture near-dups: 11 (random-pair avg ≈ 14)


@register(
    "docs_simhash",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    )
    SELECT p.doc_a, p.doc_b, p.jaccard, TRUE AS hamming_le_{SIMHASH_NEARDUP_HAMMING}
    FROM (
{JACCARD_PAIRS_SQL}
    ) p
    """,
    tags=("llm", "dedup"),
)
def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract over ``simhash_table``: xxhash64 has
    no DuckDB twin, so the registered query asserts SimHash's defining
    property on data the oracle CAN verify — every exact-Jaccard
    near-dup pair (≥ 0.30, the hash-checked pair set) must land within
    Hamming distance {SIMHASH_NEARDUP_HAMMING} (measured fixture max:
    11; unrelated doc pairs average ≈ 14 even with shared vocabulary,
    so a broken vote/sign pipeline fails the booleans). Raw
    fingerprints stay pinned by the determinism unit tests.

    Only pair PARTICIPANTS need fingerprints, so the pair set (tiny —
    near-dups are rare by construction) is materialized once and pushed
    into ``simhash_table`` as a broadcast semi-join filter: the 64-vote
    aggregation runs over a handful of documents instead of the whole
    corpus. At 100 TB this is the difference between re-hashing the
    corpus and touching only the candidate set."""
    pairs = docs_ngram_jaccard_pairs(spark, sf_dir).localCheckpoint(eager=True)
    participants = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # The fingerprint frame feeds BOTH pair sides (sa and sb): without
    # a barrier the whole semi-join + 64-vote aggregate subtree is
    # planned (and executed) once per consumer — three copies in the
    # r10 plan, ~2/3 of the query's cost. Participants are pair
    # members (tiny), so the checkpoint materializes a handful of rows.
    sh = simhash_table(spark, sf_dir, only_docs=participants).localCheckpoint(
        eager=True
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            (ham <= SIMHASH_NEARDUP_HAMMING).alias(
                f"hamming_le_{SIMHASH_NEARDUP_HAMMING}"
            ),
        )
    )
