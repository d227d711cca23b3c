"""Partial-overlap detection beyond symmetric whole-document near-dup:
containment (doc-in-doc), winnowed fingerprints (shared-substring
candidates), and SimHash band-bucket pair search.

The suite's existing near-dup family (``llm/dedup.py``) is symmetric —
Jaccard, MinHash, SimHash contracts all score whole-document
similarity. Three production curation cases need something else:

- a short document QUOTED inside a long one has high containment
  |S(A)∩S(B)| / |S(A)| but low Jaccard (the union is dominated by the
  long doc) — ``docs_shingle_containment_pairs``;
- two long documents sharing one moderate passage (syndicated
  paragraph, license block) score near zero on every whole-document
  measure; winnowing (Schleimer, Wilkerson, Aiken — SIGMOD'03, the
  MOSS algorithm) selects a provably-dense positional fingerprint
  subset such that any shared run of ≥ w+k-1 words is guaranteed to
  contribute a shared fingerprint — ``docs_winnowing_fingerprints``;
- at corpus scale, Hamming-ball search over SimHash fingerprints is
  done with Manku/Jain/Sarma's (WWW'07) pigeonhole band trick, not a
  quadratic scan — ``docs_simhash_band_pairs`` implements the banded
  search with a cross-engine (md5-derived) fingerprint so the DuckDB
  oracle can verify the FULL pipeline, fingerprints included, not just
  a property contract.

No reference-repo counterpart (the reference's dedup surface is the
silver exact-dedup DELETE, ``silver_full_refresh.sql:15-27``); these
extend the training-data curation suite the same way the MinHash/LSH
family does.

Cross-engine hashing: Spark ``conv(substr(md5(x),1,N),16,10)`` and
DuckDB ``('0x'||substr(md5(x),1,N))::BIGINT`` agree exactly (verified
in tests); N=15 hex chars (60 bits) keeps the value inside a signed
64-bit long, N=10 (40 bits) leaves room to pack a 20-bit position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from .dedup import (
    DF_CEILING,
    GRAMS_CTE_SQL,
    hashed_shingle_table,
    posting_pair_emit,
    word_trigrams,
)

# ---------------------------------------------------------------------------
# 1. Containment (doc-in-doc) pairs
# ---------------------------------------------------------------------------

# A is "contained" in B when at least this fraction of A's distinct
# shingles also occur in B. Fixture near-dup constructions measure
# ≥ 0.8 (DuckDB probe at sf0.01/sf0.1); 0.5 keeps selectivity while
# catching partially-trimmed copies.
CONTAINMENT_THRESHOLD = 0.5


@register(
    "docs_shingle_containment_pairs",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    )
    SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
           CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS shared_grams,
           CAST(len(a.grams) AS BIGINT) AS n_sub_grams,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(a.grams), 6) AS containment
    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id != b.doc_id
    WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / len(a.grams), 6) >= {CONTAINMENT_THRESHOLD}
    """,
    tags=("llm", "dedup", "similarity"),
)
def docs_shingle_containment_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Asymmetric near-containment pairs: ``doc_sub`` is (nearly)
    contained in ``doc_super`` when ≥ {CONTAINMENT_THRESHOLD} of its
    distinct word-trigram shingles occur in ``doc_super`` — Broder's
    containment coefficient, the measure that catches a short document
    quoted inside a long one where symmetric Jaccard stays low.

    Same inverted-index plan as ``docs_ngram_jaccard_pairs`` (postings
    per (lang, gram) → sorted-list combination emit → per-pair shared
    count): one extra projection turns each unordered intersection row
    into its two DIRECTED candidates, divided by the candidate sub-
    document's own shingle count instead of the union. Cost is
    identical to the Jaccard plan — the asymmetry is a projection, not
    a new shuffle — and the same ``DF_CEILING`` hot-shingle cap bounds
    the emit (recall-neutral on the fixtures per the ceiling
    contract)."""
    d = load(spark, sf_dir, "documents")
    g = hashed_shingle_table(spark, d, extra_cols=("lang",))
    sizes = g.select("doc_id", F.size("grams").alias("n_grams"))
    posts = g.select("doc_id", "lang", F.explode("grams").alias("gram"))
    inter = (
        posting_pair_emit(posts, ("lang",), DF_CEILING)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # Both directions of every intersecting pair: (a ⊂? b) and
    # (b ⊂? a). A row explode of two structs keeps it one pass.
    directed = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_sub"),
                    F.col("doc_b").alias("doc_super"),
                    F.col("inter"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_sub"),
                    F.col("doc_a").alias("doc_super"),
                    F.col("inter"),
                ),
            )
        ).alias("p")
    ).select("p.doc_sub", "p.doc_super", "p.inter")
    # sizes is SF-scaled (one row per doc) — no forced broadcast; AQE
    # runtime-broadcasts while it fits, sort-merge beyond (see the
    # Jaccard plan's note).
    sub = sizes.alias("s")
    containment = F.round(
        F.col("inter").cast("double") / F.col("s.n_grams"), 6
    )
    return (
        directed.join(sub, F.col("doc_sub") == F.col("s.doc_id"))
        .select(
            "doc_sub",
            "doc_super",
            F.col("inter").alias("shared_grams"),
            F.col("s.n_grams").cast("long").alias("n_sub_grams"),
            containment.alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# 2. Winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

WINNOW_K = 3  # k-gram (word trigram) granularity — suite-consistent
WINNOW_W = 4  # window: any shared run of ≥ w+k-1 = 6 words is caught
# Positions are packed below the hash in a single long so "min over
# window" selects (smallest hash, RIGHTMOST position) in one integer
# min — the classic winnowing tie-break that guarantees selection
# density 2/(w+1). 20 bits of position = the segdedup packing bound.
_POS_BITS = 20
_POS_CAP = 1 << _POS_BITS
# Shared-fingerprint posting lists get the same hot-key cap rationale
# as shingle postings; winnowed fingerprints are rarer than shingles
# (density 2/(w+1)), so the shingle ceiling transfers conservatively.
WINNOW_MIN_SHARED = 2
WINNOW_MIN_OVERLAP = 0.2


@register(
    "docs_winnowing_fingerprints",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= {WINNOW_K}
    ), t AS (
      SELECT doc_id, i - 1 AS pos, len(ws) - {WINNOW_K - 1} AS m,
             ('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
                             1, 10))::BIGINT AS h
      FROM w, unnest(range(1, len(ws) - {WINNOW_K - 2})) u(i)
    ), k AS (
      SELECT doc_id, pos, m,
             h * {_POS_CAP} + ({_POS_CAP - 1} - pos) AS key
      FROM t
    ), s0 AS (
      SELECT doc_id, pos, m,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {WINNOW_W - 1} FOLLOWING) AS selkey
      FROM k
    ), sel AS (
      SELECT DISTINCT doc_id, selkey // {_POS_CAP} AS h
      FROM s0 WHERE pos <= greatest(0, m - {WINNOW_W})
    ), c AS (
      SELECT doc_id, count(*) AS nfp FROM sel GROUP BY doc_id
    ), p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_fps,
           CAST(ca.nfp AS BIGINT) AS fp_a, CAST(cb.nfp AS BIGINT) AS fp_b,
           round(CAST(shared AS DOUBLE) / least(ca.nfp, cb.nfp), 6) AS overlap
    FROM p
    JOIN c ca ON doc_a = ca.doc_id
    JOIN c cb ON doc_b = cb.doc_id
    WHERE shared >= {WINNOW_MIN_SHARED}
      AND round(CAST(shared AS DOUBLE) / least(ca.nfp, cb.nfp), 6)
          >= {WINNOW_MIN_OVERLAP}
    """,
    tags=("llm", "dedup", "similarity"),
)
def docs_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): per document,
    hash every POSITIONAL word-{WINNOW_K}-gram, slide a window of
    {WINNOW_W} consecutive k-gram hashes, and select each window's
    minimum (rightmost on ties). The selected set is a fingerprint
    with the winnowing guarantee — any passage of ≥ w+k-1 words shared
    verbatim by two documents contributes at least one shared selected
    hash — at expected density 2/(w+1) of the k-gram stream. Output:
    candidate partial-overlap pairs sharing ≥ {WINNOW_MIN_SHARED}
    fingerprints and ≥ {WINNOW_MIN_OVERLAP} of the smaller document's
    fingerprint set.

    The (hash, rightmost-tie) window minimum is ONE integer ``min``:
    each k-gram packs into ``h·2^{_POS_BITS} + (2^{_POS_BITS}-1-pos)``
    so smaller hash wins first and larger position wins ties — no
    struct ordering, stays inside whole-stage codegen in Spark and is
    plain arithmetic in the DuckDB twin. A ``raise_error`` guard
    refuses documents with ≥ 2^{_POS_BITS} k-grams rather than silently
    aliasing positions (the segdedup packing-guard pattern).

    Scale: selection is per-document and entirely MAP-SIDE — the
    packed keys and the w-wide sliding min are array expressions
    (slice + array_min, O(m·w) arithmetic) inside the scan stage, so
    no shuffle exists before the pair emit at any corpus size.
    Matching reuses the inverted-index emit on winnowed fingerprints,
    whose stream is (w+1)/2 ≈ {(WINNOW_W + 1) / 2:.1f}× smaller than
    the raw shingle stream the Jaccard path indexes — winnowing IS the
    index-compression step — with the same hot-key ceiling."""
    d = load(spark, sf_dir, "documents")
    w = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= WINNOW_K)
        .localCheckpoint(eager=True)
    )
    n_kgrams = F.size("ws") - (WINNOW_K - 1)
    guarded_m = F.when(
        n_kgrams < _POS_CAP, n_kgrams
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"winnowing position packing holds {_POS_BITS} bits; "
                    "document has too many k-grams: "
                ),
                n_kgrams.cast("string"),
            )
        )
    )
    # Packed (hash, rightmost-tie) keys as ONE map-side array — the
    # sliding window min is per-document sequential logic, so it never
    # needs the posexplode → window-sort-per-doc → distinct round-trip
    # (two corpus shuffles); with w = {WINNOW_W} the slice/array_min
    # scan is O(m·w) arithmetic inside the scan stage, and
    # array_distinct IS the per-doc dedup the global DISTINCT did.
    keys = F.transform(
        F.sequence(F.lit(0), guarded_m - 1),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("ws"), i + 1),
                        F.element_at(F.col("ws"), i + 2),
                        F.element_at(F.col("ws"), i + 3),
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        ).cast("long")
        * _POS_CAP
        + (F.lit(_POS_CAP - 1) - i),
    )
    sel_arr = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.lit(0), F.col("m") - WINNOW_W)
            ),
            lambda i: F.shiftright(
                F.array_min(F.slice(F.col("keys"), i + 1, WINNOW_W)),
                _POS_BITS,
            ),
        )
    )
    sel = (
        w.select("doc_id", F.col("ws"), guarded_m.alias("m"))
        .withColumn("keys", keys)
        .select("doc_id", F.explode(sel_arr).alias("gram"))
        # THREE consumers (pair emit + both count sides): materialize
        # the winnowed selection once instead of replaying the
        # scan lineage per branch (the hashed_shingle_table barrier
        # pattern). The selection is the COMPRESSED stream — 2/(w+1)
        # of the k-grams — so this is the cheapest point to cut.
        .localCheckpoint(eager=True)
    )
    counts = sel.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nfp"))
    pairs = (
        posting_pair_emit(sel, (), DF_CEILING)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= WINNOW_MIN_SHARED)
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    overlap = F.round(
        F.col("shared").cast("double")
        / F.least(F.col("ca.nfp"), F.col("cb.nfp")),
        6,
    )
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").alias("shared_fps"),
            F.col("ca.nfp").alias("fp_a"),
            F.col("cb.nfp").alias("fp_b"),
            overlap.alias("overlap"),
        )
        .filter(F.col("overlap") >= WINNOW_MIN_OVERLAP)
    )


# ---------------------------------------------------------------------------
# 3. SimHash band-bucket pair search (Manku et al.)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex chars → signed-long-safe, 4 equal bands
SIMHASH_BANDS = 4
_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15
_BAND_MASK = (1 << _BAND_BITS) - 1
# Pigeonhole: Hamming distance ≤ BANDS-1 = 3 forces ≥ 1 exact band
# match, so the banded search is LOSSLESS for this radius — the oracle
# verifies it against an all-pairs scan. Fixture probe: near-dup pairs
# land ≤ 3, unrelated pairs average ≈ 30 of 60 bits.
SIMHASH_MAX_HAMMING = SIMHASH_BANDS - 1
# Bucket hot-key cap, NOT engaged at fixture scale (oracle equality
# proves it): at corpus scale a 15-bit band value collects ~n/32768
# random members, and past the cap the quadratic emit must be cut.
# Unlike the shingle df-ceiling (boilerplate carries no signal), a hot
# SimHash bucket CAN hide true pairs whose other three bands differ —
# the loss is explicit, mirroring the streaming near-dup hot-bucket
# contract; production radii also use wider bands (e.g. 16 bits of a
# 64-bit fingerprint) or Manku's permuted tables to keep buckets thin.
SIMHASH_BUCKET_CAP = 4096


@register(
    "docs_simhash_band_pairs",
    oracle=f"""
    WITH g AS (
{GRAMS_CTE_SQL}
    ), posts AS (
      SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
    ), votes AS (
      SELECT doc_id, i,
             sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM posts, unnest(range({SIMHASH_BITS})) u(i)
      GROUP BY doc_id, i
    ), fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)
                  AS BIGINT) AS fp
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= {SIMHASH_MAX_HAMMING}
    """,
    tags=("llm", "dedup", "similarity"),
)
def docs_simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pair SEARCH at corpus scale — Manku, Jain &
    Sarma's (WWW'07) band-bucket pigeonhole: split each {SIMHASH_BITS}-
    bit fingerprint into {SIMHASH_BANDS} bands; any pair within Hamming
    distance ≤ {SIMHASH_MAX_HAMMING} must agree exactly on ≥ 1 band,
    so grouping documents by (band_index, band_value) and emitting
    bucket-mates finds EVERY such pair without a quadratic scan —
    candidates are then verified with one ``bit_count(xor)``.

    Complements ``docs_simhash`` (which proves the Hamming property on
    oracle-known Jaccard pairs but keeps xxhash64 fingerprints the
    oracle can't reproduce): here the per-shingle hash is md5-derived
    and engine-portable, so the DuckDB twin rebuilds the IDENTICAL
    fingerprints and checks the banded search against an all-pairs
    Hamming scan — an end-to-end losslessness proof, not a property
    contract. Fingerprinting is Charikar's bit-vote aggregation over
    distinct word-trigram shingles ({SIMHASH_BITS} conditional sums,
    one map-side-combined shuffle, the measured-fastest layout from
    ``simhash_table``).

    Scale: the all-pairs form the oracle runs is O(n²) and exists ONLY
    as the oracle; the registered plan shuffles (doc, band) rows —
    {SIMHASH_BANDS}n rows of 12 bytes — and its quadratic term is
    bounded per bucket by ``SIMHASH_BUCKET_CAP`` (see the constant's
    note on what the cap trades away past fixture scale)."""
    d = load(spark, sf_dir, "documents")
    w = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split("text", " ").alias("ws"))
        .localCheckpoint(eager=True)
    )
    posts = w.select(
        "doc_id", F.explode(word_trigrams(F.col("ws"))).alias("gram")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = posts.groupBy("doc_id").agg(*votes)
    fp_expr = None
    for b in range(SIMHASH_BITS):
        c = F.when(
            F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp_expr = c if fp_expr is None else fp_expr + c
    fp = agg.select("doc_id", fp_expr.alias("fp")).localCheckpoint(
        eager=True
    )
    bands = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright("fp", _BAND_BITS * j)
                        .bitwiseAND(F.lit(_BAND_MASK))
                        .alias("val"),
                    )
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", F.col("bv.band").alias("band"), F.col("bv.val").alias("gram"))
    candidates = posting_pair_emit(
        bands, ("band",), SIMHASH_BUCKET_CAP
    ).distinct()
    fa = fp.alias("fa")
    fb = fp.alias("fb")
    ham = F.bit_count(F.col("fa.fp").bitwiseXOR(F.col("fb.fp")))
    return (
        candidates.join(fa, F.col("doc_a") == F.col("fa.doc_id"))
        .join(fb, F.col("doc_b") == F.col("fb.doc_id"))
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )
