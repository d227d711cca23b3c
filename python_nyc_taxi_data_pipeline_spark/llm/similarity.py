"""Similarity search over the ``embeddings`` fixture (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
variant as the scale path. All arithmetic is promoted to double and the
reported similarity is rounded to 6 dp so Spark and the DuckDB oracle
agree bit-for-bit (ranking ties break on neighbor id).

Scale design: brute force is O(|Q|·|C|) — correct for small query sets
or re-ranking; the LSH path buckets vectors by signs of projections
onto deterministic pseudo-random hyperplanes so candidate generation is
a shuffle join on the bucket key (random-hyperplane LSH, Charikar '02).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

TOP_K = 5
QUERY_MOD = 50  # vec_id % 50 == 0 → query subset


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


# Exact top-k oracle SQL — shared verbatim by the brute-force query and
# the GEMM contract (which asserts the vectorized path reproduces it).
KNN_EXACT_TOPK_SQL = f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
      FROM v
    ), pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_reduce(list_transform(list_zip(q.v, c.v),
                                              p -> p[1] * p[2]),
                               (acc, x) -> acc + x)
                   / (q.nrm * c.nrm), 6) AS cosine_sim
      FROM n q, n c
      WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
    QUALIFY rank <= {TOP_K}
"""


@register(
    "knn_cosine_bruteforce",
    oracle=KNN_EXACT_TOPK_SQL,
    tags=("llm", "similarity"),
)
def knn_cosine_bruteforce(
    spark: SparkSession, sf_dir: str, query_ceiling: int | None = None
) -> DataFrame:
    """Exact cosine top-5 neighbors for the query subset
    (vec_id % 50 == 0). Query side broadcasts; candidates stream.

    ``query_ceiling``: restrict the query side to vec_id below it —
    the PRODUCTION shape, where the query set is fixed (pinned probe
    block) and does not grow with the corpus. The registered contract
    keeps the corpus-proportional subset (it is what the oracle
    hashes); the scale harness stresses the pinned shape so the
    candidate frame is measured growing ~linearly in corpus size, not
    quadratically through the query side."""
    # load_fanned (guide §2.5): the candidate stream runs |corpus|×|q|
    # interpreted 64-dim dot products off this scan (the margin_mining
    # shape); guarded no-op once the scan is wide.
    from ..catalog import load_fanned

    e = load_fanned(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    n = e.select("vec_id", "v", _norm(F.col("v")).alias("nrm"))
    qside = n.filter(F.col("vec_id") % QUERY_MOD == 0)
    if query_ceiling is not None:
        qside = qside.filter(F.col("vec_id") < F.lit(query_ceiling))
    q = qside.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = n.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    sim = F.round(
        _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "knn_cosine_partitioned",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
      FROM v
    ), pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_reduce(list_transform(list_zip(q.v, c.v),
                                              p -> p[1] * p[2]),
                               (acc, x) -> acc + x)
                   / (q.nrm * c.nrm), 6) AS cosine_sim
      FROM n q, n c
      WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
        AND q.label = c.label
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
    QUALIFY rank <= {TOP_K}
    """,
    tags=("llm", "similarity", "ivf"),
)
def knn_cosine_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style partitioned ANN: candidates restricted to the query's
    coarse cell (here the ``label`` column stands in for a centroid
    assignment — a real IVF trains k-means and probes nprobe cells).
    The candidate join becomes a shuffle join on the cell id: each
    query scores |cell| vectors instead of all of them — the scale path
    when the corpus outgrows brute force. Exact within-cell semantics →
    fully oracle-checked."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    n = e.select("vec_id", "label", "v", _norm(F.col("v")).alias("nrm"))
    q = n.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cand = n.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel")) & (F.col("query_id") != F.col("vec_id")),
    )
    sim = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine_sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def normalize_quantize_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding preprocessing: L2 normalization + symmetric int8
    quantization (the storage/compute reduction step before ANN
    indexing — 4× smaller vectors, SIMD-friendly dot products). All
    array-lambda JVM ops. Returns RAW array columns — the working
    representation downstream operators consume; unregistered because
    the driver canonicalizer cannot sort/hash list cells (r02:
    ``unhashable type: 'list'``). The registered twin below serializes."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    nrm = _norm(F.col("v"))
    max_abs = F.aggregate(
        F.transform(F.col("v"), lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    n = e.select("vec_id", "label", "v", nrm.alias("nrm"), max_abs.alias("max_abs"))
    return n.select(
        "vec_id",
        "label",
        F.col("nrm").alias("l2_norm"),
        F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("unit_vec"),
        F.transform(
            F.col("v"),
            lambda x: F.round(x * F.lit(127.0) / F.col("max_abs"), 0).cast("int"),
        ).alias("int8_vec"),
    )


@register(
    "embeddings_normalize_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm,
             list_reduce(list_transform(v, x -> abs(x)), (acc, x) -> greatest(acc, x)) AS max_abs
      FROM v
    )
    SELECT vec_id, label,
           CAST(round(nrm * 1000000.0, 0) AS BIGINT) AS l2_norm_micro,
           array_to_string(
             list_transform(v, x -> CAST(CAST(round(x / nrm * 1000000.0, 0) AS BIGINT) AS VARCHAR)),
             ',') AS unit_vec,
           array_to_string(
             list_transform(v, x -> CAST(CAST(round(x * 127.0 / max_abs, 0) AS INT) AS VARCHAR)),
             ',') AS int8_vec
    FROM n
    """,
    tags=("llm", "embedding"),
)
def embeddings_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable twin of :func:`normalize_quantize_raw`.

    Raw ``array<double>`` / ``array<int>`` cells are unhashable to the
    driver canonicalizer, and double→string formatting diverges between
    engines (Spark ``1.0E-5`` vs DuckDB ``1e-05``), so every output is
    an integer or a comma-joined integer string: the norm and unit
    vector are scaled to micro-units (×1e6, round-half-up in both
    engines) before serialization. IEEE double ops fold in array order
    on both sides, so the scaled integers are bit-determined."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    nrm = _norm(F.col("v"))
    max_abs = F.aggregate(
        F.transform(F.col("v"), lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    n = e.select("vec_id", "label", "v", nrm.alias("nrm"), max_abs.alias("max_abs"))
    micro = F.lit(1000000.0)
    return n.select(
        "vec_id",
        "label",
        F.round(F.col("nrm") * micro, 0).cast("long").alias("l2_norm_micro"),
        F.array_join(
            F.transform(
                F.col("v"),
                lambda x: F.round(x / F.col("nrm") * micro, 0)
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("unit_vec"),
        F.array_join(
            F.transform(
                F.col("v"),
                lambda x: F.round(x * F.lit(127.0) / F.col("max_abs"), 0)
                .cast("int")
                .cast("string"),
            ),
            ",",
        ).alias("int8_vec"),
    )


def knn_gemm_raw(
    spark: SparkSession, sf_dir: str, query_ceiling: int | None = None
) -> DataFrame:
    """Vectorized brute-force kNN: the query matrix ships inside a
    self-contained mapInPandas closure; each Arrow batch of corpus
    vectors does ONE numpy GEMM against it and emits per-batch top-k
    candidates; a final window rank merges candidates globally.

    This is the Arrow/pandas fast path the brief calls out (batch
    matrix multiply ≫ per-pair expression evaluation): at 100 TB the
    corpus streams through executors in batches while the (small) query
    block broadcasts. Float summation order differs from the scalar
    plan, so the registered ``knn_cosine_gemm`` query wraps this in a
    contract comparing it against the exact scalar plan.

    ``query_ceiling`` pins the collected query block to vec_id below
    it (production: a FIXED probe set — the driver-side collect is
    then O(|probe set|), not corpus-proportional). Registered contract
    unchanged when None.
    """
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    qdf = e.filter(F.col("vec_id") % QUERY_MOD == 0)
    if query_ceiling is not None:
        qdf = qdf.filter(F.col("vec_id") < F.lit(query_ceiling))
    qrows = qdf.select("vec_id", "embedding").collect()
    q_ids = [int(r["vec_id"]) for r in qrows]
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    top_k = TOP_K

    out_schema = (
        "query_id long, neighbor_id long, cosine_sim double"
    )

    def score(batches):
        import numpy as np  # self-contained closure
        import pandas as pd

        qm = q_mat  # captured by value via cloudpickle
        qi = np.array(q_ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = c @ qm.T  # (batch, n_queries)
            cids = pdf["vec_id"].to_numpy()
            rows = []
            k = min(top_k + 1, sims.shape[0])
            for j in range(sims.shape[1]):
                col = sims[:, j]
                idx = np.argpartition(-col, k - 1)[:k]
                for i in idx:
                    if int(cids[i]) != int(qi[j]):
                        rows.append((int(qi[j]), int(cids[i]), round(float(col[i]), 6)))
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "cosine_sim"]
            )

    candidates = e.select("vec_id", "embedding").mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "knn_cosine_gemm",
    oracle=f"""
    SELECT query_id,
           count(*) AS n_neighbors,
           TRUE AS gemm_matches_exact
    FROM ({KNN_EXACT_TOPK_SQL}) t
    GROUP BY query_id
    """,
    tags=("llm", "similarity", "vectorized"),
)
def knn_cosine_gemm(
    spark: SparkSession, sf_dir: str, query_ceiling: int | None = None
) -> DataFrame:
    """Driver-checkable contract over ``knn_gemm_raw``: GEMM float64
    summation order differs from the scalar fold by final ulps, so the
    registered query joins the GEMM top-k against the exact scalar
    top-k (itself hash-checked via ``knn_cosine_bruteforce``) and
    asserts per query that the neighbor sets are identical and the
    reported similarities agree within the 6-dp rounding tolerance. The
    DuckDB oracle recomputes the exact top-k counts and expects TRUE."""
    gemm = knn_gemm_raw(spark, sf_dir, query_ceiling=query_ceiling).select(
        "query_id", "neighbor_id", F.col("cosine_sim").alias("sim_g")
    )
    exact = knn_cosine_bruteforce(
        spark, sf_dir, query_ceiling=query_ceiling
    ).select(
        "query_id", "neighbor_id", F.col("cosine_sim").alias("sim_e")
    )
    j = exact.join(gemm, ["query_id", "neighbor_id"], "full_outer")
    mismatch = (
        F.col("sim_e").isNull()
        | F.col("sim_g").isNull()
        | (F.abs(F.col("sim_e") - F.col("sim_g")) > 1e-6)
    )
    return j.groupBy("query_id").agg(
        F.sum(F.when(F.col("sim_e").isNotNull(), 1).otherwise(0)).alias(
            "n_neighbors"
        ),
        (F.sum(F.when(mismatch, 1).otherwise(0)) == 0).alias("gemm_matches_exact"),
    )


N_PLANES = 8


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j of
    plane p is a signed value derived from a fixed integer mix (no RNG —
    reproducible across runs and engines)."""
    comps = []
    for j in range(dim):
        # xorshift-style integer mix, reduced to [-0.5, 0.5)
        h = (plane * 2654435761 + j * 40503) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 1274126177) & 0xFFFFFFFF
        comps.append((h / 4294967296.0) - 0.5)
    return comps


EMBEDDING_DIM = 64  # fixture embedding width (oracle planes are built for it)


def _lsh_oracle() -> str:
    """Full value oracle for the hyperplane-LSH top-k: the hyperplanes
    are deterministic Python-generated constants, so the DuckDB twin
    embeds the same literals and reproduces bucketing bit-for-bit
    (list_reduce folds in the same element order as ``F.aggregate``,
    both in float64 — the same property every other array oracle here
    relies on). The LSH result is approximate w.r.t. brute force but
    EXACT w.r.t. its own definition — so it is hash-checkable."""
    planes = [_hyperplane(EMBEDDING_DIM, p) for p in range(N_PLANES)]

    def arr(plane: list[float]) -> str:
        return "[" + ", ".join(repr(c) for c in plane) + "]"

    def proj(plane: list[float]) -> str:
        return (
            f"list_reduce(list_transform(list_zip(v, {arr(plane)}),"
            " p -> p[1] * p[2]), (acc, x) -> acc + x)"
        )

    bucket = " + ".join(
        f"(CASE WHEN {proj(plane)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm,
             {bucket} AS bucket
      FROM v
    ), pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_reduce(list_transform(list_zip(q.v, c.v),
                                              p -> p[1] * p[2]),
                               (acc, x) -> acc + x)
                   / (q.nrm * c.nrm), 6) AS cosine_sim
      FROM n q JOIN n c
        ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id % {QUERY_MOD} = 0
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
    QUALIFY rank <= {TOP_K}
    """


@register("knn_cosine_lsh", oracle=_lsh_oracle(), tags=("llm", "similarity", "lsh"))
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k: vectors bucket by the 8-bit sign
    signature of projections onto fixed hyperplanes; queries only score
    candidates sharing their bucket. Approximate w.r.t. brute force
    (unit tests measure recall) but exact w.r.t. its own definition —
    the DuckDB oracle replays the same deterministic hyperplanes."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    first = e.select(F.size("v").alias("d")).first()
    dim = first["d"] if first else 0
    planes = [_hyperplane(dim, p) for p in range(N_PLANES)]

    def bucket_of(v: Column) -> Column:
        bits = []
        for p, plane in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(c) for c in plane]),
                    lambda x, c: x * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for bcol in bits[1:]:
            out = out + bcol
        return out

    n = e.select("vec_id", "v", _norm(F.col("v")).alias("nrm"), bucket_of(F.col("v")).alias("bucket"))
    q = n.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    cand = n.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("query_id") != F.col("vec_id")),
    )
    sim = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine_sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


NEARDUP_COSINE = 0.42  # fixture embeddings are near-orthogonal; 0.42 ≈ p99.9+
N_BLOCKS = 8  # block-partition factor for the exact all-pairs pass


@register(
    "embeddings_neardup_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
      FROM v
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_reduce(list_transform(list_zip(a.v, b.v),
                                            p -> p[1] * p[2]),
                             (acc, x) -> acc + x)
                 / (a.nrm * b.nrm), 6) AS cosine_sim
    FROM n a, n b
    WHERE a.vec_id < b.vec_id
      AND list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                      (acc, x) -> acc + x) / (a.nrm * b.nrm) >= {NEARDUP_COSINE}
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "embedding"),
)
def embeddings_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: every unordered pair
    with cosine ≥ threshold (the semantic-dedup step of a training-data
    pipeline — MinHash catches lexical dups, this catches paraphrases).

    Block-partitioned exact all-pairs (round-1 fix: this replaced a
    broadcast nested-loop join that evaluated an interpreted fold per
    pair — 14.7s at sf0.1). Each vector is replicated to the N_BLOCKS
    block-pairs it participates in, the shuffle key is (block_i,
    block_j), and each group computes ONE numpy float64 GEMM between
    its two blocks, emitting only qualifying pairs. Properties at
    scale: no broadcast of the corpus, no driver collect, shuffle
    volume n·N_BLOCKS rows, O(n²) flops done as dense BLAS instead of
    per-pair expression evaluation, and parallelism = N_BLOCKS² / 2
    independent block-pair tasks (raise N_BLOCKS with the cluster).

    Why not LSH candidate generation: at this threshold (0.42 ≈ 3.4σ
    above random for 64-dim) random-hyperplane bands need ~n²
    candidates for full recall — the fixture places qualifying pairs
    3e-5 above the cutoff. A 100%-recall candidate generator therefore
    IS the blocked exact pass; ``knn_cosine_lsh`` remains the
    approximate path for real ≥0.9 semantic thresholds.

    Exactness vs the DuckDB all-pairs oracle: GEMM float64 sums differ
    from DuckDB's sequential fold only in final ulps (~1e-16 relative);
    the fixture's threshold margin (≥3e-5) and the 6-dp rounding margin
    absorb that, and the emitted value is re-rounded JVM-side with
    Spark's HALF_UP round to match DuckDB's rounding mode
    (`tests/test_llm.py` referees against the scalar all-pairs plan)."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    nb = N_BLOCKS
    rep = (
        e.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(nb)).cast("int"))
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))
        .select(
            "vec_id",
            "embedding",
            "blk",
            F.least("blk", "other").alias("bi"),
            F.greatest("blk", "other").alias("bj"),
        )
    )
    threshold = NEARDUP_COSINE
    out_schema = "id_a long, id_b long, cosine_raw double"

    def score_block_pair(key, pdf):
        import numpy as np  # self-contained closure (worker sys.path)
        import pandas as pd

        bi, bj = int(key[0]), int(key[1])
        a = pdf[pdf["blk"] == bi]
        b = pdf[pdf["blk"] == bj]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine_raw"])
        ma = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        mb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        ma /= np.linalg.norm(ma, axis=1, keepdims=True)
        mb /= np.linalg.norm(mb, axis=1, keepdims=True)
        sims = ma @ mb.T
        ia = a["vec_id"].to_numpy()
        ib = b["vec_id"].to_numpy()
        ii, jj = np.where(sims >= threshold)
        rows = []
        for i, j in zip(ii, jj):
            u, v = int(ia[i]), int(ib[j])
            if bi == bj:
                if u >= v:  # diagonal block sees each pair twice
                    continue
                rows.append((u, v, float(sims[i, j])))
            elif u != v:
                rows.append((min(u, v), max(u, v), float(sims[i, j])))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine_raw"])

    pairs = rep.groupBy("bi", "bj").applyInPandas(score_block_pair, out_schema)
    return pairs.select(
        "id_a", "id_b", F.round("cosine_raw", 6).alias("cosine_sim")
    ).orderBy("id_a", "id_b")


# --- Matryoshka prefix-dimension retrieval (Kusupati et al. 2022) ----
# MRL-trained embeddings pack the most information into the leading
# dims, so a d/4 PREFIX is a usable coarse representation: scan the
# cheap prefix to shortlist candidates, fetch full vectors only for the
# shortlist, rerank exactly. At 100 TB the prefix store is 4x less IO
# on the scan path and the full-vector fetch is a bounded
# |queries|*C-row join, not a corpus scan.

MRL_PREFIX_DIM = 16
MRL_CANDIDATES = 20

# Shared DuckDB CTE block: normalized full vectors + prefix slices with
# both norms. ONE definition consumed by the matryoshka oracle here and
# the ANN-hybrid oracle in ``llm.fusion`` — the prefix slice / norm
# expressions must stay byte-identical between them.
MRL_VN_CTES = f"""v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v, v[1:{MRL_PREFIX_DIM}] AS p,
             sqrt(list_reduce(list_transform(v, x -> x * x),
                              (acc, x) -> acc + x)) AS nrm,
             sqrt(list_reduce(list_transform(v[1:{MRL_PREFIX_DIM}], x -> x * x),
                              (acc, x) -> acc + x)) AS pnrm
      FROM v
    )"""


@register(
    "knn_matryoshka_rerank",
    oracle=f"""
    WITH {MRL_VN_CTES}, cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_reduce(list_transform(list_zip(q.p, c.p),
                                              pr -> pr[1] * pr[2]),
                               (acc, x) -> acc + x)
                   / (q.pnrm * c.pnrm), 6) AS prefix_sim,
             round(list_reduce(list_transform(list_zip(q.v, c.v),
                                              pr -> pr[1] * pr[2]),
                               (acc, x) -> acc + x)
                   / (q.nrm * c.nrm), 6) AS cosine_sim
      FROM n q, n c
      WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
    ), shortlist AS (
      SELECT query_id, neighbor_id, prefix_sim, cosine_sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY prefix_sim DESC, neighbor_id
             ) AS prefix_rank
      FROM cand
      QUALIFY prefix_rank <= {MRL_CANDIDATES}
    )
    SELECT query_id, neighbor_id, prefix_sim,
           CAST(prefix_rank AS INT) AS prefix_rank, cosine_sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
           ) AS INT) AS rank
    FROM shortlist
    QUALIFY rank <= {TOP_K}
    """,
    tags=("llm", "similarity", "matryoshka"),
)
def knn_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval on dimension-truncated (Matryoshka) vectors:
    shortlist top-{MRL_CANDIDATES} per query by PREFIX-{MRL_PREFIX_DIM}
    cosine, then rerank the shortlist by full-dimension cosine and keep
    top-{TOP_K}.

    Plan shape: stage 1 scans only the prefix representation with the
    query block broadcast (identical to the brute-force scan but on a
    4x narrower vector); stage 2 joins the C-row-per-query shortlist —
    broadcast, bounded by |queries|*C at any corpus size — back to the
    corpus for full vectors. Both similarities are single-fold doubles
    rounded to 6 dp; ties break on neighbor id (bit-identical to the
    DuckDB oracle).

    Recall caveat: the fixture vectors are random, so the prefix
    carries only ~{MRL_PREFIX_DIM}/64 of the cosine mass and shortlist
    recall is far below what MRL-trained embeddings give (where the
    leading dims are trained to dominate); the pytest bound is
    therefore "far above chance", not a production recall target."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    n = e.select(
        "vec_id",
        "v",
        F.slice("v", 1, MRL_PREFIX_DIM).alias("p"),
    ).select(
        "vec_id", "v", "p", _norm(F.col("v")).alias("nrm"), _norm(F.col("p")).alias("pnrm")
    )
    q = n.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("p").alias("qp"),
        F.col("pnrm").alias("qpnrm"),
    )
    # Stage 1: prefix scan — corpus reads (vec_id, p, pnrm) only.
    prefix_reps = n.select("vec_id", "p", "pnrm")
    cand = (
        prefix_reps.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qp"), F.col("p")) / (F.col("qpnrm") * F.col("pnrm")), 6
            ).alias("prefix_sim"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("prefix_sim"), F.asc("neighbor_id")
    )
    shortlist = cand.withColumn("prefix_rank", F.row_number().over(w1)).filter(
        F.col("prefix_rank") <= MRL_CANDIDATES
    )
    # Stage 2: fetch full vectors for the bounded shortlist and rerank.
    qfull = n.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    full = n.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm")
    reranked = (
        full.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "prefix_sim",
            F.col("prefix_rank").cast("int").alias("prefix_rank"),
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


def _lsh_eval_oracle() -> str:
    """Recall@k / top-1 agreement of the LSH ranking vs exact brute
    force — both sides are the exact SQL twins of the corresponding
    registered queries, so the metric itself is hash-checkable."""
    return f"""
    WITH exact AS (
      {KNN_EXACT_TOPK_SQL}
    ), lsh AS (
      SELECT * FROM ({_lsh_oracle()})
    )
    SELECT e.query_id,
           CAST(count(l.neighbor_id) AS BIGINT) AS n_overlap,
           round(count(l.neighbor_id) / CAST({TOP_K} AS DOUBLE), 6)
             AS recall_at_k,
           CAST(max(CASE WHEN e.rank = 1 AND l.rank = 1 THEN 1 ELSE 0 END)
                AS INT) AS top1_hit
    FROM exact e
    LEFT JOIN lsh l
      ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    GROUP BY e.query_id
    """


@register(
    "knn_lsh_recall_eval",
    oracle=_lsh_eval_oracle(),
    tags=("llm", "similarity", "evaluation"),
)
def knn_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation as a first-class operator: per-query
    recall@{TOP_K} and top-1 agreement of the hyperplane-LSH ranking
    against the exact brute-force top-k — the measurement loop every
    ANN deployment runs before trading exactness for scale (tune
    N_PLANES / probes against this curve).

    Composes the two registered rankings and reduces them with one
    LEFT join + groupBy on (query_id, neighbor_id) — both sides are
    top-k-bounded, so the join input is |queries|·k rows at ANY corpus
    size; the expensive part is the rankings themselves, which reuse
    their registered (and independently verified) plans."""
    exact = knn_cosine_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("exact_rank")
    )
    lsh = knn_cosine_lsh(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("lsh_neighbor"),
        F.col("rank").alias("lsh_rank"),
    )
    joined = exact.join(
        lsh,
        (exact["query_id"] == lsh["query_id"])
        & (exact["neighbor_id"] == lsh["lsh_neighbor"]),
        "left",
    ).select(
        exact["query_id"],
        "neighbor_id",
        "exact_rank",
        "lsh_neighbor",
        "lsh_rank",
    )
    return joined.groupBy("query_id").agg(
        F.count("lsh_neighbor").cast("bigint").alias("n_overlap"),
        F.round(F.count("lsh_neighbor") / float(TOP_K), 6).alias("recall_at_k"),
        F.max(
            F.when(
                (F.col("exact_rank") == 1) & (F.col("lsh_rank") == 1), 1
            ).otherwise(0)
        )
        .cast("int")
        .alias("top1_hit"),
    )
