"""Scale-stress heavy operator families: does shuffle volume grow linearly?

Inflates the sf0.1 documents/embeddings fixtures k× (k = 1, 2, 4) and
runs the production near-dup queries — plus BM25 retrieval, k-means,
DSIR selection, and the composed curation pipeline — at each size in a fresh
session with event logging on, then sums per-task shuffle write bytes
from the event log. The check is the growth EXPONENT between sizes
(log bytes-ratio / log size-ratio):

- ``docs_minhash_lsh_pairs`` and ``docs_dup_clusters`` must stay
  ~linear (exponent ≤ 1.35): banded LSH emits O(n·bands) bucket rows
  and label propagation touches each edge a bounded number of rounds.
- ``embeddings_dedup_apply`` rides the DELIBERATELY exact all-pairs
  GEMM (`llm/similarity.py` documents the trade); its shuffle may grow
  up to quadratically (exponent ≤ 2.3 asserted) — the linear-scale
  alternative is the LSH/IVF kNN family.

Inflation preserves semantics-per-copy:
- documents: copy c prefixes every word with ``c{c}x`` — a bijection
  on shingles, so each copy reproduces the original near-dup pair set
  exactly and copies share NO shingles (pair count scales ×k, never
  ×k²).
- embeddings: copy c uses fresh unit Gaussians from ``rng(c)`` —
  near-orthogonal to everything, so planted cluster structure stays
  constant while corpus size scales (random-pair cosine still crosses
  the 0.42 fixture threshold at its background rate, which is why the
  exact path's pair count is intrinsically quadratic-rate there).

Usage:  python tools/scale_stress.py [base_sf_dir]
Writes STRESS_local.json at the repo root; bench.py folds the summary
into its compact line when the file exists.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = (
    "docs_minhash_lsh_pairs",
    "docs_dup_clusters",
    "embeddings_dedup_apply",
    "docs_bm25_topk",
    "embeddings_kmeans",
    "docs_dsir_weights",
    "corpus_curation_e2e",
    "docs_minhash_incremental_pairs",
    "embeddings_semdedup",
    "embeddings_semdedup_scaledk",
    "docs_segment_dedup_apply",
    "retrieval_hybrid_rrf",
)
SCALES = (1, 2, 4)


def _semdedup_scaledk(spark, sf_dir):
    """Production SemDeDup path: k data-derived (∝ corpus size), so
    expected cluster size — and with it the within-cluster quadratic
    pair scan — stays constant under inflation."""
    from python_nyc_taxi_data_pipeline_spark.llm.semdedup import semdedup

    return semdedup(spark, sf_dir, k=None)


# Non-registered callables stressed alongside the registry queries.
EXTRA_FNS = {"embeddings_semdedup_scaledk": _semdedup_scaledk}
MAX_EXPONENT = {
    # Near-dup family (r4): banded LSH / label propagation are linear;
    # embeddings_dedup_apply rides the documented exact all-pairs GEMM.
    "docs_minhash_lsh_pairs": 1.35,
    "docs_dup_clusters": 1.35,
    "embeddings_dedup_apply": 2.3,
    # Retrieval / clustering / selection / composed curation: all are
    # claimed linear-shuffle designs (broadcast stats or k·d-bounded
    # aggregation states) — hold them to the same ~linear bar.
    "docs_bm25_topk": 1.35,
    "embeddings_kmeans": 1.35,
    "docs_dsir_weights": 1.35,
    "corpus_curation_e2e": 1.35,
    # Incremental minhash probes the persisted band index with the new
    # batch only; SemDeDup is nearest-of-k-seed clustering + within-
    # cluster pruning — both claimed linear.
    "docs_minhash_incremental_pairs": 1.35,
    "embeddings_semdedup": 1.35,
    # Segment dedup shuffles one packed-long row per segment (the
    # inflation's word-prefix bijection means copies share no segments
    # — keeper groups scale *k); hybrid RRF is BM25's scan-linear plan
    # plus bounded anchor/fusion joins.
    "docs_segment_dedup_apply": 1.35,
    "retrieval_hybrid_rrf": 1.35,
    # Data-derived k (k ∝ n): cluster sizes stay constant under
    # inflation, so the pair-scan shuffle must stay ~linear too.
    "embeddings_semdedup_scaledk": 1.35,
}
EVENTLOG_DIR = "/tmp/spark-stress-eventlogs"


def build_inflated(base_sf_dir: str, k: int, outdir: str) -> None:
    """Materialize a k×-inflated fixture dir (documents + embeddings
    rewritten, every other table symlinked from the base dir)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(outdir, exist_ok=True)
    docs = pq.read_table(os.path.join(base_sf_dir, "documents.parquet"))
    d = docs.to_pandas()
    parts = []
    for c in range(k):
        p = d.copy()
        p["doc_id"] = p["doc_id"] + c * 10_000_000
        if c > 0:
            prefix = f"c{c}x"
            p["text"] = p["text"].map(
                lambda t: " ".join(prefix + w for w in t.split(" "))
            )
        parts.append(p)
    import pandas as pd

    docs_all = pd.concat(parts, ignore_index=True)
    # Small row groups: a single-row-group file reads as ONE Spark
    # partition, and a 1-partition plan satisfies every distribution
    # trivially — AQE then ELIDES all exchanges and the harness would
    # measure 0 shuffle bytes (observed: docs_segment_dedup_apply
    # reported 59 bytes). 16 row groups per file keeps the stress run
    # representative of a multi-executor scan.
    pq.write_table(
        pa.Table.from_pandas(docs_all, preserve_index=False),
        os.path.join(outdir, "documents.parquet"),
        row_group_size=max(1, len(docs_all) // 16),
    )

    emb = pq.read_table(os.path.join(base_sf_dir, "embeddings.parquet")).to_pandas()
    dim = len(emb["embedding"].iloc[0])
    eparts = [emb]
    for c in range(1, k):
        rng = np.random.default_rng(c)
        vecs = rng.normal(size=(len(emb), dim))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        p = emb.copy()
        p["vec_id"] = p["vec_id"] + c * 10_000_000
        p["embedding"] = [row.astype(np.float32).tolist() for row in vecs]
        eparts.append(p)
    emb_all = pd.concat(eparts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(emb_all, preserve_index=False),
        os.path.join(outdir, "embeddings.parquet"),
        row_group_size=max(1, len(emb_all) // 16),
    )

    for f in glob.glob(os.path.join(base_sf_dir, "*.parquet")):
        name = os.path.basename(f)
        if name in ("documents.parquet", "embeddings.parquet"):
            continue
        dst = os.path.join(outdir, name)
        if not os.path.exists(dst):
            os.symlink(f, dst)


def shuffle_bytes_from_eventlog(log_dir: str, app_id: str) -> int:
    """Sum Shuffle Bytes Written across all SparkListenerTaskEnd events.
    Handles both single-file and rolling (eventlog_v2_<appid>/events_*)
    layouts; compression is disabled in the session config."""
    candidates = []
    for path in glob.glob(os.path.join(log_dir, f"*{app_id}*")):
        if os.path.isdir(path):
            candidates.extend(glob.glob(os.path.join(path, "events_*")))
        else:
            candidates.append(path)
    total = 0
    for path in candidates:
        with open(path, errors="replace") as f:
            for line in f:
                if '"Event":"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                sw = (ev.get("Task Metrics") or {}).get("Shuffle Write Metrics") or {}
                total += int(sw.get("Shuffle Bytes Written", 0))
    return total


def run_query(name: str, sf_dir: str) -> dict:
    """One query in a fresh session with event logging; returns metrics."""
    from python_nyc_taxi_data_pipeline_spark.registry import all_queries
    from python_nyc_taxi_data_pipeline_spark.session import get_session

    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    spark = get_session(
        f"stress-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
            "spark.eventLog.compress": "false",
            # split the small fixture files across input partitions so
            # the measured plans shuffle like a real multi-executor scan
            "spark.sql.files.maxPartitionBytes": "262144",
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    app_id = spark.sparkContext.applicationId
    t0 = time.perf_counter()
    fn = EXTRA_FNS.get(name) or all_queries()[name].fn
    df = fn(spark, sf_dir)
    # Force FULL evaluation via an observed noop write. A bare
    # df.count() lets Catalyst eliminate the query: e.g. a left outer
    # join back to the corpus on a groupBy key is provably unique on
    # the build side, so count(*) collapses to a naked file scan and
    # the harness measures 0 shuffle (observed: segment dedup reported
    # 59 bytes while really shuffling megabytes).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
        "noop"
    ).mode("overwrite").save()
    rows = int(obs.get["rows"])
    sec = round(time.perf_counter() - t0, 3)
    spark.stop()
    time.sleep(1)  # let the event log flush/close
    return {
        "sec": sec,
        "rows": rows,
        "shuffle_write_bytes": shuffle_bytes_from_eventlog(EVENTLOG_DIR, app_id),
    }


def bpe_mode(base: str) -> int:
    print(json.dumps(bpe_merge_cost(base)))
    return 0


def bpe_merge_cost(base: str, n_merges: int = 200) -> dict:
    """BPE training at a realistic merge count (stress-only; the oracle
    query proves the mechanism at N_MERGES=6). Measures the serial
    driver-loop cost: each round is one pair-count shuffle + a 1-row
    take, so per-round wall time ≈ fixed job-scheduling overhead once
    the distinct-word table is small — this quantifies whether batching
    top-m non-overlapping merges per round is worth the approximation."""
    from python_nyc_taxi_data_pipeline_spark.llm import bpe
    from python_nyc_taxi_data_pipeline_spark.session import get_session

    spark = get_session("stress-bpe200")
    # bypass the merge cache: a cached (sf_dir, 6) entry must not serve
    # a 200-merge request, and this run must not poison real queries
    bpe._MERGES_CACHE.pop((os.path.abspath(base), n_merges), None)
    t0 = time.perf_counter()
    merges, words = bpe.bpe_train(spark, base, n_merges=n_merges)
    words.write.format("noop").mode("overwrite").save()
    total = round(time.perf_counter() - t0, 3)
    bpe._MERGES_CACHE.pop((os.path.abspath(base), n_merges), None)
    spark.stop()
    return {
        "n_merges_requested": n_merges,
        "n_merges_learned": len(merges),
        "total_sec": total,
        "sec_per_round": round(total / max(1, len(merges)), 3),
    }


def main() -> int:
    # --bpe-only is positional-agnostic: `scale_stress.py --bpe-only`
    # must not be misread as base='--bpe-only' (which would rmtree the
    # stress dirs and crash on a nonexistent fixture path).
    args = [a for a in sys.argv[1:] if a != "--bpe-only"]
    bpe_only = "--bpe-only" in sys.argv[1:]
    base = args[0] if args else "/root/testdata/sf0.1"
    if bpe_only:
        return bpe_mode(base)
    dirs = {}
    for k in SCALES:
        outdir = f"/tmp/stress_x{k}"
        if os.path.exists(outdir):
            shutil.rmtree(outdir)
        build_inflated(base, k, outdir)
        dirs[k] = outdir
        print(f"# built {outdir}", file=sys.stderr)

    results: dict[str, dict] = {}
    failures = []
    for name in QUERIES:
        per_scale = {}
        for k in SCALES:
            m = run_query(name, dirs[k])
            per_scale[str(k)] = m
            print(f"# {name} x{k}: {m}", file=sys.stderr)
        exps = []
        for lo, hi in zip(SCALES, SCALES[1:]):
            b_lo = per_scale[str(lo)]["shuffle_write_bytes"]
            b_hi = per_scale[str(hi)]["shuffle_write_bytes"]
            if b_lo > 0 and b_hi > 0:
                exps.append(
                    round(math.log(b_hi / b_lo) / math.log(hi / lo), 3)
                )
        worst = max(exps) if exps else None
        ok = worst is not None and worst <= MAX_EXPONENT[name]
        if not ok:
            failures.append(name)
        results[name] = {
            "scales": per_scale,
            "shuffle_growth_exponents": exps,
            "worst_exponent": worst,
            "max_allowed": MAX_EXPONENT[name],
            "ok": ok,
        }

    out = {
        "metric": "neardup_scale_stress",
        "base_sf_dir": base,
        "scales": list(SCALES),
        "queries": results,
        "ok": not failures,
        "bpe_200_merges": bpe_merge_cost(base),
    }
    with open(os.path.join(ROOT, "STRESS_local.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
