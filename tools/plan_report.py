"""Generate PLANS.md: formatted physical plans of headline queries.

The plan-invariant tests (tests/test_plans.py) PIN the properties —
pushdown, broadcast choices, no cartesian/row-UDF/single-partition
exchanges; this artifact makes the same plans human-readable so a
reviewer can audit the physical strategy without running Spark.

Usage: python tools/plan_report.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.01"

# (query, one-paragraph commentary on what the plan should show)
HEADLINERS = [
    (
        "tpch_q1_pricing_summary",
        "Scan-heavy aggregate: the shipdate filter is pushed into the "
        "parquet scan (PushedFilters), aggregation is two-phase "
        "(partial HashAggregate before the exchange, merge after), and "
        "DECIMAL accumulators keep sums order-independent.",
    ),
    (
        "tpch_q18_large_orders",
        "HAVING semi-join: the >300-qty orderkey set is built by a "
        "partial-agg pipeline and joined back; no forced broadcast "
        "hints — AQE picks broadcast-hash from runtime stats.",
    ),
    (
        "flagship_supplier_metrics",
        "Fact-dim join + grouped agg: supplier side is chosen for "
        "broadcast by the planner (no pinned hint on an SF-scaled "
        "table), lineitem scans only the joined/aggregated columns "
        "(ReadSchema pruning).",
    ),
    (
        "dedup_exact",
        "Hash-aggregate dedup on md5(text): 16-byte shuffle keys, no "
        "wide-key sort, single exchange.",
    ),
    (
        "docs_minhash_lsh_pairs",
        "Banded LSH: shingle/signature derivation is JVM expression "
        "work above a localCheckpoint barrier; candidate generation "
        "shuffles (band, band_hash) keys; exact-Jaccard verification "
        "touches candidates only.",
    ),
    (
        "docs_dsir_weights",
        "DSIR selection: one explode->agg into 64 feature buckets, a "
        "scalar-aggregate total broadcast back (benign SinglePartition "
        "under a Keys:[] aggregate), broadcast feature join, and "
        "TakeOrderedAndProject for the top-k (no global sort).",
    ),
    (
        "knn_matryoshka_rerank",
        "Two-stage ANN: stage 1 scans prefix vectors with the query "
        "block broadcast; stage 2 joins the bounded shortlist back for "
        "full vectors; per-query windows rank within partitions.",
    ),
    (
        "events_cum_users_hll_merge",
        "Mergeable sketches: per-day hll_sketch_agg is map-side "
        "combined; the cumulative union is a triangular self-join of "
        "the ~30-row sketch table — no global window, no "
        "SinglePartition funnel of corpus data.",
    ),
    (
        "docs_segment_dedup_apply",
        "Sub-document dedup applied: segmentation is one codegen "
        "projection (word array bound once via a lambda variable, no "
        "re-tokenize per segment); keeper election is a hash aggregate "
        "on md5(segment) with map-side partial min; the keep join is "
        "LEFT SEMI on compact (doc_id, seg_idx) keys; reassembly is "
        "one groupBy with in-group struct sort.",
    ),
    (
        "retrieval_hybrid_rrf",
        "Hybrid RRF: the BM25 stage's vocabulary filter reaches the "
        "scan; the dense stage broadcasts the q-row anchor block and "
        "streams the corpus once; fusion is a full-outer join of two "
        "bounded q*k rank lists (AQE broadcasts both).",
    ),
    (
        "retrieval_hybrid_rrf_ann",
        "Hybrid RRF, ANN dense stage (r5): the corpus stream carries "
        "only the 16-dim prefix against the broadcast anchor block; "
        "full vectors are joined only for the broadcast "
        "|queries|*candidates shortlist; fusion identical to the exact "
        "variant.",
    ),
    (
        "corpus_curation_funnel",
        "Per-stage attrition report (r5): a union of five scalar "
        "aggregates over the shared stage frames. The static plan "
        "shows each branch's lineage independently; exchange reuse "
        "happens at runtime (AQE), and each branch's count/sum "
        "partial-aggregates below the union — measured faster than a "
        "single-pass flag-join rewrite (2.4s vs 3.6s warm at sf0.1).",
    ),
    (
        "docs_incremental_exact_dedup",
        "Incremental exact dedup (r5): ONE batch lineage — each batch "
        "slice scanned once, membership via a left join against the "
        "distinct corpus hash set folded with the keep-first window "
        "into the verdict expression. The fixture computes md5 from "
        "text at scan time; in production the corpus side is a "
        "persisted 16-byte hash index, so only hashes shuffle. r6 adds "
        "a per-row raise_error range guard on the replay shift (plan "
        "shows it as a projection expression, no extra exchange) and a "
        "forced-shuffle-join stress entry proving the over-broadcast-"
        "threshold degradation stays linear.",
    ),
    (
        "docs_bloom_decontamination",
        "Bloom-prefiltered decontamination (r6): the test split's "
        "shingles collapse to a <=M/64-row (widx, word) bitmap via one "
        "bit_or hash-aggregate, and the probe is K=4 BroadcastHashJoins "
        "against that bitmap — one per hash function — so membership "
        "is decided entirely MAP-SIDE (the earlier positions-explode + "
        "groupBy(doc_id, sh) form paid a corpus-shingle-sized shuffle "
        "keyed by the shingle string just to re-merge the K rows). "
        "Only the ~1%-FPR candidate remnant reaches the exact string "
        "equi-join; corpus-sized frames sit above localCheckpoint "
        "barriers.",
    ),
    (
        "docs_winnowing_fingerprints",
        "Winnowing / MOSS (r6): positional trigram hashing and the "
        "(hash, rightmost-pos) sliding-window min are ARRAY expressions "
        "(slice + array_min over the packed-key array, O(m*w) "
        "arithmetic) inside the scan stage — no exchange exists before "
        "the pair emit; the earlier posexplode + per-doc window-sort + "
        "DISTINCT form paid two corpus shuffles for the same selection. "
        "The packed-long min keeps tie-breaking inside whole-stage "
        "codegen (no struct ordering). The winnowed selection — "
        "2/(w+1) of the k-gram stream — is materialized once above a "
        "localCheckpoint barrier for its three consumers (posting "
        "pair emit + both per-doc count sides), then the shared "
        "posting_pair_emit groups fingerprint posting lists and emits "
        "doc-pair combinations JVM-side with the hot-key ceiling.",
    ),
    (
        "docs_simhash_band_pairs",
        "SimHash band search (r6): Charikar bit-vote fingerprinting "
        "is one map-side-combined 60-column conditional-sum aggregate "
        "over the shingle explode; fingerprints localCheckpoint once "
        "and feed band explosion (4 rows/doc) AND both verify-join "
        "sides. Band buckets group through the shared posting emit "
        "with the hot-bucket cap; candidates are distinct-ed before "
        "the two broadcast fingerprint joins and the bit_count(xor) "
        "verify projection. The all-pairs form exists only as the "
        "DuckDB oracle — the Spark plan never materializes O(n^2).",
    ),
    (
        "embeddings_semdedup_ivf_contract",
        "SemDeDup IVF contract (r6): both variants' assignments sit "
        "above localCheckpoint barriers (Lloyd's centroid matrix "
        "reaches executors as a broadcast one-row frame; the "
        "fixed-seed variant broadcasts the k-seed block); the "
        "within-cluster pair scans shuffle on cluster_id only; the "
        "final agreement aggregate is one full-outer join of two "
        "n-row verdict frames into a scalar row.",
    ),
    (
        "docs_minhash_oph_pairs",
        "Densified OPH MinHash (staged r7): ONE xxhash64 per shingle; "
        "the hash array, the 16-bin mins, and the densified signature "
        "are separate localCheckpoint stages — the borrow scan "
        "references the bins k*k times from lambda bodies (CSE-exempt), "
        "so an inlined bins expression re-evaluates ~256x/doc (measured "
        "5.5x slower end-to-end). Banding/bucketing/verify are "
        "plan-identical to docs_minhash_lsh_pairs.",
    ),
    (
        "docs_semantic_decontamination",
        "Semantic decontamination (staged r7): the held-out block "
        "broadcasts into a BroadcastNestedLoopJoin against the "
        "streaming train corpus; the per-test argmax is a struct-max "
        "HashAggregate (map-side partial), so the n*q pair frame is "
        "never sorted or shuffled — only |test| rows exchange.",
    ),
    (
        "embeddings_margin_mining",
        "Margin mining (staged r7): the micro-quantized pair frame is "
        "checkpointed once for its three consumers; both k-NN passes "
        "are windows PARTITIONED by doc id; the test-side neighborhood "
        "sums broadcast back while the corpus-sized train-side frame "
        "joins UNHINTED (AQE broadcasts at fixture scale, shuffle join "
        "beyond the threshold); the final argmax is a struct max — a "
        "partition-sorted SortAggregate over the same checkpointed "
        "pair frame both k-NN windows already partition-sort, no extra "
        "exchange (margins are data-dependent ratios, so the "
        "decontamination report's packed-long HashAggregate idiom "
        "doesn't apply).",
    ),
    (
        "docs_edit_similarity_pairs",
        "Levenshtein verify stage: candidate pairs come from the "
        "inverted-index emit (one posting shuffle); the corpus text "
        "column is joined for CANDIDATE PAIRS ONLY (two doc_id "
        "equi-joins, AQE-broadcast at fixture scale), and the DP runs "
        "as codegen `levenshtein` on the joined rows — no Python, no "
        "text shuffle.",
    ),
    (
        "docs_source_js_divergence",
        "JS divergence: one map-side-combined (source, token) count "
        "shuffle is the only corpus-sized stage; top-V is a bounded "
        "TakeOrdered broadcast; the pair grid is |sources|-bounded "
        "arithmetic with micro-nat integer sums.",
    ),
    (
        "docs_ccnet_perplexity_buckets",
        "CCNet terciles: the LM scoring plan (explode -> broadcast LM "
        "-> per-doc rollup) feeds ONE window partitioned by lang "
        "ordered by an exact fixed-point integer key; final rollup is "
        "a 3*|langs|-group HashAggregate.",
    ),
    (
        "events_conversion_funnel",
        "Windowed conversion funnel (staged r7): ONE user-key Exchange + ONE Sort carry BOTH running-max windows back to back (identical partitioning/ordering, so Catalyst plans no second sort) — the naive funnel is an events-to-events self-join per step; this is one pass. The per-user rollup partial-aggregates on the already-partitioned key, the 3-row report is the one benign scalar exchange, and `stack` generates the step rows driver-free.",
    ),
    (
        "part_blocking_pairs",
        "Blocked sorted-neighborhood pairing (staged r7): the ranked frame is checkpointed once and feeds both join sides (no double sort/split); each row explodes into SNM_WINDOW (block, rank+delta) probe keys so the neighbor pairing is an exact EQUI-join — AQE broadcasts the probe side at fixture scale and degrades to a hash-partitioned shuffle join on (block, rnk) beyond the threshold; either way no per-block theta-join (which would be quadratic per block). The similarity cut compares cross-multiplied integers.",
    ),
    (
        "docs_kneser_ney_bigrams",
        "Kneser-Ney bigram table (staged r7): the corpus is exploded ONCE into the bigram count aggregate, localCheckpointed; the context (n_prefix, n_follow_types), continuation (n_prec_types), and the final join tree all scan that ExistingRDD — bigram-type scale, never the corpus. Both enrichment sides broadcast after their word-key aggregates; the head is TakeOrderedAndProject (no global sort materialization). Stress: near-flat shuffle under 4x inflation (exponent 0.084).",
    ),
    (
        "customer_k_anonymity",
        "k-anonymity audit (staged r7): ONE shuffle — the quasi-identifier hash aggregate (map-side combined). The class-size frame is QI-domain-bounded, so the threshold explode and the per-k rollup happen on dimension-table cardinalities; the per-k aggregate's Exchange moves ~4 keys.",
    ),
    (
        "events_interarrival_entropy",
        "Inter-arrival entropy (staged r7): one user-key Exchange+Sort for the lag window; the (user, digit-bucket) and per-user aggregates ride the same key (map-side combined, <=13 buckets/user); the terms join is user-keyed over two already-aggregated frames. Gap microseconds come from NTZ-native timestampdiff, so the plan carries no timezone-dependent expression.",
    ),
    (
        "orders_rfm_segments",
        "RFM segmentation (staged r7): the RFM frame is one o_custkey hash aggregate, checkpointed for its two consumers; quintiles come from the sortless histogram cut — the (metric, bucket) histogram is DOMAIN-bounded, its cumulative is a triangular self-join on that bounded frame (no window over customers anywhere), the 12-row boundary table broadcasts into the assignment join, and scores re-aggregate on the customer key. The ref-date anchor is a 1-row broadcast; all timestamp arithmetic is NTZ (see the DST-shift note in the docstring).",
    ),
    (
        "orders_benford_audit",
        "Benford audit (staged r7): the single parquet scan lives under the 9-row `obs` localCheckpoint (the un-checkpointed plan replayed it 4x through the tot/terms/chi branches — post-fix the physical plan shows ZERO parquet scans, everything downstream is 9-row ExistingRDD work); the digit frame LEFT-joins observed counts and the two scalar frames (total, chi-square sum) attach as broadcast one-row BNLJs.",
    ),
    (
        "orders_column_profile",
        "Column profile (staged r7): ONE scan -> Generate (stack long form) -> two chained HashAggregates ((col, value) map-side combined, then the 6-group rollup), plus a wide 1-row native min/max HashAggregate broadcast back onto the 6-row frame. Free-form string columns carry NULL min/max by design: an exact string min/max has an immutable aggregation buffer and falls back to SortAggregate — a per-partition sort of the whole distinct frame — which the fleet sweep forbids (caught there, rewritten to this form). Every aggregate in the plan is a HashAggregate.",
    ),
    (
        "customer_mad_outliers",
        "MAD outlier gate (staged r7): the two exact percentiles are single-reduce ObjectHashAggregates (median, then MAD over the med-broadcast deviation pass); both land as broadcast one-row frames over the final scoring scan. Exact-percentile passes are the documented scale cost; the approx_percentile swap removes them at trillion-row scale.",
    ),
    (
        "nation_trade_pagerank",
        "Weighted PageRank (staged r7): the 4-table edge aggregation — the only fact-scale job — runs once at checkpoint time, so the visible plan is entirely 25-row ExistingRDD frames: per-iteration dangling anti-join + incoming-mass HashAggregate (integer pico-rank terms), final assembly joins on nation keys. Iteration lineage is flattened by per-round localCheckpoints; nothing corpus-sized survives past the edge build.",
    ),
    (
        "orders_zorder_skipping_contract",
        "Z-order skipping contract (staged r7): buckets + Morton codes are per-row integer expressions over the broadcast date anchor, pinned once by the `rz` localCheckpoint that feeds BOTH the zone-map build (stack -> (layout, file) HashAggregate, 128 groups) and the selected-row conditional aggregate; pruning evaluation is a broadcast cross of the 128-row stats frame with the 3-row predicate table.",
    ),
]


def main() -> int:
    from python_nyc_taxi_data_pipeline_spark.registry import all_queries
    from python_nyc_taxi_data_pipeline_spark.session import get_session

    from python_nyc_taxi_data_pipeline_spark.llm.staged_r7 import STAGED

    spark = get_session("plan-report")
    qs = dict(all_queries())
    qs.update({n: q for n, q in STAGED.items() if n not in qs})
    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        "Generated by `tools/plan_report.py` at sf0.01 (plans are",
        "scale-invariant in shape; AQE may re-plan exchanges at runtime).",
        "Invariants are enforced by `tests/test_plans.py`; this file is",
        "the human-readable audit trail.",
        "",
    ]
    for name, note in HEADLINERS:
        df = qs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", note, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(ROOT, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(HEADLINERS)} plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
