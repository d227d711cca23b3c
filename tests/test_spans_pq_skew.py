"""Unit invariants for the round-3 scale-pattern operators:
cross-corpus duplicated-span fraction (llm.spans), product-quantization
codes (llm.kmeans), and the salted two-stage aggregation (plans.skew).
Driver-level value parity is covered by each query's DuckDB oracle;
these tests pin the semantics on hand-computable inputs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from python_nyc_taxi_data_pipeline_spark.llm.kmeans import (
    PQ_K,
    PQ_M,
    _load_vectors,
    _seed_centroids,
    embeddings_pq_codes,
)
from python_nyc_taxi_data_pipeline_spark.llm.spans import (
    SPAN_N,
    docs_corpus_dup_span_fraction,
    span_hashes,
)
from python_nyc_taxi_data_pipeline_spark.plans.skew import (
    events_type_value_salted,
)
from python_nyc_taxi_data_pipeline_spark.catalog import load

from tests.conftest import SF_DIR


def test_span_hashes_positional_not_distinct(spark):
    # 10 words of the same token → 3 identical 8-gram positions, all kept.
    text = " ".join(["tok"] * (SPAN_N + 2))
    df = spark.createDataFrame([(text,)], "text string").select(
        span_hashes(F.split("text", " ")).alias("s")
    )
    row = df.collect()[0]
    assert len(row["s"]) == 3
    assert len(set(row["s"])) == 1


def test_span_hashes_short_doc_empty(spark):
    text = " ".join(["tok"] * (SPAN_N - 1))
    df = spark.createDataFrame([(text,)], "text string").select(
        span_hashes(F.split("text", " ")).alias("s")
    )
    assert df.collect()[0]["s"] == []


def test_dup_span_fraction_hand_case(spark, tmp_path, monkeypatch):
    # Two docs sharing their full text + one unique doc: the shared
    # pair is 100% duplicated, the unique doc 0%.
    shared = " ".join(f"w{i}" for i in range(SPAN_N + 3))
    unique = " ".join(f"u{i}" for i in range(SPAN_N + 3))
    docs = spark.createDataFrame(
        [(1, shared), (2, shared), (3, unique)], "doc_id long, text string"
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    # docs_corpus_dup_span_fraction loads via catalog.load: point a fake
    # sf_dir at tmp_path (documents.parquet is all it reads).
    out = {
        r["doc_id"]: r
        for r in docs_corpus_dup_span_fraction(spark, str(tmp_path)).collect()
    }
    assert out[1]["dup_fraction"] == 1.0 and out[1]["mostly_duplicated"]
    assert out[2]["dup_fraction"] == 1.0
    assert out[3]["dup_fraction"] == 0.0 and not out[3]["mostly_duplicated"]
    assert out[3]["n_spans"] == 4  # 11 words → 4 positional 8-grams


def test_pq_codes_match_numpy(spark):
    vectors = _load_vectors(spark, SF_DIR)
    seeds = _seed_centroids(vectors, PQ_K)
    d = len(seeds[0][1])
    sub = d // PQ_M
    cmat = np.array([v for _, v in seeds])  # (K, d)
    got = {
        (r["vec_id"], r["subspace"]): (r["code"], r["dist_sq"])
        for r in embeddings_pq_codes(spark, SF_DIR).collect()
    }
    rows = vectors.collect()
    assert len(got) == len(rows) * PQ_M
    for row in rows[:50]:
        v = np.array(row["evec"])
        for m in range(PQ_M):
            sl = slice(m * sub, (m + 1) * sub)
            dists = ((v[sl] - cmat[:, sl]) ** 2).sum(axis=1)
            best = int(np.argmin(dists))  # first index = lowest code on ties
            code, dist = got[(row["vec_id"], m)]
            assert code == seeds[best][0]
            assert abs(dist - round(float(dists[best]), 4)) < 1e-9


def test_salted_agg_equals_plain_groupby(spark):
    salted = {
        r["event_type"]: r
        for r in events_type_value_salted(spark, SF_DIR).collect()
    }
    plain = {
        r["event_type"]: r
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k]["n_events"] == plain[k]["n_events"]
        assert salted[k]["total_value"] == plain[k]["total_value"]
        assert salted[k]["n_users"] == plain[k]["n_users"]


def test_knn_pq_adc_matches_numpy(spark):
    from python_nyc_taxi_data_pipeline_spark.llm.kmeans import knn_pq_adc
    from python_nyc_taxi_data_pipeline_spark.llm.similarity import (
        QUERY_MOD,
        TOP_K,
    )

    vectors = _load_vectors(spark, SF_DIR)
    seeds = _seed_centroids(vectors, PQ_K)
    d = len(seeds[0][1])
    sub = d // PQ_M
    cmat = np.array([v for _, v in seeds])
    cids = [cid for cid, _ in seeds]
    rows = load(spark, SF_DIR, "embeddings").collect()
    vecs = {r["vec_id"]: (np.array([float(x) for x in r["embedding"]]), r["label"]) for r in rows}

    def pq_codes(v):
        out = []
        for m in range(PQ_M):
            sl = slice(m * sub, (m + 1) * sub)
            dists = ((v[sl] - cmat[:, sl]) ** 2).sum(axis=1)
            out.append(cids[int(np.argmin(dists))])
        return out

    codes = {vid: pq_codes(v) for vid, (v, _) in vecs.items()}
    got = {}
    for r in knn_pq_adc(spark, SF_DIR).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_dist"])
        )
    assert got, "no query rows"
    for qid, ranked in got.items():
        qv, qlabel = vecs[qid]
        # numpy oracle: ADC against every same-cell candidate
        cand = []
        for vid, (v, label) in vecs.items():
            if vid == qid or label != qlabel:
                continue
            dist = 0.0
            for m in range(PQ_M):
                sl = slice(m * sub, (m + 1) * sub)
                code = codes[vid][m]
                dist += float(((qv[sl] - cmat[cids.index(code), sl]) ** 2).sum())
            cand.append((round(dist, 6), vid))
        cand.sort()
        expected = [(i + 1, vid, dist) for i, (dist, vid) in enumerate(cand[:TOP_K])]
        assert sorted(ranked) == expected, f"query {qid}"


def test_bm25_hand_case(spark, tmp_path):
    from python_nyc_taxi_data_pipeline_spark.llm.retrieval import (
        BM25_QUERIES,
        docs_bm25_topk,
    )

    # doc 1 repeats the first query's terms; doc 2 mentions one term
    # once; doc 3 has none. Same lengths → pure tf/df effects.
    q0 = BM25_QUERIES[0].split(" ")  # e.g. ["spark", "table", "scan"]
    d1 = " ".join(q0 * 3 + ["filler"] * 3)
    d2 = " ".join([q0[0]] + ["filler"] * (len(q0) * 3 + 2))
    d3 = " ".join(["filler"] * (len(q0) * 3 + 3))
    spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = docs_bm25_topk(spark, str(tmp_path)).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    top = {r["rank"]: r for r in by_q[0]}
    assert top[1]["doc_id"] == 1 and top[1]["n_terms_hit"] == 3
    assert top[2]["doc_id"] == 2 and top[2]["n_terms_hit"] == 1
    assert top[1]["score"] > top[2]["score"] > 0
    assert all(r["doc_id"] != 3 for r in rows)  # no-hit docs never rank
