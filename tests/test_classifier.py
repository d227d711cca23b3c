"""Independent pure-Python references for llm/classifier.py — the
cross-check angle the DuckDB oracles can't provide (both engines could
share a bug; a from-scratch Python replay can't share it with either).

Rounding parity note: Spark's ROUND(double, n) goes through
BigDecimal.valueOf (Double.toString's shortest-roundtrip decimal) with
HALF_UP; Python's built-in round() is banker's. The references use
Decimal(repr(x)) + ROUND_HALF_UP, which reproduces the JVM behavior.
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from python_nyc_taxi_data_pipeline_spark.llm.classifier import (
    NB_TOP_V,
    PROBE_EVAL_MAX,
    PROBE_K,
    docs_nb_lang_classifier,
    embeddings_knn_label_probe,
)

SF_DIR = "/root/testdata/sf0.001"


def _round_half_up(x: float, digits: int = 0) -> float:
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _micro(num: int, den: int) -> int:
    return int(_round_half_up(-math.log(num / den) * 1e6))


def test_nb_classifier_matches_python_reference(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    toks = [(d["doc_id"], d["lang"], d["text"].split(" ")) for d in docs]

    # model build, replayed from scratch
    global_cnt = Counter(t for _, _, ts in toks for t in ts)
    vocab = set(
        t for t, _ in sorted(global_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :NB_TOP_V
        ]
    )
    class_tok: dict[tuple[str, str], int] = Counter()
    t_c: Counter = Counter()
    n_docs: Counter = Counter()
    for _, lang, ts in toks:
        n_docs[lang] += 1
        for t in ts:
            t_c[lang] += 1
            if t in vocab:
                class_tok[(lang, t)] += 1
    nd_total = sum(n_docs.values())
    denom = {c: t_c[c] + NB_TOP_V + 1 for c in n_docs}
    oov_c = {
        c: t_c[c] - sum(n for (cc, _), n in class_tok.items() if cc == c)
        for c in n_docs
    }
    s = {
        (c, t): _micro(class_tok.get((c, t), 0) + 1, denom[c])
        for c in n_docs
        for t in vocab
    }
    oov_micro = {c: _micro(oov_c[c] + 1, denom[c]) for c in n_docs}
    prior = {c: _micro(n_docs[c], nd_total) for c in n_docs}

    expected = {}
    for doc_id, lang, ts in toks:
        cnt = Counter(ts)
        costs = {}
        for c in n_docs:
            cost = prior[c]
            for t, k in cnt.items():
                cost += k * (s[(c, t)] if t in vocab else oov_micro[c])
            costs[c] = cost
        pred = min(costs, key=lambda c: (costs[c], c))
        expected[doc_id] = (lang, pred, costs[pred], pred == lang)

    got = {
        r.doc_id: (r.lang, r.pred_lang, r.cost_micro, r.correct)
        for r in docs_nb_lang_classifier(spark, SF_DIR).collect()
    }
    assert got == expected


def test_knn_label_probe_matches_python_reference(spark):
    vecs = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    pts = [
        (v["vec_id"], v["label"], [float(x) for x in v["embedding"]])
        for v in vecs
    ]
    nrm = {i: math.sqrt(sum(x * x for x in v)) for i, _, v in pts}

    expected = {}
    for qid, qlabel, qv in pts:
        if qid >= PROBE_EVAL_MAX:
            continue
        sims = []
        for cid, clabel, cv in pts:
            if cid == qid:
                continue
            cos = _round_half_up(
                sum(a * b for a, b in zip(qv, cv)) / (nrm[qid] * nrm[cid]), 6
            )
            sims.append((-cos, cid, clabel))
        sims.sort()
        top = [lbl for _, _, lbl in sims[:PROBE_K]]
        votes = Counter(top)
        pred = min(votes, key=lambda l: (-votes[l], l))
        expected[qid] = (qlabel, pred, votes[pred], pred == qlabel)

    got = {
        r.vec_id: (r.label, r.pred_label, r.votes, r.correct)
        for r in embeddings_knn_label_probe(spark, SF_DIR).collect()
    }
    assert got == expected
