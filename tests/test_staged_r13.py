"""Tests for llm/staged_r13.py — the round-13 seed slate.

Referees: a pure-Python exact-AUC replay (average-rank Mann–Whitney)
plus separability extremes on constructed corpora, a hashlib replay
of the shard manifest digests plus a single-doc sensitivity probe,
and a pure-Python Bradley–Terry MM-step replay from the raw duels."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from python_nyc_taxi_data_pipeline_spark.catalog import FIXTURE_TABLES
from python_nyc_taxi_data_pipeline_spark.llm.staged_r13 import (
    AUC_POS_LANG,
    MAN_MOD_A,
    MAN_MOD_B,
    MAN_N_SHARDS,
    R13_BATCH,
    STAGED,
)
from tests.conftest import SF_DIR


def _pd(table: str, sf_dir: str = SF_DIR) -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchdf()


def _write_docs_fixture(tmp_path, rows: list[tuple[int, str, str, str]]):
    """documents fixture from (doc_id, text, lang, source) rows."""
    tbl = pa.Table.from_pydict(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _ttr(text: str) -> int:
    w = text.split(" ")
    return len(set(w)) * 1_000_000 // len(w)


# --------------------------------------------------------------------
# Fleet-wide gates
# --------------------------------------------------------------------


def test_r13_batch_matches_staged():
    assert sorted(R13_BATCH) == sorted(STAGED)
    assert len(R13_BATCH) == 10


def test_staged_plans_carry_no_antipatterns(spark):
    from tests.test_plans import (
        _benign_single_partition,
        _single_partition_exchange_ids,
        plan_of,
    )

    flagged = {}
    for name, q in STAGED.items():
        p = plan_of(q.fn(spark, SF_DIR))
        bad = []
        if "CartesianProduct" in p:
            bad.append("cartesian")
        if "BatchEvalPython" in p:
            bad.append("row-udf")
        sp = [
            i
            for i in _single_partition_exchange_ids(p)
            if not _benign_single_partition(p, i)
        ]
        if sp:
            bad.append(f"single-partition {sp}")
        if bad:
            flagged[name] = bad
    assert flagged == {}


def test_staged_oracle_parity_sf0001(spark):
    from tools.oracle_check import compare

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name, q in STAGED.items():
        sdf = q.fn(spark, SF_DIR).toPandas()
        ddf = con.execute(q.oracle).fetchdf()
        problems = compare(name, sdf, ddf)
        assert not problems, f"{name}: {problems}"
        assert len(sdf) > 0, f"{name}: degenerate empty result"
    con.close()


# --------------------------------------------------------------------
# AUC — exact average-rank replay + separability extremes
# --------------------------------------------------------------------


def _auc_micro(scores_pos: list[int], scores_neg: list[int]) -> int:
    """Exact Mann–Whitney AUC in micro units, average ranks for ties."""
    if not scores_pos or not scores_neg:
        pass  # the guarded DIV handles it; mirror below
    all_s = sorted(scores_pos + scores_neg)
    # doubled average rank per value (1-based)
    first = {}
    cnt = {}
    for i, s in enumerate(all_s):
        first.setdefault(s, i + 1)
        cnt[s] = cnt.get(s, 0) + 1
    r2 = sum(2 * first[s] + cnt[s] - 1 for s in scores_pos)
    n1, n0 = len(scores_pos), len(scores_neg)
    return (r2 - n1 * (n1 + 1)) * 1_000_000 // (2 * max(n1, 1) * max(n0, 1))


def test_auc_rank_python_replay(spark):
    got = (
        STAGED["docs_quality_auc_rank"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = _pd("documents")
    docs["score"] = docs["text"].map(_ttr)
    docs["y"] = (docs["lang"] == AUC_POS_LANG).astype(int)
    for src, grp in docs.groupby("source"):
        pos = grp.loc[grp["y"] == 1, "score"].tolist()
        neg = grp.loc[grp["y"] == 0, "score"].tolist()
        row = got.loc[src]
        assert row["n_pos"] == len(pos)
        assert row["n_neg"] == len(neg)
        assert row["auc_micro"] == _auc_micro(pos, neg), src
    assert (got["auc_micro"] >= 0).all()
    assert (got["auc_micro"] <= 1_000_000).all()


def test_auc_rank_separability_extremes(spark, tmp_path):
    """Perfectly separable corpus → AUC = 1e6; inverted → 0; and a
    pure-tie corpus → exactly 500000 (the ½·P(tie) term)."""
    rows = []
    # source s_hi: en docs all-distinct words (TTR 1e6), others looping
    for i in range(6):
        lang = AUC_POS_LANG if i % 2 == 0 else "fr"
        text = f"a{i} b{i} c{i} d{i}" if lang == AUC_POS_LANG else "x x x x"
        rows.append((i, text, lang, "s_hi"))
    # source s_lo: inverted (en docs loop, fr docs distinct)
    for i in range(6, 12):
        lang = AUC_POS_LANG if i % 2 == 0 else "fr"
        text = "x x x x" if lang == AUC_POS_LANG else f"a{i} b{i} c{i} d{i}"
        rows.append((i, text, lang, "s_lo"))
    # source s_tie: identical score everywhere
    for i in range(12, 18):
        lang = AUC_POS_LANG if i % 2 == 0 else "fr"
        rows.append((i, "t t t t", lang, "s_tie"))
    fx = _write_docs_fixture(tmp_path, rows)
    got = (
        STAGED["docs_quality_auc_rank"]
        .fn(spark, fx)
        .toPandas()
        .set_index("source")["auc_micro"]
    )
    assert got["s_hi"] == 1_000_000
    assert got["s_lo"] == 0
    assert got["s_tie"] == 500_000


# --------------------------------------------------------------------
# Shard manifest — hashlib replay + sensitivity
# --------------------------------------------------------------------


def _doc_h(text: str) -> int:
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)


def test_manifest_hashlib_replay(spark):
    got = (
        STAGED["corpus_shard_manifest_digests"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("shard_id")
        .sort_index()
    )
    docs = _pd("documents")
    docs["h"] = docs["text"].map(_doc_h)
    docs["shard_id"] = docs["doc_id"] % MAN_N_SHARDS
    for sid, grp in docs.groupby("shard_id"):
        row = got.loc[sid]
        assert row["n_docs"] == len(grp)
        assert row["digest_a"] == int((grp["h"] % MAN_MOD_A).sum())
        assert row["digest_b"] == int(
            ((grp["h"] // 1048576) % MAN_MOD_B).sum()
        )
        assert row["min_h"] == int(grp["h"].min())
        assert row["max_h"] == int(grp["h"].max())


def test_manifest_detects_single_doc_change(spark, tmp_path):
    """The versioning property: flipping ONE doc's text changes that
    shard's digest and no other shard's."""
    docs = _pd("documents").sort_values("doc_id")
    rows = list(
        zip(docs["doc_id"], docs["text"], docs["lang"], docs["source"])
    )
    fx_a = tmp_path / "a"
    fx_b = tmp_path / "b"
    fx_a.mkdir()
    fx_b.mkdir()
    _write_docs_fixture(fx_a, rows)
    mutated = [
        (d, (t + " mutated") if d == rows[7][0] else t, lg, s)
        for d, t, lg, s in rows
    ]
    _write_docs_fixture(fx_b, mutated)
    q = STAGED["corpus_shard_manifest_digests"].fn
    a = q(spark, str(fx_a)).toPandas().set_index("shard_id").sort_index()
    b = q(spark, str(fx_b)).toPandas().set_index("shard_id").sort_index()
    changed_shard = rows[7][0] % MAN_N_SHARDS
    diff = (a["digest_a"] != b["digest_a"]) | (a["digest_b"] != b["digest_b"])
    assert diff.to_dict() == {
        sid: sid == changed_shard for sid in a.index
    }
    assert (a["n_docs"] == b["n_docs"]).all()


# --------------------------------------------------------------------
# Bradley–Terry — pure-Python duel + MM-step replay
# --------------------------------------------------------------------


def test_bradley_terry_python_replay(spark):
    got = (
        STAGED["orders_bradley_terry_step"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = _pd("documents").set_index("doc_id")
    docs["score"] = docs["text"].map(_ttr)
    wins: dict[str, int] = {}
    n_ij: dict[tuple[str, str], int] = {}
    for a_id in sorted(docs.index):
        if a_id % 2 != 0 or a_id + 1 not in docs.index:
            continue
        a, b = docs.loc[a_id], docs.loc[a_id + 1]
        if a["source"] == b["source"] or a["score"] == b["score"]:
            continue
        w, l = (a, b) if a["score"] > b["score"] else (b, a)
        wins[w["source"]] = wins.get(w["source"], 0) + 1
        n_ij[(w["source"], l["source"])] = (
            n_ij.get((w["source"], l["source"]), 0) + 1
        )
    # mirror the win-side emission: a source appears iff it has a win
    step = {}
    for src in wins:
        # denominator walks the win-side pair rows only (i = src),
        # with n_ij including the reverse wins when present
        dn = 0
        g_total = 0
        for (i, j), n in n_ij.items():
            if i != src:
                continue
            pair_n = n + n_ij.get((j, i), 0)
            g_total += pair_n
            dn += pair_n * 1_000_000 // 2_000_000
        step[src] = (wins[src], g_total, wins[src] * 1_000_000 // max(dn, 1))
    z = sum(s1 for _, _, s1 in step.values())
    for src, (w, g, s1) in step.items():
        row = got.loc[src]
        assert row["wins"] == w, src
        assert row["games"] == g, src
        assert row["bt_score_micro"] == s1 * 1_000_000 // max(z, 1), src
    assert sorted(got.index) == sorted(step)
    # normalization: scores sum to ~1e6 (integer-DIV losses only)
    assert 0 < got["bt_score_micro"].sum() <= 1_000_000


# --------------------------------------------------------------------
# Cluster stability — laws vs the registered cluster map
# --------------------------------------------------------------------


def test_cluster_stability_monotone_and_consistent(spark):
    got = (
        STAGED["docs_dup_cluster_stability"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("threshold_centi", ignore_index=True)
    )
    # tightening tau can only remove edges and shrink/split clusters
    assert got["n_edges"].is_monotonic_decreasing
    assert got["n_docs_clustered"].is_monotonic_decreasing
    assert got["max_cluster_size"].is_monotonic_decreasing
    # every clustered doc sits in a >=2-doc component
    assert (got["n_docs_clustered"] >= 2 * got["n_clusters"]).all()
    # the permissive rung must reproduce the registered cluster map
    from python_nyc_taxi_data_pipeline_spark.registry import all_queries

    clusters = all_queries()["docs_dup_clusters"].fn(spark, SF_DIR).toPandas()
    sizes = clusters.groupby("cluster_rep").size()
    multi = sizes[sizes >= 2]
    base = got[got["threshold_centi"] == 30].iloc[0]
    assert base["n_clusters"] == len(multi)
    assert base["n_docs_clustered"] == int(multi.sum())
    assert base["max_cluster_size"] == int(multi.max())


# --------------------------------------------------------------------
# Label-centroid shift — numpy replay
# --------------------------------------------------------------------


def test_label_centroid_shift_numpy_replay(spark):
    import numpy as np

    got = (
        STAGED["embeddings_label_centroid_shift"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index(["label_a", "label_b"])
        .sort_index()
    )
    emb = _pd("embeddings")
    sums = {}
    counts = {}
    for lab, grp in emb.groupby("label"):
        q = np.array(
            [
                np.round(np.asarray(v, dtype=np.float64) * 1e6)
                for v in grp["embedding"]
            ],
            dtype=np.int64,
        )
        sums[lab] = q.sum(axis=0)
        counts[lab] = len(grp)
    labels = sorted(sums)
    n_pairs = 0
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            va, vb = sums[a].astype(np.float64), sums[b].astype(np.float64)
            # sequential left fold, matching both engines
            dot = 0.0
            na = 0.0
            nb = 0.0
            for x, y in zip(va, vb):
                dot += x * y
                na += x * x
                nb += y * y
            cos = round(dot / (na**0.5 * nb**0.5), 6)
            want = int(round(cos * 1e6))
            row = got.loc[(a, b)]
            assert row["n_a"] == counts[a]
            assert row["n_b"] == counts[b]
            assert row["centroid_cos_micro"] == want, (a, b)
            n_pairs += 1
    assert len(got) == n_pairs


# --------------------------------------------------------------------
# Matryoshka recall — curve laws
# --------------------------------------------------------------------


def test_matryoshka_recall_curve_laws(spark):
    from python_nyc_taxi_data_pipeline_spark.llm.staged_r13 import (
        MRC_DIMS,
        MRC_K,
        MRC_N_PROBES,
    )

    got = (
        STAGED["embeddings_matryoshka_recall_curve"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("m_dims", ignore_index=True)
    )
    assert list(got["m_dims"]) == list(MRC_DIMS)
    assert (got["n_true"] == MRC_K * MRC_N_PROBES).all()
    assert (got["n_found"] <= got["n_true"]).all()
    assert (got["recall_micro"] <= 1_000_000).all()
    # more dims cannot hurt recall on this fixture's clean geometry;
    # allow equality (plateaus) but never an inversion > one hit
    deltas = got["n_found"].diff().dropna()
    assert (deltas >= -1).all(), list(got["n_found"])


# --------------------------------------------------------------------
# Stream-state sweep — pandas replay + pairing law with late sweep
# --------------------------------------------------------------------


def test_state_size_sweep_replay_and_monotone(spark):
    import numpy as np

    from python_nyc_taxi_data_pipeline_spark.llm.staged_r13 import (
        SSS_DELAYS_S,
    )

    got = (
        STAGED["events_stream_state_size_sweep"]
        .fn(spark, SF_DIR)
        .toPandas()
    )
    ev = _pd("events")
    ev["ts_us"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    for (et, d), row in got.set_index(["event_type", "delay_s"]).iterrows():
        sub = ev[ev["event_type"] == et]
        mx = sub["ts_us"].max()
        want = int((sub["ts_us"] >= mx - d * 1_000_000).sum())
        assert row["n_state_rows"] == want, (et, d)
        assert row["n_events"] == len(sub)
    # state grows with delay; delay=0 retains at least the max row
    for _, grp in got.groupby("event_type"):
        grp = grp.sort_values("delay_s")
        assert list(grp["delay_s"]) == list(SSS_DELAYS_S)
        assert grp["n_state_rows"].is_monotonic_increasing
        assert grp.iloc[0]["n_state_rows"] >= 1


# --------------------------------------------------------------------
# Attribution models — conservation + pandas replay
# --------------------------------------------------------------------


def test_attribution_conservation_and_replay(spark):
    got = (
        STAGED["events_funnel_attribution_models"]
        .fn(spark, SF_DIR)
        .toPandas()
    )
    ev = _pd("events")
    conv = ev[ev["event_type"] == "purchase"]
    # conversions with at least one prior non-purchase touch
    n_credited = 0
    first_credit: dict[str, int] = {}
    for _, p in conv.iterrows():
        touches = ev[
            (ev["user_id"] == p["user_id"])
            & (ev["event_id"] < p["event_id"])
            & (ev["event_type"] != "purchase")
        ]
        if len(touches):
            n_credited += 1
            ch = touches.sort_values("event_id").iloc[0]["event_type"]
            first_credit[ch] = first_credit.get(ch, 0) + 1_000_000
    # per model, total credit is conserved exactly
    for model, grp in got.groupby("model"):
        assert grp["credit_micro"].sum() == n_credited * 1_000_000, model
    # first-touch replay matches channel-by-channel
    ft = (
        got[got["model"] == "first_touch"]
        .set_index("channel")["credit_micro"]
        .to_dict()
    )
    assert {k: v for k, v in ft.items() if v > 0} == first_credit


# --------------------------------------------------------------------
# Budget ladder — consistency with the registered single-point plan
# --------------------------------------------------------------------


def test_budget_ladder_laws(spark):
    from python_nyc_taxi_data_pipeline_spark.llm.staged_r13 import (
        TBL_SHARES_PPM,
    )

    got = (
        STAGED["corpus_token_budget_ladder"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("share_ppm", ignore_index=True)
    )
    assert list(got["share_ppm"]) == list(TBL_SHARES_PPM)
    # the fill invariant: kept == budget exactly at every rung
    assert (got["kept_tokens"] == got["budget_tokens"]).all()
    # a bigger budget keeps more and reaches DOWN the quality axis
    assert got["kept_tokens"].is_monotonic_increasing
    assert got["marginal_bucket"].is_monotonic_decreasing
    # quality of the kept mass can only fall as the budget grows
    assert got["quality_index_micro"].is_monotonic_decreasing
    # the 250k rung must agree with the registered water-fill plan
    from python_nyc_taxi_data_pipeline_spark.llm.staged_r10 import (
        BUDGET_SHARE_MICRO,
        STAGED as S10,
    )

    if BUDGET_SHARE_MICRO in TBL_SHARES_PPM:
        plan = S10["corpus_token_budget_plan"].fn(spark, SF_DIR).toPandas()
        rung = got[got["share_ppm"] == BUDGET_SHARE_MICRO].iloc[0]
        assert rung["kept_tokens"] == plan["take_tokens"].sum()


# --------------------------------------------------------------------
# Dedup ROI — consistency with the composed registered queries
# --------------------------------------------------------------------


def test_dedup_roi_matches_members(spark):
    got = (
        STAGED["docs_dedup_roi_curve"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("method")
    )
    docs = _pd("documents")
    n = len(docs)
    words_before = int(docs["text"].str.split(" ").str.len().sum())
    assert (got["docs_before"] == n).all()
    assert (got["words_before"] == words_before).all()
    # exact: one doc per distinct text
    assert got.loc["exact", "docs_after"] == docs["text"].nunique()
    # ordering law: exact removes the least words, segment-level dedup
    # at least as much as whole-doc near-dup on this fixture's
    # boilerplate-heavy corpus is NOT guaranteed — only bounds are:
    for m in got.index:
        assert 0 <= got.loc[m, "words_after"] <= words_before
        assert got.loc[m, "docs_after"] <= n
    assert (
        got.loc["neardup_cluster", "docs_after"]
        <= got.loc["exact", "docs_after"]
    )
    # segment dedup keeps every doc row
    assert got.loc["segment", "docs_after"] == n
