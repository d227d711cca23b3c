"""Tests for llm/staged_r12.py — the round-12 registration candidates.

Same structure as the r8–r11 batteries: fleet plan sweep, oracle
parity at sf0.001, and independent referees: pure-pandas/numpy
replays of the KS statistic, the watermark-sweep late counts, the
compaction bin-packing, the 8-step Markov trajectory, the VAD
energy/island geometry and the patchify grid, plus law batteries
(monotonicity, conservation, range) for the retrieval-eval and
graph-probe queries whose values the DuckDB twin already pins
cross-engine."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from python_nyc_taxi_data_pipeline_spark.catalog import FIXTURE_TABLES
from python_nyc_taxi_data_pipeline_spark.llm.staged_r12 import (
    CMP_FILE_MOD,
    CMP_TARGET_ROWS,
    DEL_MOD,
    DPC_CHUNK_W,
    DPC_STRIDE,
    MKNN_BLOCK,
    MKNN_KS,
    MKV_STEPS,
    NDCG_DISC_MICRO,
    NDCG_IDCG_MICRO,
    NDCG_K,
    PAT_IMG,
    PAT_N_DOCS,
    PAT_P,
    R12_BATCH,
    STAGED,
    VAD_N_DOCS,
    VAD_THRESH,
    VAD_WIN,
    WM_DELAYS_S,
)
from tests.conftest import SF_DIR


def _pd(table: str, sf_dir: str = SF_DIR) -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchdf()


# --------------------------------------------------------------------
# Fleet-wide gates
# --------------------------------------------------------------------


def test_r12_batch_matches_staged():
    assert sorted(R12_BATCH) == sorted(STAGED)
    assert len(R12_BATCH) == 10


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
# KS drift — exact integer replay for one pair + laws
# --------------------------------------------------------------------


def test_ks_drift_pandas_replay(spark):
    got = STAGED["docs_length_ks_drift"].fn(spark, SF_DIR).toPandas()
    docs = _pd("documents")
    srcs = sorted(docs["source"].unique())
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    grid = np.sort(docs["n_chars"].unique())
    for _, row in got.head(5).iterrows():
        a = docs.loc[docs["source"] == row["source_a"], "n_chars"].values
        b = docs.loc[docs["source"] == row["source_b"], "n_chars"].values
        cum_a = np.searchsorted(np.sort(a), grid, side="right")
        cum_b = np.searchsorted(np.sort(b), grid, side="right")
        num = np.abs(
            cum_a.astype(object) * len(b) - cum_b.astype(object) * len(a)
        ).max()
        want = int(num) * 1_000_000 // (len(a) * len(b))
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert row["ks_micro"] == want, (row["source_a"], row["source_b"])
    assert (got["ks_micro"] >= 0).all()
    assert (got["ks_micro"] <= 1_000_000).all()


# --------------------------------------------------------------------
# Watermark sweep — monotone law + exact replay for one source
# --------------------------------------------------------------------


def test_watermark_sweep_monotone_and_replay(spark):
    got = (
        STAGED["events_late_arrival_watermark_sweep"]
        .fn(spark, SF_DIR)
        .toPandas()
    )
    # late counts can only fall as the delay grows
    for _, g in got.groupby("event_type"):
        g = g.sort_values("delay_s")
        assert g["n_late"].is_monotonic_decreasing
        assert g["n_events"].nunique() == 1
    # exact replay: first event_type, all delays
    ev = _pd("events")
    et = sorted(ev["event_type"].unique())[0]
    sub = ev[ev["event_type"] == et].sort_values("event_id")
    # duckdb returns datetime64[us]; go through ns explicitly so the
    # unit is pinned regardless of the source resolution
    ts_us = sub["ts"].astype("datetime64[ns]").astype("int64").values // 1000
    run_max = np.maximum.accumulate(ts_us)
    prev_max = np.concatenate(([np.iinfo(np.int64).min], run_max[:-1]))
    for d in WM_DELAYS_S:
        n_late = int(
            (
                (ts_us < prev_max - d * 1_000_000)
                & (prev_max != np.iinfo(np.int64).min)
            ).sum()
        )
        row = got[(got["event_type"] == et) & (got["delay_s"] == d)]
        assert int(row["n_late"].iloc[0]) == n_late, (et, d)


# --------------------------------------------------------------------
# Compaction plan — full pandas replay + conservation laws
# --------------------------------------------------------------------


def test_compaction_plan_replay_and_conservation(spark):
    got = (
        STAGED["lineitem_compaction_plan"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values(["ship_month", "bin_id"], ignore_index=True)
    )
    li = _pd("lineitem")
    li["ship_month"] = (
        pd.to_datetime(li["l_shipdate"]).dt.to_period("M").dt.to_timestamp()
    )
    files = (
        li.assign(file_id=li["l_orderkey"] % CMP_FILE_MOD)
        .groupby(["ship_month", "file_id"])
        .size()
        .rename("n_rows")
        .reset_index()
        .sort_values(["ship_month", "file_id"])
    )
    files["cum_before"] = files.groupby("ship_month")["n_rows"].cumsum() - (
        files["n_rows"]
    )
    files["bin_id"] = files["cum_before"] // CMP_TARGET_ROWS
    want = (
        files.groupby(["ship_month", "bin_id"])
        .agg(
            n_files=("file_id", "size"),
            bin_rows=("n_rows", "sum"),
            first_file=("file_id", "min"),
            last_file=("file_id", "max"),
        )
        .reset_index()
        .sort_values(["ship_month", "bin_id"], ignore_index=True)
    )
    got["ship_month"] = pd.to_datetime(got["ship_month"])
    want["ship_month"] = pd.to_datetime(want["ship_month"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # conservation: every lineitem row lands in exactly one bin
    assert got["bin_rows"].sum() == len(li)


# --------------------------------------------------------------------
# Markov stationary — exact integer trajectory replay
# --------------------------------------------------------------------


def test_markov_stationary_integer_replay(spark):
    got = (
        STAGED["events_markov_stationary"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = _pd("events").sort_values(["user_id", "ts", "event_id"])
    ev["nxt"] = ev.groupby("user_id")["event_type"].shift(-1)
    trans = (
        ev.dropna(subset=["nxt"])
        .groupby(["event_type", "nxt"])
        .size()
        .rename("c")
        .reset_index()
    )
    tot = trans.groupby("event_type")["c"].sum()
    p = {
        (r["event_type"], r["nxt"]): int(r["c"]) * 1_000_000
        // int(tot[r["event_type"]])
        for _, r in trans.iterrows()
    }
    states = sorted(tot.index)
    v = {s: 1_000_000 // len(states) for s in states}
    prev = None
    for _ in range(MKV_STEPS):
        prev = v
        nxt = {s: 0 for s in states}
        for (src, dst), pm in p.items():
            if dst in nxt:
                nxt[dst] += v[src] * pm // 1_000_000
        v = nxt
    for s in states:
        assert int(got.loc[s, "prob_micro"]) == v[s], s
        assert int(got.loc[s, "delta_micro"]) == abs(v[s] - prev[s]), s
    # substochastic + integer-DIV losses: mass never exceeds 1
    assert got["prob_micro"].sum() <= 1_000_000


# --------------------------------------------------------------------
# VAD — pure-numpy energy/island replay
# --------------------------------------------------------------------


def test_vad_segments_numpy_replay(spark):
    got = (
        STAGED["docs_audio_vad_segments"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    doc_ids = sorted(d for d in _pd("documents")["doc_id"] if d < VAD_N_DOCS)
    assert sorted(got.index) == doc_ids
    for did in doc_ids:
        length = 64 + (did % 7) * 16
        clip = (did * 13 + np.arange(length, dtype=np.int64) * 7) % 256
        nw = length // VAD_WIN
        energy = ((clip[: nw * VAD_WIN].reshape(nw, VAD_WIN) - 128) ** 2).sum(
            axis=1
        )
        voiced = energy > VAD_THRESH
        runs = []
        run = 0
        for flag in voiced:
            if flag:
                run += 1
            elif run:
                runs.append(run)
                run = 0
        if run:
            runs.append(run)
        row = got.loc[did]
        assert row["n_windows"] == nw
        assert row["n_voiced"] == int(voiced.sum())
        assert row["n_segments"] == len(runs)
        assert row["longest_voiced_run"] == (max(runs) if runs else 0)
        assert (
            row["voiced_share_micro"]
            == int(voiced.sum()) * 1_000_000 // nw
        )


# --------------------------------------------------------------------
# Patchify — numpy grid replay + conservation
# --------------------------------------------------------------------


def test_patchify_numpy_replay(spark):
    got = (
        STAGED["docs_patchify_contract"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values(["doc_id", "patch_id"], ignore_index=True)
    )
    g = PAT_IMG // PAT_P
    doc_ids = sorted(d for d in _pd("documents")["doc_id"] if d < PAT_N_DOCS)
    assert len(got) == len(doc_ids) * g * g
    xs = np.arange(PAT_IMG, dtype=np.int64)
    for did in doc_ids[:20]:
        grid = (did * 131 + xs[None, :] * 7 + xs[:, None] * 13) % 256
        sums = grid.reshape(g, PAT_P, g, PAT_P).sum(axis=(1, 3))
        sub = got[got["doc_id"] == did]
        # conservation: patch sums tile the image exactly
        assert sub["pix_sum"].sum() == grid.sum()
        for _, r in sub.iterrows():
            pr, pc = int(r["patch_row"]), int(r["patch_col"])
            assert r["patch_id"] == pr * g + pc
            assert r["pix_sum"] == int(sums[pr, pc])
            assert r["mean_floor"] == int(sums[pr, pc]) // (PAT_P * PAT_P)
            assert r["first_pix"] == int(grid[pr * PAT_P, pc * PAT_P])


# --------------------------------------------------------------------
# Deletion propagation — tombstone accounting + orphan invariant
# --------------------------------------------------------------------


def test_deletion_propagation_accounting(spark):
    got = (
        STAGED["docs_deletion_propagation_contract"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = _pd("documents")
    docs["nw"] = docs["text"].str.split(" ").str.len()
    docs["n_chunks"] = np.where(
        docs["nw"] >= DPC_CHUNK_W,
        1 + (docs["nw"] - DPC_CHUNK_W) // DPC_STRIDE,
        0,
    )
    docs["del"] = (docs["doc_id"] % DEL_MOD == 0).astype(int)
    for src, grp in docs.groupby("source"):
        row = got.loc[src]
        assert row["n_docs_before"] == len(grp)
        assert row["n_docs_after"] == int((1 - grp["del"]).sum())
        assert row["n_chunks_before"] == int(grp["n_chunks"].sum())
        assert row["n_chunks_after"] == int(
            grp.loc[grp["del"] == 0, "n_chunks"].sum()
        )
    # the invariant the contract exists for
    assert (got["n_orphan_chunks"] == 0).all()


# --------------------------------------------------------------------
# nDCG — law battery (values pinned cross-engine by the oracle twin)
# --------------------------------------------------------------------


def test_ndcg_laws(spark):
    got = STAGED["retrieval_ndcg_eval"].fn(spark, SF_DIR).toPandas()
    assert len(got) == 10  # the bounded probe block
    assert (got["ndcg_micro"] >= 0).all()
    assert (got["ndcg_micro"] <= 1_000_000).all()
    assert (got["dcg_micro"] <= NDCG_IDCG_MICRO).all()
    assert (got["n_hits"] <= NDCG_K).all()
    assert ((got["dcg_micro"] == 0) == (got["n_hits"] == 0)).all()
    # the discount table is strictly decreasing and anchored at 1.0
    assert NDCG_DISC_MICRO[0] == 1_000_000
    assert all(
        a > b for a, b in zip(NDCG_DISC_MICRO, NDCG_DISC_MICRO[1:])
    )


# --------------------------------------------------------------------
# Novelty curve — conservation + frontier laws
# --------------------------------------------------------------------


def test_novelty_curve_conservation(spark):
    got = (
        STAGED["corpus_source_novelty_curve"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("source_rank", ignore_index=True)
    )
    total_tris = duckdb.sql(
        f"""
        WITH ws AS (
          SELECT string_split(text, ' ') AS w
          FROM read_parquet('{SF_DIR}/documents.parquet')
          WHERE len(string_split(text, ' ')) >= 3
        )
        SELECT count(DISTINCT tri) FROM (
          SELECT unnest(list_transform(
            generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tri
          FROM ws)
        """
    ).fetchone()[0]
    # ranks are a bijection onto 1..n
    assert list(got["source_rank"]) == list(range(1, len(got) + 1))
    # rank-1's marginal novelty is its whole trigram vocabulary
    assert got.iloc[0]["n_novel"] == got.iloc[0]["n_tris"]
    # conservation: the curve ends at the corpus distinct-trigram count
    assert got.iloc[-1]["cum_distinct"] == total_tris
    assert got["n_novel"].sum() == total_tris
    # cum is the running sum of marginals and never exceeds sum(n_tris)
    assert (got["cum_distinct"] == got["n_novel"].cumsum()).all()
    assert (got["n_novel"] <= got["n_tris"]).all()
    # the ordering key is mean length desc (ties by name asc)
    key = list(
        zip(-got["mean_chars_micro"].astype(int), got["source"])
    )
    assert key == sorted(key)


# --------------------------------------------------------------------
# Mutual kNN — degree/symmetry laws
# --------------------------------------------------------------------


def test_mutual_knn_laws(spark):
    got = (
        STAGED["embeddings_mutual_knn_fraction"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    assert list(got["k"]) == list(MKNN_KS)
    # every block node emits exactly k directed edges
    n_nodes = min(
        MKNN_BLOCK,
        duckdb.sql(
            f"""
            SELECT count(*) FROM (
              SELECT vec_id
              FROM read_parquet('{SF_DIR}/embeddings.parquet')
              WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) >= 'a0'
              ORDER BY vec_id LIMIT {MKNN_BLOCK})
            """
        ).fetchone()[0],
    )
    assert (got["n_edges"] == n_nodes * got["k"]).all()
    # mutual edges come in pairs
    assert (got["n_mutual"] % 2 == 0).all()
    assert (got["n_mutual"] <= got["n_edges"]).all()
    assert (got["mutual_share_micro"] <= 1_000_000).all()
    # mutual COUNT can only grow with k (edge sets are nested)
    assert got["n_mutual"].is_monotonic_increasing
