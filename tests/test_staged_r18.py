"""Tests for llm/staged_r18.py — the round-18 seed (CUPED readout,
naive-forecast eval, session path trigrams)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from python_nyc_taxi_data_pipeline_spark.catalog import FIXTURE_TABLES
from python_nyc_taxi_data_pipeline_spark.llm.staged_r18 import (
    CUPED_BOUNDARY_DAY,
    NFE_LAG_DAYS,
    R18_BATCH,
    SPT_GAP_S,
    STAGED,
)
from tests.conftest import SF_DIR


def _pd(table: str, sf_dir: str = SF_DIR) -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchdf()


def test_r18_batch_matches_staged():
    assert sorted(R18_BATCH) == sorted(STAGED)
    assert len(R18_BATCH) == 3


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
# CUPED — numpy replay + the variance-reduction identity
# --------------------------------------------------------------------


def test_cuped_numpy_replay_and_identity(spark):
    got = (
        STAGED["events_ab_cuped_readout"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("arm")
        .sort_index()
    )
    ev = _pd("events")
    day = (
        pd.to_datetime(ev["ts"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    cents = (ev["value"] * 100).round().astype("int64")
    df = pd.DataFrame({"u": ev["user_id"], "day": day, "cents": cents})
    per_user = {}
    for u, sub in df.groupby("u"):
        pre = int(sub.loc[sub["day"] < CUPED_BOUNDARY_DAY, "cents"].sum())
        post = int(sub.loc[sub["day"] >= CUPED_BOUNDARY_DAY, "cents"].sum())
        per_user[int(u)] = (int(u) % 2, pre, post)
    n = len(per_user)
    sp = sum(p for _, p, _ in per_user.values())
    sq = sum(q for _, _, q in per_user.values())
    spq = sum(p * q for _, p, q in per_user.values())
    spp = sum(p * p for _, p, _ in per_user.values())
    th = round((n * spq - sp * sq) / max(n * spp - sp * sp, 1), 6)
    grand_pre = sp * 1_000_000 // n
    for arm in (0, 1):
        members = [(p, q) for a, p, q in per_user.values() if a == arm]
        n_a = len(members)
        mean_pre = sum(p for p, _ in members) * 1_000_000 // n_a
        mean_post = sum(q for _, q in members) * 1_000_000 // n_a
        row = got.loc[arm]
        assert row["n_users"] == n_a
        assert row["mean_pre_micro"] == mean_pre
        assert row["mean_post_micro"] == mean_post
        assert row["theta_micro"] == int(round(th * 1_000_000))
        assert row["adjusted_mean_micro"] == int(
            round(mean_post - th * (mean_pre - float(grand_pre)))
        )
    # CUPED identity: the adjustment is mean-preserving in aggregate —
    # the user-weighted adjusted means recombine to (close to) the
    # grand post mean (exact up to the integer-mean rounding grain).
    tot = sum(
        got.loc[a, "adjusted_mean_micro"] * got.loc[a, "n_users"]
        for a in (0, 1)
    )
    grand_post = sq * 1_000_000 // n
    assert abs(tot / n - grand_post) < 2_000_000  # within 2 cents


# --------------------------------------------------------------------
# Forecast eval — numpy replay + scale-free laws
# --------------------------------------------------------------------


def test_forecast_eval_numpy_replay(spark):
    got = (
        STAGED["orders_naive_forecast_eval"]
        .fn(spark, SF_DIR)
        .toPandas()
    )
    got["month"] = pd.to_datetime(got["month"])
    got = got.set_index("month").sort_index()
    orders = _pd("orders")
    day = (
        pd.to_datetime(orders["o_orderdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    lo, hi = int(day.min()), int(day.max())
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    for d, n in day.value_counts().items():
        c[int(d) - lo] = n
    rows = {}
    for idx in range(NFE_LAG_DAYS, len(c)):
        d = lo + idx
        actual, fc = int(c[idx]), int(c[idx - NFE_LAG_DAYS])
        month = (
            pd.Timestamp("1970-01-01") + pd.Timedelta(days=d)
        ).to_period("M").to_timestamp()
        r = rows.setdefault(month, [0, 0, 0, 0])
        r[0] += 1
        r[1] += abs(actual - fc)
        r[2] += 2_000_000 * abs(actual - fc) // max(actual + fc, 1)
        r[3] += actual - fc
    assert got.index.tolist() == sorted(rows)
    for month, (n_days, ae, smape, bias) in rows.items():
        row = got.loc[month]
        assert row["n_days"] == n_days
        assert row["mae_micro"] == ae * 1_000_000 // n_days
        assert row["smape_micro"] == smape // n_days
        assert row["bias_days"] == bias
    # laws: sMAPE is bounded by 2e6; MAE >= |bias|/n scaled
    assert (got["smape_micro"] <= 2_000_000).all()
    assert (
        got["mae_micro"] * got["n_days"]
        >= (got["bias_days"].abs() * 1_000_000)
    ).all()


# --------------------------------------------------------------------
# Path trigrams — python replay + conservation
# --------------------------------------------------------------------


def test_path_trigrams_python_replay(spark):
    got = (
        STAGED["events_session_path_trigrams"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("trigram")
        .sort_index()
    )
    ev = _pd("events")
    ts_us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ev = ev.assign(ts_us=ts_us)
    occ: dict[str, int] = {}
    users: dict[str, set] = {}
    n_expected_total = 0
    for uid, sub in ev.groupby("user_id"):
        path: list[str] = []
        prev = None
        paths = []
        for r in sub.sort_values(["ts_us", "event_id"]).itertuples():
            if prev is not None and r.ts_us - prev > SPT_GAP_S * 1_000_000:
                paths.append(path)
                path = []
            path.append(r.event_type)
            prev = r.ts_us
        paths.append(path)
        for p in paths:
            n_expected_total += max(len(p) - 2, 0)
            for i in range(len(p) - 2):
                key = f"{p[i]}>{p[i + 1]}>{p[i + 2]}"
                occ[key] = occ.get(key, 0) + 1
                users.setdefault(key, set()).add(int(uid))
    assert got.index.tolist() == sorted(occ)
    for key, n in occ.items():
        assert got.loc[key, "n_occurrences"] == n
        assert got.loc[key, "n_users"] == len(users[key])
    # conservation: total trigram occurrences == sum over sessions
    assert int(got["n_occurrences"].sum()) == n_expected_total
