"""Tests for llm/staged_r15.py — the round-15 seed (Fano burstiness)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from python_nyc_taxi_data_pipeline_spark.catalog import FIXTURE_TABLES
from python_nyc_taxi_data_pipeline_spark.llm.staged_r15 import (
    R15_BATCH,
    STAGED,
)
from tests.conftest import SF_DIR


def _pd(table: str, sf_dir: str = SF_DIR) -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchdf()


def test_r15_batch_matches_staged():
    assert sorted(R15_BATCH) == sorted(STAGED)
    assert len(R15_BATCH) == 3


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


def test_fano_numpy_replay_with_zero_hours(spark):
    got = (
        STAGED["events_burstiness_fano"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = _pd("events")
    hour = (
        ev["ts"].astype("datetime64[ns]").astype("int64")
        // (3_600 * 10**9)
    )
    h0, h1 = int(hour.min()), int(hour.max())
    n = h1 - h0 + 1
    for et, grp in hour.groupby(ev["event_type"]):
        x = np.zeros(n, dtype=np.int64)
        for h, c in grp.value_counts().items():
            x[int(h) - h0] = c
        s1, s2 = int(x.sum()), int((x * x).sum())
        row = got.loc[et]
        assert row["n_hours"] == n
        assert row["n_events"] == s1
        assert row["mean_micro"] == s1 * 1_000_000 // n
        assert (
            row["fano_micro"]
            == (n * s2 - s1 * s1) * 1_000_000 // (n * max(s1, 1))
        ), et
        # the zero-hour pitfall: recomputing WITHOUT empty hours must
        # give a different (deflated-variance) answer on this fixture
        xz = x[x > 0]
        nz, s1z, s2z = len(xz), int(xz.sum()), int((xz * xz).sum())
        if nz < n:
            assert (
                (nz * s2z - s1z * s1z) * 1_000_000 // (nz * max(s1z, 1))
                != row["fano_micro"]
            )
    # every type's Fano is non-negative (population variance >= 0)
    assert (got["fano_micro"] >= 0).all()


def test_hhi_replay_and_bounds(spark):
    got = (
        STAGED["part_type_brand_hhi"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("p_type")
        .sort_index()
    )
    import decimal

    li = _pd("lineitem")
    part = _pd("part").set_index("p_partkey")
    li["p_type"] = li["l_partkey"].map(part["p_type"])
    li["p_brand"] = li["l_partkey"].map(part["p_brand"])
    li["rev"] = [
        (
            decimal.Decimal(str(p)) * (1 - decimal.Decimal(str(d)))
        ).quantize(decimal.Decimal("0.0001"))
        for p, d in zip(li["l_extendedprice"], li["l_discount"])
    ]
    for ptype, grp in li.groupby("p_type"):
        w = grp.groupby("p_brand")["rev"].sum().map(
            lambda x: int(x * 10000)
        )
        t = int(w.sum())
        shares = [
            (int(we) // 10000) * 1_000_000 // max(t // 10000, 1)
            for we in w
        ]
        row = got.loc[ptype]
        assert row["n_brands"] == len(w)
        assert row["revenue_e4"] == t
        assert row["top_share_micro"] == max(shares)
        assert row["hhi_micro"] == sum(s * s for s in shares) // 1_000_000
        # bounds: 1e6/n <= HHI <= 1e6 (up to integer-DIV loss)
        assert row["hhi_micro"] <= 1_000_000
        assert row["hhi_micro"] >= 1_000_000 // len(w) - len(w)
        assert row["top_share_micro"] <= 1_000_000


def test_backlog_timeseries_replay_and_conservation(spark):
    got = (
        STAGED["orders_backlog_timeseries"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("month_start", ignore_index=True)
    )
    orders = _pd("orders").set_index("o_orderkey")
    li = _pd("lineitem")
    last_ship = li.groupby("l_orderkey")["l_shipdate"].max()
    spans = pd.DataFrame(
        {
            "open": pd.to_datetime(
                orders.loc[last_ship.index, "o_orderdate"]
            ).dt.normalize(),
            "close": pd.to_datetime(last_ship).dt.normalize()
            + pd.Timedelta(days=1),
        }
    )
    d0, d1 = spans["open"].min(), spans["close"].max()
    days = pd.date_range(d0, d1, freq="D")
    delta = np.zeros(len(days), dtype=np.int64)
    opened = np.zeros(len(days), dtype=np.int64)
    closed = np.zeros(len(days), dtype=np.int64)
    for _, r in spans.iterrows():
        delta[(r["open"] - d0).days] += 1
        opened[(r["open"] - d0).days] += 1
        delta[(r["close"] - d0).days] -= 1
        closed[(r["close"] - d0).days] += 1
    backlog = delta.cumsum()
    frame = pd.DataFrame(
        {
            "month": days.to_period("M").to_timestamp(),
            "opened": opened,
            "closed": closed,
            "backlog": backlog,
        }
    )
    want = (
        frame.groupby("month")
        .agg(
            opened=("opened", "sum"),
            closed=("closed", "sum"),
            peak_backlog=("backlog", "max"),
            end_backlog=("backlog", "last"),
        )
        .reset_index()
    )
    got["month_start"] = pd.to_datetime(got["month_start"])
    merged = got.merge(
        want, left_on="month_start", right_on="month", suffixes=("", "_w")
    )
    assert len(merged) == len(got) == len(want)
    for col in ("opened", "closed", "peak_backlog", "end_backlog"):
        assert (merged[col] == merged[f"{col}_w"]).all(), col
    # conservation: every span opens once and closes once, and the
    # backlog returns to zero at the end of the spine
    assert got["opened"].sum() == len(spans)
    assert got["closed"].sum() == len(spans)
    assert int(got.iloc[-1]["end_backlog"]) == 0
