"""Adversarial cross-engine convention probes (r9 VERDICT directive
#7): the two divergence classes that have each bitten once —
double→int CAST/percentile rounding (DuckDB half-even vs Spark
truncate; caught live at a real 307.5 percentile in the r16 build)
and empty-token / tie-break conventions (the two r8 ADVICE items) —
probed on PURPOSE-BUILT fixtures that force the boundary cases the
sf fixtures may never hit: exact x.5 percentile boundaries, negative
values through floor/percentile, and dirty whitespace (leading /
trailing / doubled spaces, an all-spaces document) through token
counting. Each probe runs the staged ENGINE query and its DuckDB
ORACLE on the same adversarial parquet and requires exact agreement
via the driver-gate comparator (tools/oracle_check.compare).

Sweep ledger (which sites were checked and why they're safe) lives in
COVERAGE.md §"r10 convention sweep".
"""

from __future__ import annotations

import duckdb
import pandas as pd

from python_nyc_taxi_data_pipeline_spark.llm.staged_r16 import STAGED as S16
from tools.oracle_check import compare


def _run_pair(spark, fixture, staged_query, tables):
    sdf = staged_query.fn(spark, str(fixture)).toPandas()
    con = duckdb.connect()
    for t in tables:
        # Spark writes <table>.parquet as a directory of part files
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{fixture}/{t}.parquet/*.parquet')"
        )
    ddf = con.execute(staged_query.oracle).fetchdf()
    con.close()
    problems = compare(staged_query.name, sdf, ddf)
    assert not problems, f"{staged_query.name}: {problems}"
    assert len(sdf) > 0
    return sdf


def test_percentile_floor_on_exact_half_boundaries(spark, tmp_path):
    """Inter-order gaps engineered so p50 and p75 land on x.5 / x.75
    fractions — the exact boundary where DuckDB CAST's half-even and
    Spark CAST's truncation diverge unless both floor() first (the
    r16 gap-percentile rule)."""
    fixture = tmp_path / "halfbound"
    fixture.mkdir()
    # segment S1: one customer, order days 0,1,3 -> gaps [1,2]:
    #   p50 = 1.5, p75 = 1.75 (both fractional).
    # segment S2: two customers with gaps [3] and [4,10]:
    #   pooled gaps [3,4,10] -> p50 = 4.0, p75 = 7.0 exact.
    orders = [
        (1, 101, 0), (2, 101, 1), (3, 101, 3),
        (4, 102, 5), (5, 102, 8),
        (6, 103, 0), (7, 103, 4), (8, 103, 14),
    ]
    spark.createDataFrame(
        [
            (ok, ck, "O", 10.0, f"1970-01-{1 + d:02d} 00:00:00", "1-URGENT")
            for ok, ck, d in orders
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP_NTZ) AS o_orderdate",
        "o_orderpriority",
    ).write.parquet(str(fixture / "orders.parquet"))
    spark.createDataFrame(
        [
            (101, "a", 0, 0.0, "S1"),
            (102, "b", 0, 0.0, "S2"),
            (103, "c", 0, 0.0, "S2"),
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(fixture / "customer.parquet"))
    got = _run_pair(
        spark,
        fixture,
        S16["customer_order_gap_percentiles"],
        ["orders", "customer"],
    ).set_index("segment")
    assert got.loc["S1", "p50_gap_days"] == 1  # floor(1.5)
    assert got.loc["S1", "p75_gap_days"] == 1  # floor(1.75)
    assert got.loc["S2", "p50_gap_days"] == 4
    assert got.loc["S2", "p75_gap_days"] == 7


def test_iqr_trim_on_negative_values_and_half_quantiles(spark, tmp_path):
    """Negative cents through floor(quantile) and the trimmed-mean
    integer division — floor(-2.5) must be -3 on BOTH engines, and
    Spark DIV / DuckDB // must agree on a negative numerator (both
    truncate toward zero for integer operands — verified, not
    assumed)."""
    fixture = tmp_path / "negs"
    fixture.mkdir()
    # type N cents [-350, -250, -100, -11, 0]: p25 = -250, p75 = -11
    #   exact; trimmed set [-250, -100, -11] -> sum -361 over 3 — a
    #   NEGATIVE non-divisible integer division (truncates to
    #   -120333333 on both engines, floor would give ...334).
    # type G cents [-5, -2]: p25 = -4.25, p75 = -2.75 — negative
    #   FRACTIONAL percentiles through floor().
    # type Q cents [10, 15, 26]: p25 = 12.5, p75 = 20.5 fractional
    #   (floored to [12, 20], keeping {15} in the trim).
    rows = []
    for i, v in enumerate([-3.50, -2.50, -1.00, -0.11, 0.00]):
        rows.append((i, "1970-01-01 00:00:00", 1, "N", v, "{}"))
    for i, v in enumerate([-0.05, -0.02]):
        rows.append((10 + i, "1970-01-01 00:00:00", 1, "G", v, "{}"))
    for i, v in enumerate([0.10, 0.15, 0.26]):
        rows.append((20 + i, "1970-01-01 00:00:00", 1, "Q", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.parquet(str(fixture / "events.parquet"))
    got = _run_pair(
        spark, fixture, S16["events_value_iqr_trimmed_stats"], ["events"]
    ).set_index("event_type")
    assert got.loc["N", "p25_cents"] == -250
    assert got.loc["N", "n_trim"] == 3
    # -361_000_000 div 3: both engines truncate toward zero
    assert got.loc["N", "trimmed_mean_cents_micro"] == -120_333_333
    assert got.loc["G", "p25_cents"] == -5  # floor(-4.25)
    assert got.loc["G", "p75_cents"] == -3  # floor(-2.75)
    assert got.loc["Q", "p25_cents"] == 12  # floor(12.5)
    assert got.loc["Q", "p75_cents"] == 20  # floor(20.5)
    assert got.loc["Q", "n_trim"] == 1


def test_token_conventions_on_dirty_whitespace(spark, tmp_path):
    """Dirty whitespace through the slate's token convention
    (single-space split, empty tokens excluded): leading/trailing
    spaces, doubled separators, and an all-spaces document must
    produce identical counts on both engines AND match a hand count.
    Every lang keeps a nonzero token total — a lang whose ENTIRE
    corpus is empty-after-filtering would make the temperature
    ladder's sample_weight a 0/0 (documented precondition in
    COVERAGE.md, enforced upstream by quality filtering)."""
    fixture = tmp_path / "dirty"
    fixture.mkdir()
    docs = [
        (0, "alpha beta  gamma", "en", "web"),   # doubled separator
        (1, " alpha beta", "en", "web"),          # leading space
        (2, "beta gamma ", "en", "web"),          # trailing space
        (3, "   ", "fr", "web"),                  # all-spaces doc
        (4, "delta epsilon zeta", "fr", "web"),
        (5, "", "fr", "web"),                     # empty string
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(fixture / "documents.parquet"))
    got = _run_pair(
        spark, fixture, S16["docs_lang_temperature_ladder"], ["documents"]
    )
    by_lang = (
        got[got["alpha"] == 1.0].set_index("lang")["n_tokens"].to_dict()
    )
    # hand count with the convention: en = 3 + 2 + 2 = 7 (the doubled
    # separator, leading and trailing spaces each yield one excluded
    # empty token); fr = 0 + 3 + 0 = 3 (the all-spaces doc splits to
    # four empty tokens, the empty string to one — all excluded).
    assert by_lang == {"en": 7, "fr": 3}
    got2 = _run_pair(
        spark, fixture, S16["docs_vocab_coverage_ladder"], ["documents"]
    )
    # total mass at the deepest rung covers every non-empty token (10)
    assert int(got2["top_mass"].max()) <= 10
