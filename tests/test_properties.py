"""Hypothesis property tests for the driver-side pure functions
(SURVEY §5 strategy: property-based coverage where examples are cheap —
the Spark operators get their property checks via the DuckDB oracle)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from python_nyc_taxi_data_pipeline_spark.llm.multimodal import (
    FEATURE_DIM,
    fake_feature_extractor,
)
from python_nyc_taxi_data_pipeline_spark.operators.watermark import month_window_of
from python_nyc_taxi_data_pipeline_spark.sources.http import download_url_template
from python_nyc_taxi_data_pipeline_spark.sources.sql_runner import (
    split_sql_statements,
)

ts_strategy = st.datetimes(
    min_value=datetime(1990, 1, 1), max_value=datetime(2100, 12, 28)
)


@given(ts_strategy)
@settings(max_examples=200)
def test_month_window_contains_ts_and_is_one_month(ts):
    w = month_window_of(ts)
    assert w.start <= ts < w.end
    assert w.start.day == 1 and w.end.day == 1
    assert w.start.time() == w.end.time()
    # end is exactly the next month
    assert (w.end.year * 12 + w.end.month) - (w.start.year * 12 + w.start.month) == 1


@given(ts_strategy)
@settings(max_examples=100)
def test_month_windows_tile_the_timeline(ts):
    w = month_window_of(ts)
    nxt = month_window_of(w.end)
    assert nxt.start == w.end  # no gaps, no overlaps
    prev = month_window_of(w.start - timedelta(microseconds=1))
    assert prev.end == w.start


@given(st.lists(st.text(alphabet=st.characters(blacklist_characters=";'\"-"), max_size=30), min_size=1, max_size=5))
@settings(max_examples=100)
def test_split_sql_roundtrip(stmts):
    stmts = [s.strip() for s in stmts if s.strip()]
    text = ";\n".join(stmts) + ";"
    assert split_sql_statements(text) == stmts


@given(st.text(max_size=200))
@settings(max_examples=100)
def test_split_sql_never_splits_inside_quotes(s):
    quoted = "SELECT '" + s.replace("'", "''") + "' AS x"
    out = split_sql_statements(quoted + ";" + quoted)
    assert len(out) == 2


@given(st.binary(min_size=1, max_size=500))
@settings(max_examples=200)
def test_fake_feature_extractor_is_distribution(payload):
    v = fake_feature_extractor(payload)
    assert len(v) == FEATURE_DIM
    assert abs(sum(v) - 1.0) < 1e-9
    assert all(x >= 0 for x in v)


@given(st.integers(min_value=2000, max_value=2099), st.integers(min_value=1, max_value=12))
@settings(max_examples=50)
def test_download_url_template_shape(year, month):
    url = download_url_template(year, month)
    assert url.endswith(f"yellow_tripdata_{year}-{month:02d}.parquet")
    assert url.startswith("https://")


def test_pack_by_budget_matches_naive_prefix_sum(spark):
    """Property: the distributed prefix-sum packing equals the naive
    driver-side running sum for random token sequences and budgets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_nyc_taxi_data_pipeline_spark.plans.curation import pack_by_budget

    @given(
        st.lists(st.integers(0, 300), min_size=1, max_size=60),
        st.integers(16, 512),
    )
    @settings(max_examples=6, deadline=None)
    def run(tokens, budget):
        rows = [(i, t) for i, t in enumerate(tokens)]
        df = spark.createDataFrame(rows, "k long, n_tokens long")
        got = {
            r.k: r.pack_id
            for r in pack_by_budget(df, "k", "n_tokens", budget).collect()
        }
        offset = 0
        for i, t in enumerate(tokens):
            assert got[i] == offset // budget, (i, got[i], offset, budget)
            offset += t

    run()
