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


def test_merge_into_matches_python_reference(spark):
    """Property: generic MERGE (update/delete/insert + SQL-standard
    edge semantics: unmatched U/D ignored, matched I ignored) equals a
    pure-Python reference merge on random targets and change feeds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_nyc_taxi_data_pipeline_spark.operators.merge_into import (
        merge_into,
    )

    keys = st.integers(0, 12)

    @given(
        st.dictionaries(keys, st.integers(0, 100), min_size=0, max_size=10),
        st.lists(
            st.tuples(keys, st.sampled_from("UDI"), st.integers(0, 100)),
            max_size=10,
            unique_by=lambda t: t[0],  # one op per key, like a CDC batch
        ),
    )
    @settings(max_examples=8, deadline=None)
    def run(target, feed):
        tgt_df = spark.createDataFrame(
            [(k, v) for k, v in target.items()] or [(None, None)],
            "k long, val long",
        ).filter("k IS NOT NULL")
        src_df = spark.createDataFrame(
            [(k, op, v) for k, op, v in feed] or [(None, None, None)],
            "k long, op string, val long",
        ).filter("k IS NOT NULL")
        got = {
            r.k: r.val for r in merge_into(tgt_df, src_df, "k").collect()
        }
        expected = dict(target)
        for k, op, v in feed:
            if op == "U" and k in target:
                expected[k] = v
            elif op == "D" and k in target:
                del expected[k]
            elif op == "I" and k not in target:
                expected[k] = v
        assert got == expected

    run()


def test_bpe_merge_fold_matches_python_fold(spark):
    """Property: the JVM aggregate() merge fold equals the textbook
    left-to-right Python fold on arbitrary symbol sequences, including
    overlapping runs (aaa with merge (a,a) -> [aa, a]) and SQL-hostile
    symbols."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_nyc_taxi_data_pipeline_spark.llm.bpe import _merge_col

    sym = st.sampled_from(["a", "b", "ab", "a'b", "\\", "'", "x y"])

    @given(
        st.lists(st.lists(sym, min_size=1, max_size=8), min_size=1, max_size=6),
        sym,
        sym,
    )
    @settings(max_examples=10, deadline=None)
    def run(seqs, left, right):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seqs)],
            "word long, syms array<string>",
        )
        got = {
            r.word: r.syms
            for r in df.select(
                "word", _merge_col(left, right).alias("syms")
            ).collect()
        }
        for i, syms in enumerate(seqs):
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            assert got[i] == out, (syms, left, right, got[i], out)

    run()


def test_segment_dedup_apply_matches_python_reference(spark):
    """Property: segment dedup + reassembly equals a brute-force
    first-writer-wins Python implementation on random word corpora
    (including within-doc repeats and exact aligned duplicates)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_nyc_taxi_data_pipeline_spark.llm.segdedup import (
        SEG_WORDS,
        segment_dedup_apply,
    )

    word = st.sampled_from(["w0", "w1", "w2"])

    @given(
        st.lists(
            st.lists(word, min_size=1, max_size=3 * SEG_WORDS),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=8, deadline=None)
    def run(docs):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in segment_dedup_apply(df).collect()}
        seen: set[str] = set()
        for i, ws in enumerate(docs):
            segs = [
                " ".join(ws[j : j + SEG_WORDS])
                for j in range(0, len(ws), SEG_WORDS)
            ]
            kept = []
            for s in segs:
                if s not in seen:
                    seen.add(s)
                    kept.append(s)
            r = got[i]
            assert r.total_segments == len(segs)
            assert r.kept_segments == len(kept)
            assert r.clean_text == " ".join(kept)

    run()
