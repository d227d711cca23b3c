"""SCD2 dimension maintenance + CSV/JSONL format round-trips +
streaming dedup."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_nyc_taxi_data_pipeline_spark.operators.scd2 import (
    scd2_apply,
    scd2_as_of,
    scd2_init,
)
from python_nyc_taxi_data_pipeline_spark.sources.formats import (
    read_csv,
    read_jsonl,
    with_corrupt_capture,
    write_csv,
    write_jsonl,
)

from tests.conftest import SF_DIR

DIM_SCHEMA = "vendor_id int, vendor_name string, tier string"


def _batch(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def test_scd2_versions_and_as_of(spark):
    t1, t2, t3 = (datetime(2024, m, 1) for m in (1, 2, 3))
    dim = scd2_init(_batch(spark, [(1, "CMT", "gold"), (2, "VTS", "silver")]), t1)
    # t2: vendor 1 changes tier; vendor 3 appears; vendor 2 unchanged
    dim = scd2_apply(
        dim,
        _batch(spark, [(1, "CMT", "platinum"), (2, "VTS", "silver"), (3, "NEW", "bronze")]),
        ["vendor_id"],
        t2,
    )
    rows = {(r.vendor_id, r.tier): r for r in dim.collect()}
    # vendor 1 closed + vendor 1 new version + vendor 2 kept + vendor 3 new
    assert len(rows) == 4
    closed = rows[(1, "gold")]
    assert closed.is_current is False and closed.valid_to == t2
    new = rows[(1, "platinum")]
    assert new.is_current is True and new.valid_from == t2 and new.valid_to is None
    assert rows[(2, "silver")].is_current is True
    assert rows[(2, "silver")].valid_from == t1  # untouched
    assert rows[(3, "bronze")].valid_from == t2

    # point-in-time views
    at_t1 = {r.vendor_id: r.tier for r in scd2_as_of(dim, t1).collect()}
    assert at_t1 == {1: "gold", 2: "silver"}
    at_t3 = {r.vendor_id: r.tier for r in scd2_as_of(dim, t3).collect()}
    assert at_t3 == {1: "platinum", 2: "silver", 3: "bronze"}


def test_scd2_idempotent_reapply(spark):
    t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    snap = [(1, "CMT", "gold"), (2, "VTS", "silver")]
    dim = scd2_init(_batch(spark, snap), t1)
    again = scd2_apply(dim, _batch(spark, snap), ["vendor_id"], t2)
    # identical snapshot → no new versions, no closures
    assert again.count() == 2
    assert again.filter(F.col("is_current")).count() == 2
    assert again.filter(F.col("valid_from") == t2).count() == 0


def test_csv_roundtrip_with_nulls(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(1, "a", 1.5), (2, None, None)], schema)
    path = str(tmp_path / "csv_rt")
    write_csv(df, path)
    back = read_csv(spark, path, schema)
    assert sorted(back.collect()) == sorted(df.collect())


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("s", T.StringType())]
    )
    df = spark.createDataFrame([(1, "a"), (2, None)], schema)
    path = str(tmp_path / "jsonl_rt")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema)
    assert sorted(back.collect()) == sorted(df.collect())

    # dead-letter: malformed line surfaces in _corrupt_record, job survives
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"k": 1, "s": "ok"}\n{not json at all}\n')
    cap = read_jsonl(
        spark, str(bad), with_corrupt_capture(schema), failfast=False
    ).cache()
    assert cap.count() == 2
    assert cap.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    cap.unpersist()


def test_stream_dedup_within_watermark(spark, tmp_path):
    from python_nyc_taxi_data_pipeline_spark.catalog import load
    from python_nyc_taxi_data_pipeline_spark.streaming.jobs import (
        dedup_stream,
        read_event_stream,
        run_to_memory_sink,
    )

    src = str(tmp_path / "dup_src")
    ev = load(spark, SF_DIR, "events").limit(500)
    # replay the same rows twice (at-least-once delivery)
    ev.unionAll(ev).repartition(4).write.parquet(src)
    stream = read_event_stream(spark, src, max_files_per_trigger=2)
    run_to_memory_sink(dedup_stream(stream), "dedup_sink", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_sink").first()
    assert got.n == got.d == 500


def test_schema_evolution_additive_and_refusals(spark, tmp_path):
    import pytest

    from python_nyc_taxi_data_pipeline_spark.sources.evolution import (
        SchemaEvolutionError,
        append_evolved,
        backfill_defaults,
        read_evolved,
        validate_append,
    )

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    v1.write.parquet(path)

    # additive append: new nullable column
    v2 = spark.createDataFrame([(3, "c", 9.5)], "k int, s string, score double")
    added = append_evolved(v2, path, v1.schema)
    assert added == ["score"]

    merged = read_evolved(spark, path)
    assert set(merged.columns) == {"k", "s", "score"}
    by_k = {r.k: r for r in merged.collect()}
    assert by_k[1].score is None and by_k[3].score == 9.5

    filled = backfill_defaults(merged, {"score": 0.0})
    assert {r.k: r.score for r in filled.collect()} == {1: 0.0, 2: 0.0, 3: 9.5}

    # refusals: drop and retype are rewrites, not appends
    with pytest.raises(SchemaEvolutionError, match="drops columns"):
        validate_append(merged.schema, v1.select("k").schema)
    v_retyped = spark.createDataFrame([("1", "x")], "k string, s string")
    with pytest.raises(SchemaEvolutionError, match="changes column types"):
        validate_append(v1.schema, v_retyped.schema)


def test_scd2_random_sequences_hold_invariants(spark):
    """Property: after any sequence of snapshot batches, (a) each key
    has exactly one current row, (b) validity intervals per key are
    non-overlapping and contiguous, (c) as-of reconstruction matches a
    driver-side model. Hypothesis drives the sequences; examples are
    bounded because each runs real Spark jobs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    batch_strategy = st.lists(
        st.dictionaries(
            st.integers(1, 3),  # keys
            st.sampled_from(["a", "b", "c"]),  # attribute value
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=4,
    )

    @given(batch_strategy)
    @settings(max_examples=8, deadline=None)
    def run(batches):
        times = [datetime(2024, 1 + i, 1) for i in range(len(batches))]
        dim = None
        model: dict[int, str] = {}
        states = []  # driver-side model per step
        for snap, t in zip(batches, times):
            b = _batch(spark, [(k, f"name{k}", v) for k, v in sorted(snap.items())])
            if dim is None:
                dim = scd2_init(b, t)
                model = dict(snap)
            else:
                dim = scd2_apply(dim, b, ["vendor_id"], t)
                model.update(snap)
            states.append((t, dict(model)))
        rows = dim.collect()

        # (a) one current row per key ever seen
        current = [r for r in rows if r.is_current]
        assert sorted(r.vendor_id for r in current) == sorted(model.keys())
        # (b) per-key intervals: closed rows end where a later starts;
        # exactly one open interval
        by_key: dict[int, list] = {}
        for r in rows:
            by_key.setdefault(r.vendor_id, []).append(r)
        for k, versions in by_key.items():
            versions.sort(key=lambda r: r.valid_from)
            opens = [r for r in versions if r.valid_to is None]
            assert len(opens) == 1 and opens[-1] is versions[-1]
            for prev_r, next_r in zip(versions, versions[1:]):
                assert prev_r.valid_to == next_r.valid_from
        # (c) as-of each step time matches the model state then
        for t, state in states:
            got = {r.vendor_id: r.tier for r in scd2_as_of(dim, t).collect()}
            assert got == state

    run()


def test_scd2_duplicate_batch_keys_raise_or_dedup(spark):
    t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    dim = scd2_init(_batch(spark, [(1, "CMT", "gold")]), t1)
    dup = _batch(spark, [(1, "CMT", "platinum"), (1, "CMT", "bronze")])
    import pytest

    with pytest.raises(ValueError, match="duplicate business keys"):
        scd2_apply(dim, dup, ["vendor_id"], t2)
    # keep_first: deterministic precedence = lowest attribute tuple
    out = scd2_apply(dim, dup, ["vendor_id"], t2, on_duplicate="keep_first")
    current = {r.tier for r in out.collect() if r.is_current}
    assert current == {"bronze"}
    # exactly one current row, no overlapping intervals
    assert out.filter(F.col("is_current")).count() == 1


def test_scd2_null_business_key_rows_survive(spark):
    t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    dim = scd2_init(_batch(spark, [(None, "UNK", "none"), (1, "CMT", "gold")]), t1)
    # null-key row changes attribute → close + new version, like any key
    out = scd2_apply(
        dim, _batch(spark, [(None, "UNK", "basic"), (1, "CMT", "gold")]), ["vendor_id"], t2
    )
    rows = [r for r in out.collect() if r.vendor_id is None]
    assert len(rows) == 2  # closed old version + new current version
    closed = [r for r in rows if not r.is_current]
    assert len(closed) == 1 and closed[0].valid_to == t2
    cur = [r for r in rows if r.is_current]
    assert len(cur) == 1 and cur[0].tier == "basic"


def test_csv_write_distinguishes_null_from_empty_on_disk(spark, tmp_path):
    """Write side: NULL -> bare token, '' -> quoted "" (a COPY-CSV
    consumer reads them back distinctly). Read side: Spark's parser
    conflates both to NULL — pinned here as documented behavior."""
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("s", T.StringType())]
    )
    df = spark.createDataFrame([(1, None), (2, ""), (3, "x")], schema)
    path = str(tmp_path / "csv_ne")
    write_csv(df, path)
    import glob

    raw = "".join(open(p).read() for p in glob.glob(path + "/*.csv"))
    lines = {ln.split(",", 1)[0]: ln.split(",", 1)[1] for ln in raw.splitlines()}
    assert lines["1"] == ""  # NULL -> bare empty token
    assert lines["2"] == '""'  # empty string -> quoted
    back = {r.k: r.s for r in read_csv(spark, path, schema).collect()}
    assert back == {1: None, 2: None, 3: "x"}  # documented conflation
