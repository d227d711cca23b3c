"""Validation split, small-file compaction, write-audit-publish."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_nyc_taxi_data_pipeline_spark.catalog import load
from python_nyc_taxi_data_pipeline_spark.operators.maintenance import (
    compact_partitions,
    parquet_files_under,
    write_audit_publish,
)
from python_nyc_taxi_data_pipeline_spark.operators.validate import (
    in_range,
    in_set,
    not_null,
    split_valid,
)

from tests.conftest import SF_DIR


def test_split_valid_partitions_rows(spark):
    e = load(spark, SF_DIR, "events")
    rules = {
        "value_range": in_range("value", 0, 50),
        "known_type": in_set("event_type", ["click", "view"]),
        "user_nonnull": not_null("user_id"),
    }
    valid, invalid = split_valid(e, rules)
    assert valid.count() + invalid.count() == e.count()
    # every invalid row names at least one violated rule; reasons correct
    bad = invalid.filter(
        F.array_contains("violations", "value_range") & F.col("value").between(0, 50)
    )
    assert bad.count() == 0
    assert valid.filter(~F.col("event_type").isin("click", "view")).count() == 0


def test_compact_partitions_reduces_files_preserves_data(spark, tmp_path):
    path = str(tmp_path / "t")
    e = load(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    # simulate many small appends
    for _ in range(4):
        e.repartition(6).write.mode("append").partitionBy("day").parquet(path)
    before_rows = spark.read.parquet(path).count()
    days = [r["day"] for r in spark.read.parquet(path).select("day").distinct().collect()]
    before_files = len(parquet_files_under(path))

    compact_partitions(spark, path, "day", days, sort_cols=["ts"])

    after_files = len(parquet_files_under(path))
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after_files < before_files
    assert after_files <= len(days)  # tiny partitions → 1 file each
    # data content identical
    a = spark.read.parquet(path).drop("day")
    assert a.exceptAll(e.drop("day").union(e.drop("day")).union(e.drop("day")).union(e.drop("day"))).count() == 0


def test_write_audit_publish_success_and_rollback(spark, tmp_path):
    final = str(tmp_path / "pub" / "table")
    o = load(spark, SF_DIR, "orders")

    ok = write_audit_publish(o, final, audit=lambda df: df.count() == o.count())
    assert ok
    assert spark.read.parquet(final).count() == o.count()

    # failing audit must not clobber the published table
    bad = o.limit(3)
    ok2 = write_audit_publish(bad, final, audit=lambda df: df.count() > 100)
    assert not ok2
    assert spark.read.parquet(final).count() == o.count()  # untouched

    # successful re-publish replaces atomically
    ok3 = write_audit_publish(bad, final, audit=lambda df: True)
    assert ok3
    assert spark.read.parquet(final).count() == 3


def test_merge_into_semantics_and_snapshot_commit(spark, tmp_path):
    """MERGE INTO: updates replace, deletes vanish, inserts appear,
    everything else passes through — and committing the merge to a
    SnapshotTable preserves the pre-merge version (time travel)."""
    from python_nyc_taxi_data_pipeline_spark.operators.merge_into import (
        INSERT_KEY_SHIFT,
        merge_into_orders,
        orders_change_feed,
    )
    from python_nyc_taxi_data_pipeline_spark.operators.snapshots import (
        SnapshotTable,
    )

    target = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    before = {r["o_orderkey"]: r for r in target.collect()}
    merged = {r["o_orderkey"]: r for r in merge_into_orders(spark, SF_DIR).collect()}

    feed_ops = {
        r["o_orderkey"]: r["op"]
        for r in orders_change_feed(spark, SF_DIR).collect()
    }
    n_deleted = n_updated = n_inserted = 0
    for k, row in before.items():
        op = feed_ops.get(k)
        if op == "D":
            assert k not in merged
            n_deleted += 1
        elif op == "U":
            assert merged[k]["o_orderstatus"] == "M"
            assert abs(merged[k]["o_totalprice"] - round(row["o_totalprice"] + 1.0, 2)) < 1e-9
            n_updated += 1
        else:
            assert merged[k]["o_orderstatus"] == row["o_orderstatus"]
    for k, op in feed_ops.items():
        if op == "I":
            assert k >= INSERT_KEY_SHIFT and k in merged
            assert merged[k]["o_orderstatus"] == "N"
            n_inserted += 1
    assert n_deleted > 0 and n_updated > 0 and n_inserted > 0
    assert len(merged) == len(before) - n_deleted + n_inserted

    # copy-on-write commit: both versions remain queryable
    tbl = SnapshotTable(spark, str(tmp_path / "orders_snap"))
    v0 = tbl.commit(target)
    v1 = tbl.commit(merge_into_orders(spark, SF_DIR))
    assert tbl.read_version(v0).count() == len(before)
    assert tbl.read_version(v1).count() == len(merged)


def test_snapshot_diff_round_trips_the_cdc_feed(spark, tmp_path):
    """Commit the pre- and post-merge orders as SnapshotTable versions
    and read the diff BETWEEN VERSIONS: it must classify exactly the
    deterministic change feed's slices (update → mask 6: status+price,
    custkey passes through), self-diff must be empty, and a drifted
    schema must raise instead of mis-classifying."""
    import pytest

    from python_nyc_taxi_data_pipeline_spark.operators.merge_into import (
        merge_into_orders,
    )
    from python_nyc_taxi_data_pipeline_spark.operators.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    old = load(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    st = SnapshotTable(spark, str(tmp_path / "orders_snap"))
    v0 = st.commit(old)
    v1 = st.commit(merge_into_orders(spark, SF_DIR))
    diff = snapshot_diff(
        st.read_version(v0), st.read_version(v1), "o_orderkey"
    ).toPandas()

    keys = {r["o_orderkey"] for r in old.select("o_orderkey").collect()}
    upd = {k for k in keys if k % 10 == 3}
    dele = {k for k in keys if k % 10 == 7}
    ins = {k + 10_000_000 for k in keys if k % 10 == 1}

    by_type = {
        t: set(g["o_orderkey"]) for t, g in diff.groupby("change_type")
    }
    assert by_type["updated"] == upd
    assert by_type["deleted"] == dele
    assert by_type["inserted"] == ins
    u = diff[diff.change_type == "updated"]
    assert (u["changed_mask"] == 6).all()
    assert (u["n_changed_cols"] == 2).all()
    assert (diff[diff.change_type != "updated"]["changed_mask"] == 0).all()

    assert snapshot_diff(
        st.read_version(v0), st.read_version(v0), "o_orderkey"
    ).count() == 0

    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_diff(old, old.drop("o_custkey"), "o_orderkey")
