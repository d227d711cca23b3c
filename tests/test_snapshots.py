"""Snapshot versioning: commit protocol, time travel, append mode,
retention GC."""

from __future__ import annotations

import os

import pytest

from python_nyc_taxi_data_pipeline_spark.operators.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_commit_read_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    assert t.latest_version() is None
    v1 = t.commit(_df(spark, 0, 10))
    v2 = t.commit(_df(spark, 0, 5))  # overwrite: shrinks
    assert (v1, v2) == (1, 2)
    assert t.read_version().count() == 5
    assert t.read_version(1).count() == 10  # time travel
    assert t.versions() == [1, 2]


def test_append_mode_carries_files_forward(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10))
    t.commit(_df(spark, 10, 15), mode="append")
    assert t.read_version(2).count() == 15
    assert t.read_version(1).count() == 10  # old snapshot untouched


def test_expire_keeps_live_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10))
    t.commit(_df(spark, 10, 15), mode="append")  # shares v1's files
    t.commit(_df(spark, 0, 3))  # overwrite
    deleted = t.expire_versions(keep=2)
    # v1 expired, but its files are still referenced by v2 → nothing dies
    assert deleted == []
    assert t.versions() == [2, 3]
    assert t.read_version(2).count() == 15

    deleted = t.expire_versions(keep=1)
    assert deleted  # v2's files unreferenced by v3 → GC'd
    assert t.read_version(3).count() == 3
    with pytest.raises(FileNotFoundError):
        t._manifest(2)


def test_reader_never_sees_partial_commit(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10))
    pinned = t.read_version()  # resolves v1's file list now
    t.commit(_df(spark, 0, 2))  # overwrite commits v2
    # the pinned snapshot still reads v1's files — full isolation
    assert pinned.count() == 10
    assert t.read_version().count() == 2


def test_orphan_manifest_invisible_and_cleaned(spark, tmp_path):
    """A crash between manifest write and pointer write leaves an orphan
    manifest newer than `_latest`: it must not be listed, not be
    readable, and be garbage-collected by the next commit."""
    import json

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10))
    # simulate the crash: hand-write a v2 manifest, never move the pointer
    orphan_data = str(tmp_path / "tbl" / "data" / "deadbeef-orphan.parquet")
    _df(spark, 0, 1).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage")
    )
    src = next(
        p
        for p in os.listdir(str(tmp_path / "stage"))
        if p.endswith(".parquet")
    )
    os.rename(str(tmp_path / "stage" / src), orphan_data)
    with open(str(tmp_path / "tbl" / "_manifests" / "v00000002.json"), "w") as f:
        json.dump({"version": 2, "files": [orphan_data], "committed_at": 0}, f)

    assert t.versions() == [1]
    with pytest.raises(ValueError, match="not committed"):
        t.read_version(2)
    # next commit reuses version 2 and removes the orphan's leftovers
    v = t.commit(_df(spark, 0, 3))
    assert v == 2
    assert t.read_version(2).count() == 3
    assert not os.path.exists(orphan_data)


def test_expire_requires_keep_at_least_one(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="keep must be >= 1"):
        t.expire_versions(0)
