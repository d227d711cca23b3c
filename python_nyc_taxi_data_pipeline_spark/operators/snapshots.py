"""Manifest-based snapshot versioning + time travel for plain parquet.

Extends ``operators.maintenance.write_audit_publish`` (which gives
atomic single-version promotion) with a commit log: every commit
writes an immutable file set plus a manifest listing exactly the files
of that version. Readers pin a manifest → consistent snapshot
isolation; old versions stay readable until expired — the core
mechanism lakehouse formats (Delta/Iceberg/Hudi) institutionalize,
reduced to its parquet-only essentials.

Layout:

    table/
      data/<version>-<uuid>.parquet     immutable data files
      _manifests/v00000001.json         {"version", "files", "committed_at"}
      _manifests/_latest                 text pointer, written last

Guarantees (single-writer):
- A reader that resolved a manifest never sees partial commits —
  manifests are written AFTER their data files, and `_latest` is
  written after the manifest (write ordering = the only primitive
  plain object stores give you).
- Time travel: ``read_version(n)`` / ``versions()``.
- ``expire_versions(keep)`` deletes data files referenced ONLY by
  expired manifests (mark-and-sweep over the manifest set).

Scale notes: manifests list files, not rows — O(#files) JSON, which is
why compaction (fewer, bigger files) also keeps the commit log small.
Reading by explicit file list (``spark.read.parquet(*files)``) skips
directory listing entirely — at cloud-store scale, listing IS the
bottleneck the manifest removes.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- commit protocol ---------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "overwrite") -> int:
        """Write ``df`` as a new version. ``mode='overwrite'`` makes the
        new manifest exactly the new files; ``mode='append'`` carries
        the previous version's files forward plus the new ones."""
        staging = os.path.join(self.root, f"_staging_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        new_files = []
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            version_tag = uuid.uuid4().hex[:12]
            dst = os.path.join(self.data_dir, f"{version_tag}-{name}")
            shutil.move(os.path.join(staging, name), dst)
            new_files.append(dst)
        shutil.rmtree(staging, ignore_errors=True)

        prev = self.latest_version()
        # A crash between manifest write and pointer write can leave an
        # orphan manifest newer than `_latest`; it was never committed,
        # so remove it (and its unreferenced data files) before reusing
        # its version number — readers must never resolve it.
        self._clean_uncommitted(prev)
        files = new_files
        if mode == "append" and prev is not None:
            files = self._manifest(prev)["files"] + new_files
        version = (prev or 0) + 1
        manifest = {
            "version": version,
            "files": files,
            "committed_at": time.time(),
        }
        mpath = os.path.join(self.manifest_dir, f"v{version:08d}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        # pointer LAST: readers either see the old version or the fully
        # committed new one
        with open(os.path.join(self.manifest_dir, "_latest"), "w") as f:
            f.write(str(version))
        return version

    # -- reads -------------------------------------------------------------

    def _manifest(self, version: int) -> dict:
        mpath = os.path.join(self.manifest_dir, f"v{version:08d}.json")
        with open(mpath) as f:
            return json.load(f)

    def latest_version(self) -> int | None:
        p = os.path.join(self.manifest_dir, "_latest")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def versions(self) -> list[int]:
        """Committed versions only: bounded by the `_latest` pointer.
        A manifest newer than the pointer is an uncommitted leftover
        from a crash mid-commit — invisible here, cleaned by the next
        ``commit``."""
        latest = self.latest_version()
        if latest is None:
            return []
        return [v for v in self._all_manifest_versions() if v <= latest]

    def _all_manifest_versions(self) -> list[int]:
        return sorted(
            int(n[1:9])
            for n in os.listdir(self.manifest_dir)
            if n.startswith("v") and n.endswith(".json")
        )

    def _clean_uncommitted(self, latest: int | None) -> None:
        committed_files = {
            f
            for v in self._all_manifest_versions()
            if latest is not None and v <= latest
            for f in self._manifest(v)["files"]
        }
        for v in self._all_manifest_versions():
            if latest is None or v > latest:
                for f in self._manifest(v)["files"]:
                    if f not in committed_files and os.path.exists(f):
                        os.remove(f)
                os.remove(os.path.join(self.manifest_dir, f"v{v:08d}.json"))

    def read_version(self, version: int | None = None) -> DataFrame:
        """Snapshot read: the exact file list of ``version`` (default
        latest). No directory listing, no visibility of in-flight
        commits."""
        latest = self.latest_version()
        v = version if version is not None else latest
        if v is None:
            raise FileNotFoundError(f"no committed version in {self.root}")
        if latest is None or v > latest:
            raise ValueError(
                f"version {v} is not committed (latest is {latest}); "
                "a newer manifest without a pointer is mid-commit garbage"
            )
        files = self._manifest(v)["files"]
        return self.spark.read.parquet(*files)

    # -- retention ---------------------------------------------------------

    def expire_versions(self, keep: int) -> list[str]:
        """Drop all but the newest ``keep`` manifests and garbage-collect
        data files no retained manifest references. Returns deleted
        file paths. ``keep`` must be ≥ 1 — a table always retains its
        current version (``keep=0`` would otherwise silently be a no-op:
        ``vs[-0:]`` is the whole list)."""
        if keep < 1:
            raise ValueError(f"expire_versions: keep must be >= 1, got {keep}")
        vs = self.versions()
        retained, expired = vs[-keep:], vs[:-keep]
        live = {f for v in retained for f in self._manifest(v)["files"]}
        deleted = []
        for v in expired:
            for f in self._manifest(v)["files"]:
                if f not in live and os.path.exists(f):
                    os.remove(f)
                    deleted.append(f)
            os.remove(os.path.join(self.manifest_dir, f"v{v:08d}.json"))
        return deleted


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Change-data-feed between two versions of a keyed table — the
    read-side complement of ``merge_into`` (Delta's ``table_changes``
    / CDF shape): one FULL OUTER equi-join on ``key`` classifies every
    row as inserted (absent before), deleted (absent after), or
    updated (present in both with any data column differing;
    bit ``i`` of ``changed_mask`` marks data column ``i`` in schema
    order, ``n_changed_cols`` is its popcount). Unchanged rows are
    dropped — the feed is the DELTA, not a copy of the table.

    Presence is tracked with explicit marker literals, not data-column
    NULL checks, so genuinely-NULL data columns can't masquerade as
    absent rows; column comparisons use null-safe equality
    (``IS DISTINCT FROM``). Schemas must match exactly — a drifted
    column set raises here rather than mis-classifying.

    Scale: one key-partitioned shuffle join (the CDC-feed join shape;
    bucket both versions on the key to make it co-located), then
    row-local arithmetic. Output is bounded by the change volume, not
    the table."""
    if old.columns != new.columns:
        raise ValueError(
            f"snapshot_diff: schema mismatch {old.columns} vs {new.columns}"
        )
    data_cols = [c for c in old.columns if c != key]
    o = old.select(
        F.col(key).alias("__k_old"),
        F.lit(1).alias("__o_present"),
        *[F.col(c).alias(f"__o_{c}") for c in data_cols],
    )
    n = new.select(
        F.col(key).alias("__k_new"),
        F.lit(1).alias("__n_present"),
        *[F.col(c).alias(f"__n_{c}") for c in data_cols],
    )
    j = o.join(n, F.col("__k_old") == F.col("__k_new"), "full_outer")
    mask = None
    for i, c in enumerate(data_cols):
        bit = F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(1 << i)
        ).otherwise(F.lit(0))
        mask = bit if mask is None else mask + bit
    change = (
        F.when(F.col("__o_present").isNull(), F.lit("inserted"))
        .when(F.col("__n_present").isNull(), F.lit("deleted"))
        .otherwise(F.lit("updated"))
    )
    return (
        j.select(
            F.coalesce(F.col("__k_old"), F.col("__k_new")).alias(key),
            change.alias("change_type"),
            F.when(
                F.col("__o_present").isNull() | F.col("__n_present").isNull(),
                F.lit(0),
            )
            .otherwise(mask)
            .alias("changed_mask"),
        )
        .withColumn("n_changed_cols", F.bit_count(F.col("changed_mask")))
        .filter(
            (F.col("change_type") != "updated") | (F.col("changed_mask") > 0)
        )
    )
