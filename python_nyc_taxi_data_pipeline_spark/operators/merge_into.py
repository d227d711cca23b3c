"""MERGE INTO semantics: update / delete / insert in one pass.

The lakehouse generalization of the reference's ``ON CONFLICT DO
NOTHING`` upsert (reference ``src/sql/*_upsert.sql`` shapes → U1/U2 in
SURVEY §2.7): a change feed carrying an ``op`` marker is merged into a
target table —

- matched + ``U`` → the source row's values replace the target's,
- matched + ``D`` → the target row is deleted,
- unmatched + ``I`` → the source row is inserted,
- every other target row passes through unchanged.

This is exactly Delta/Iceberg ``MERGE INTO`` resolved copy-on-write
style: ONE equi-join of target and change feed on the key, a CASE per
clause, plus the insert union. No per-row driver logic; at 100 TB the
join shuffles on the bigint key (or co-located bucketing / AQE
broadcast when the feed is small — the common CDC case), and the
rewrite is the standard copy-on-write output.

The registered query derives a DETERMINISTIC change feed from the
orders table itself (key mod 10: 3 → update, 7 → delete, 1 → insert a
shifted copy), so the DuckDB oracle replays the merge exactly:
row counts prove delete semantics, values prove update-vs-passthrough
per row, and the shifted keys prove inserts.

``tests/test_maintenance.py`` additionally drives the same merge
through ``SnapshotTable`` to show the copy-on-write commit: merge →
``commit()`` → time-travel shows both the pre- and post-merge
versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

INSERT_KEY_SHIFT = 10_000_000


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Generic MERGE: ``source`` carries ``op`` ∈ {'U','D','I'} plus the
    full target schema. Returns the merged table (copy-on-write
    result). Update/delete rows must match on ``key``; insert rows must
    not (enforced semantically: unmatched U/D are ignored, matched I is
    ignored — the SQL-standard interpretation)."""
    data_cols = [c for c in target.columns if c != key]
    src = source.select(
        F.col(key),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__src_{c}") for c in data_cols],
    )
    matched = target.join(src, key, "left")

    def pick(c: str) -> Column:
        return F.when(F.col("__op") == "U", F.col(f"__src_{c}")).otherwise(
            F.col(c)
        )

    kept = (
        matched.filter((F.col("__op").isNull()) | (F.col("__op") != "D"))
        .select(F.col(key), *[pick(c).alias(c) for c in data_cols])
    )
    inserts = (
        src.filter(F.col("__op") == "I")
        .join(target.select(key), key, "left_anti")
        .select(F.col(key), *[F.col(f"__src_{c}").alias(c) for c in data_cols])
    )
    return kept.unionByName(inserts)


def orders_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CDC batch over orders: mod-10 slices (see module
    docstring)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") + 1.0, 2).alias("o_totalprice"),
    )
    deletes = o.filter(F.col("o_orderkey") % 10 == 7).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    inserts = o.filter(F.col("o_orderkey") % 10 == 1).select(
        (F.col("o_orderkey") + INSERT_KEY_SHIFT).alias("o_orderkey"),
        F.lit("I").alias("op"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    return updates.unionByName(deletes).unionByName(inserts)


_MERGE_ORACLE = f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    ), feed AS (
      SELECT o_orderkey, 'U' AS op, o_custkey, 'M' AS o_orderstatus,
             round(o_totalprice + 1.0, 2) AS o_totalprice
      FROM o WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, 'D', o_custkey, o_orderstatus, o_totalprice
      FROM o WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + {INSERT_KEY_SHIFT}, 'I', o_custkey, 'N',
             o_totalprice
      FROM o WHERE o_orderkey % 10 = 1
    ), merged AS (
      SELECT t.o_orderkey,
             CASE WHEN f.op = 'U' THEN f.o_custkey ELSE t.o_custkey END
               AS o_custkey,
             CASE WHEN f.op = 'U' THEN f.o_orderstatus
                  ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN f.op = 'U' THEN f.o_totalprice
                  ELSE t.o_totalprice END AS o_totalprice
      FROM o t LEFT JOIN feed f USING (o_orderkey)
      WHERE f.op IS NULL OR f.op <> 'D'
      UNION ALL
      SELECT f.o_orderkey, f.o_custkey, f.o_orderstatus, f.o_totalprice
      FROM feed f LEFT JOIN o t USING (o_orderkey)
      WHERE f.op = 'I' AND t.o_orderkey IS NULL
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS o_totalprice
    FROM merged
"""


@register("merge_into_orders", oracle=_MERGE_ORACLE, tags=("upsert", "merge", "cdc"))
def merge_into_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the deterministic orders change feed into orders and
    return the copy-on-write result (see module docstring)."""
    target = load(spark, sf_dir, "orders").select(
        # Insert keys are target keys shifted by INSERT_KEY_SHIFT; if the
        # target ever holds a key >= the shift (TPC-H max orderkey crosses
        # 10M around SF 0.42) an insert would silently collide into a
        # passthrough. Guard per row (same pattern as the segdedup
        # packing guard) instead of failing quietly at larger SFs.
        F.expr(
            f"if(o_orderkey < {INSERT_KEY_SHIFT}, o_orderkey,"
            " raise_error('merge_into_orders: o_orderkey >="
            " INSERT_KEY_SHIFT; shifted insert keys would collide —"
            " raise INSERT_KEY_SHIFT'))"
        ).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    merged = merge_into(target, orders_change_feed(spark, sf_dir), "o_orderkey")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
