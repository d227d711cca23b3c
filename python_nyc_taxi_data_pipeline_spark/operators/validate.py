"""Rule-based data-quality validation — the dead-letter routing of the
medallion (SURVEY §2.9 I3) generalized to arbitrary rule sets.

A rule is (name, Column predicate that is TRUE for GOOD rows). The
validator computes every rule in one pass (no per-rule scans), tags
each row with its violated rule names, and splits valid/invalid —
mirroring how `meta.invalid_records` captures rejects, but carrying
the machine-readable reason the reference lacks.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    return F.col(col).between(lo, hi)


def in_set(col: str, values) -> Column:
    return F.col(col).isin(*values)


def matches(col: str, pattern: str) -> Column:
    return F.col(col).rlike(pattern)


def with_violations(
    df: DataFrame, rules: Mapping[str, Column], out_col: str = "violations"
) -> DataFrame:
    """Append an array column of violated rule names (empty = valid).
    Single projection — all rules evaluate in one codegen'd pass."""
    tags = [
        F.when(~pred, F.lit(name)) for name, pred in rules.items()
    ]
    arr = F.filter(F.array(*tags), lambda x: x.isNotNull())
    return df.withColumn(out_col, arr)


def split_valid(
    df: DataFrame, rules: Mapping[str, Column], out_col: str = "violations"
) -> tuple[DataFrame, DataFrame]:
    """(valid rows without the tag column, invalid rows with it)."""
    tagged = with_violations(df, rules, out_col)
    valid = tagged.filter(F.size(out_col) == 0).drop(out_col)
    invalid = tagged.filter(F.size(out_col) > 0)
    return valid, invalid
