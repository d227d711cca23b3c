"""Z-order (Morton curve) clustering for multi-column scan pruning.

Sorting on one key tightens parquet min/max stats for that key only;
filters on a second column still read every file. Interleaving the
bits of BOTH keys' rank-space positions produces a space-filling curve
order in which files are tight rectangles in (a, b) space — selective
filters on EITHER column prune most files. This is the layout step
behind `OPTIMIZE ... ZORDER BY` in lakehouse engines, built here from
plain DataFrame ops.

Mechanics:
1. each key maps to its 16-bit rank-space position via
   ``percent_rank`` (rank-space, not value-space: immune to skew and
   outliers — equal-depth, like the histograms an optimizer keeps);
2. the two 16-bit positions interleave into one 32-bit z-value
   (JVM bit ops unrolled — 16 terms each, whole-stage codegen);
3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` writes
   size-targeted files that tile the curve.

Scale notes: percent_rank over an unpartitioned window serializes, so
positions come from an APPROXIMATE quantile cut instead (255 cuts via
``approxQuantile`` on a sample → broadcastable bin edges) when
``exact=False`` (the default) — the 100 TB path; ``exact=True`` keeps
the bit-exact rank windows for tests/small tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 16  # per-column resolution; z-value fits in 32 bits


def _interleave(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints (a even
    positions, b odd)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z + (abit.cast("long") * F.lit(1 << (2 * i))) + (
            bbit.cast("long") * F.lit(1 << (2 * i + 1))
        )
    return z


def _rank_positions_exact(df: DataFrame, col: str, bits: int) -> Column:
    """Test-side referee only: the unpartitioned window funnels all
    rows through one task — never the scale path. Production uses the
    approxQuantile bins (``exact=False``, the default)."""
    w = Window.orderBy(F.col(col))
    return (F.percent_rank().over(w) * F.lit((1 << bits) - 1)).cast("int")


def _rank_positions_approx(df: DataFrame, col: str, bits: int, n_bins: int = 256):
    """Equi-depth bin id from approxQuantile edges (driver-side list →
    broadcast-sized literal). Resolution n_bins ≪ 2^bits is fine: the
    curve needs locality, not uniqueness."""
    probs = [i / n_bins for i in range(1, n_bins)]
    edges = df.stat.approxQuantile(col, probs, 0.01)
    # scale bin ids up to the bit range so both exact/approx interleave
    # the same way
    scale = (1 << bits) // n_bins
    expr = F.lit(0)
    for e in edges:
        expr = expr + F.when(F.col(col) > F.lit(e), 1).otherwise(0)
    return (expr * F.lit(scale)).cast("int")


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, exact: bool = False
) -> DataFrame:
    pos_a = (
        _rank_positions_exact(df, col_a, Z_BITS)
        if exact
        else _rank_positions_approx(df, col_a, Z_BITS)
    )
    df = df.withColumn("__pos_a", pos_a)
    pos_b = (
        _rank_positions_exact(df, col_b, Z_BITS)
        if exact
        else _rank_positions_approx(df, col_b, Z_BITS)
    )
    df = df.withColumn("__pos_b", pos_b)
    return df.withColumn(
        "zvalue", _interleave(F.col("__pos_a"), F.col("__pos_b"))
    ).drop("__pos_a", "__pos_b")


def cluster_by_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    out_path: str,
    n_files: int = 16,
    exact: bool = False,
) -> None:
    """Rewrite ``df`` into ``n_files`` z-ordered parquet files whose
    per-file min/max stats are tight on BOTH columns."""
    z = with_zvalue(df, col_a, col_b, exact=exact)
    (
        z.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(out_path)
    )
