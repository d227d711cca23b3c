"""High-water-mark incremental-load operators (SURVEY §2.9 I1-I5).

Re-expresses the reference's PL/pgSQL procedure
(`/root/reference/src/sql/bronze_incremental_load.sql:1-81`) as pure
DataFrame functions:

- I1 read watermark (COALESCE(MAX(last_load_date), default))
- I2 month window computation
- P2/P3 in-window / out-of-window split
- I4 watermark recompute bounded to the window (idempotent re-runs:
  no new data ⇒ watermark unchanged ⇒ the strict `>` filter passes
  nothing on a re-run)
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MonthWindow:
    start: datetime
    end: datetime


def month_window_of(ts: datetime) -> MonthWindow:
    """I2 — [date_trunc('month', ts), +1 month)
    (`bronze_incremental_load.sql:22-24`)."""
    start = ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    end = (
        start.replace(year=start.year + 1, month=1)
        if start.month == 12
        else start.replace(month=start.month + 1)
    )
    return MonthWindow(start, end)


def read_watermark(meta: DataFrame | None, default: datetime) -> datetime:
    """I1 — COALESCE(MAX(last_load_date), default) over successful runs
    (`bronze_incremental_load.sql:18-20`). The metadata table is tiny
    (one row per run) — a driver-side scalar agg is correct at any scale."""
    if meta is None:
        return default
    row = (
        meta.filter(F.col("status") == "success")
        .agg(F.coalesce(F.max("last_load_date"), F.lit(default)).alias("wm"))
        .first()
    )
    return row["wm"] or default


def split_by_watermark(
    df: DataFrame, ts_col: str, watermark: datetime, window: MonthWindow
) -> tuple[DataFrame, DataFrame]:
    """P2/P3 — (in-window fresh rows, out-of-window fresh rows).

    Both predicates push down to the parquet scan; the source is read
    once per branch but row groups outside the month prune via min/max
    stats (`bronze_incremental_load.sql:42-43,58-60`).
    """
    t = F.col(ts_col)
    fresh = t > F.lit(watermark)
    in_win = (t >= F.lit(window.start)) & (t < F.lit(window.end))
    return df.filter(fresh & in_win), df.filter(fresh & ~in_win)


def next_watermark(
    target: DataFrame, ts_col: str, window: MonthWindow, fallback: datetime
) -> datetime:
    """I4 — recompute MAX(ts) from the *target* bounded to the window
    (`bronze_incremental_load.sql:64-65`); falls back to the current
    watermark when the window contributed no rows."""
    t = F.col(ts_col)
    row = (
        target.filter((t >= F.lit(window.start)) & (t < F.lit(window.end)))
        .agg(F.coalesce(F.max(t), F.lit(fallback)).alias("wm"))
        .first()
    )
    return row["wm"] or fallback
