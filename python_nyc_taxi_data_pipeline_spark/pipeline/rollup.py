"""Incrementally-maintained monthly rollup (continuous aggregate).

The reference's gold layer recomputes its views on every read
(`gold_aggregate_layer.sql` — fine at 16.8M rows, not at 100 TB). This
operator materializes the aggregate partitioned by month and, after an
incremental ingest, recomputes ONLY the affected month partitions:

- read side: partition-pruned scan of the fact's month partitions;
- write side: dynamic partition overwrite replaces exactly those
  months' aggregate partitions, leaving the rest untouched.

Cost per refresh is O(changed months), independent of table history —
the timescale/"hypertable continuous aggregate" maintenance pattern
expressed with plain Spark partitioning.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MonthlyRollup:
    def __init__(
        self,
        spark: SparkSession,
        fact_path: str,
        out_path: str,
        agg_fn: Callable[[DataFrame], DataFrame],
        partition_col: str = "load_month",
    ):
        """``agg_fn`` maps a (possibly month-filtered) fact DataFrame to
        its aggregate and MUST carry ``partition_col`` through (it is
        both the pruning key and the output partitioning)."""
        self.spark = spark
        self.fact_path = fact_path
        self.out_path = out_path
        self.agg_fn = agg_fn
        self.partition_col = partition_col

    def _fact(self) -> DataFrame:
        return self.spark.read.parquet(self.fact_path)

    def refresh_months(self, months: Sequence[str]) -> None:
        """Recompute only the given 'yyyy-MM' partitions."""
        fact = self._fact().filter(F.col(self.partition_col).isin(list(months)))
        agg = self.agg_fn(fact)
        (
            agg.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(self.partition_col)
            .parquet(self.out_path)
        )

    def refresh_full(self) -> None:
        """Full rebuild (static overwrite of every partition)."""
        agg = self.agg_fn(self._fact())
        (
            agg.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy(self.partition_col)
            .parquet(self.out_path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.out_path)
