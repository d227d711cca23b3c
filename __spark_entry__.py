"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``python_nyc_taxi_data_pipeline_spark`` (see
SURVEY.md §2 for the operator inventory each one covers); this module
just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from python_nyc_taxi_data_pipeline_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    gold.vendor_metrics analog (reference
    `src/sql/gold_aggregate_layer.sql:3-12`): fact LEFT JOIN broadcast
    dim → count/sum/avg → sort.
    """
    from python_nyc_taxi_data_pipeline_spark.plans.core import (
        flagship_supplier_metrics,
    )

    return flagship_supplier_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops — LSH candidate generation, hash fingerprints)."""
    return registry.oracles()
