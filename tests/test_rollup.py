"""Incremental rollup maintenance: partition-wise refresh must equal a
full rebuild at every step."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from python_nyc_taxi_data_pipeline_spark.operators.watermark import MonthWindow
from python_nyc_taxi_data_pipeline_spark.pipeline.rollup import MonthlyRollup
from python_nyc_taxi_data_pipeline_spark.pipeline.taxi import taxi_pipeline
from python_nyc_taxi_data_pipeline_spark.sources.fixture_taxi import orders_as_taxi

from tests.conftest import SF_DIR


def monthly_agg(fact):
    return fact.groupBy("load_month", "vendorid").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.sum(F.col("total_amount").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


def _assert_rollup_equals_full(rollup, bronze):
    cols = ["load_month", "vendorid", "n_trips", "revenue"]
    materialized = (
        rollup.read().select(*cols).orderBy("load_month", "vendorid").collect()
    )
    full = monthly_agg(bronze).select(*cols).orderBy("load_month", "vendorid").collect()
    assert [tuple(r) for r in materialized] == [tuple(r) for r in full]


def test_incremental_rollup_matches_full_rebuild(spark, tmp_path):
    pipe = taxi_pipeline(spark, str(tmp_path / "wh"))
    taxi = orders_as_taxi(spark, SF_DIR).cache()
    rollup = MonthlyRollup(
        spark,
        pipe.bronze_path,
        str(tmp_path / "rollup"),
        monthly_agg,
        partition_col="load_month",
    )

    # month 1 lands → refresh only 2024-01
    jan = taxi.filter(F.month("tpep_pickup_datetime") == 1)
    pipe.ingest_batch(jan, MonthWindow(datetime(2024, 1, 1), datetime(2024, 2, 1)))
    rollup.refresh_months(["2024-01"])
    _assert_rollup_equals_full(rollup, pipe.bronze())

    # month 2 lands → refresh only 2024-02; 2024-01 partition untouched
    feb = taxi.filter(F.month("tpep_pickup_datetime") == 2)
    pipe.ingest_batch(feb, MonthWindow(datetime(2024, 2, 1), datetime(2024, 3, 1)))
    rollup.refresh_months(["2024-02"])
    _assert_rollup_equals_full(rollup, pipe.bronze())

    # late data appended into month 1 → partition-wise re-refresh heals it
    late = jan.limit(37)
    late_w = late.withColumn(
        "load_month", F.date_format("tpep_pickup_datetime", "yyyy-MM")
    )
    late_w.write.mode("append").partitionBy("load_month").parquet(pipe.bronze_path)
    rollup.refresh_months(["2024-01"])
    _assert_rollup_equals_full(rollup, pipe.bronze())
    taxi.unpersist()
