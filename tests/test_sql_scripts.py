"""The shipped .sql scripts (X4 surface) must reproduce the DataFrame
pipeline exactly: silver SQL ≡ silver_transform, gold SQL ≡ gold views."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_nyc_taxi_data_pipeline_spark.pipeline.taxi import (
    build_dims,
    create_gold_views,
    silver_transform,
)
from python_nyc_taxi_data_pipeline_spark.sources.fixture_taxi import orders_as_taxi
from python_nyc_taxi_data_pipeline_spark.sources.sql_runner import run_sql_file

from tests.conftest import SF_DIR


def test_sql_scripts_match_dataframe_pipeline(spark):
    bronze = orders_as_taxi(spark, SF_DIR).cache()
    bronze.createOrReplaceTempView("bronze_yellow_taxi_raw")

    run_sql_file(spark, "/root/repo/sql/silver_full_refresh.sql")
    run_sql_file(spark, "/root/repo/sql/gold_aggregate_layer.sql")

    # silver parity
    sql_silver = spark.table("silver_yellow_taxi")
    df_silver = silver_transform(bronze)
    assert sorted(sql_silver.columns) == sorted(df_silver.columns)
    assert sql_silver.count() == df_silver.count()
    assert (
        sql_silver.select(*sorted(sql_silver.columns))
        .exceptAll(df_silver.select(*sorted(df_silver.columns)))
        .count()
        == 0
    )

    # gold parity: capture SQL-view results before the DataFrame path
    # overwrites the same view names
    sql_vendor = spark.table("gold_vendor_metrics").collect()
    sql_monthly = spark.table("gold_monthly_metrics").collect()

    dims = build_dims(spark, bronze)
    create_gold_views(spark, df_silver, dims)
    df_vendor = spark.sql("SELECT * FROM gold_vendor_metrics").collect()
    df_monthly = spark.sql("SELECT * FROM gold_monthly_metrics").collect()

    def norm(rows):
        return sorted(
            (tuple(r) for r in rows),
            key=lambda t: tuple((x is None, str(x)) for x in t),
        )

    assert norm(sql_vendor) == norm(df_vendor)
    assert norm(sql_monthly) == norm(df_monthly)
    bronze.unpersist()
