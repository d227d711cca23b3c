"""Driver-visible query for the .sql-script surface (SURVEY §2.11 X4).

The shipped ``sql/silver_full_refresh.sql`` + ``sql/gold_aggregate_layer.sql``
are the Spark SQL port of the reference's PL/pgSQL scripts
(`/root/reference/src/sql/silver_full_refresh_transformation.sql`,
`/root/reference/src/sql/gold_aggregate_layer.sql`). Round 1 proved them
row-identical to the DataFrame pipeline only inside pytest
(`tests/test_sql_scripts.py`); this module exposes the script run as a
registered query so the driver's DuckDB oracle checks X4 directly:
fixture bronze (orders_as_taxi) → run both scripts → return
``gold_vendor_metrics``. The oracle replays the same derivation in
DuckDB SQL (vendor mapping CASE ↔ `element_at` in
``sources/fixture_taxi.py``, full-tuple dedup ≡ the 19-column
ROW_NUMBER keep-first, minute_duration ≡ the FLOOR(secs/60) chain).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..registry import register
from ..sources.fixture_taxi import orders_as_taxi
from ..sources.sql_runner import run_sql_file

SQL_DIR = Path(__file__).resolve().parents[2] / "sql"

# The oracle re-derives the bronze fixture from orders exactly as
# sources/fixture_taxi.py does, dedups on the full 19-column tuple
# (equivalent to the silver script's ROW_NUMBER over all columns — the
# order-by keys are inside the partition key, so keep-first ≡ DISTINCT;
# dropoff ↔ (pickup, dur_min) is bijective so dur_min substitutes), and
# computes gold.vendor_metrics. minute_duration = (o_orderkey % 90 + 1)
# exactly because the trip length is a whole number of minutes.
_ORACLE = """
WITH bronze AS (
  SELECT DISTINCT
    CASE o_orderkey % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 6
                        WHEN 3 THEN 7 ELSE 99 END AS vendorid,
    CAST('2024-' || strftime(o_orderdate, '%m-%d') || ' ' ||
         lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0') || ':15:00'
         AS TIMESTAMP) AS pickup,
    (o_orderkey % 90 + 1) AS dur_min,
    CAST(o_custkey % 5 AS VARCHAR) AS passenger_count,
    CAST(o_totalprice / 1000 AS DECIMAL(18,2)) AS trip_distance,
    CAST(o_orderkey % 6 + 1 AS VARCHAR) || '.0' AS ratecodeid,
    CASE WHEN o_orderkey % 7 = 0 THEN 'Y' ELSE 'N' END AS store_and_fwd_flag,
    o_orderkey % 200 AS pulocationid,
    o_custkey % 200 AS dolocationid,
    o_orderkey % 7 AS payment_type,
    CAST(o_totalprice / 10 AS DECIMAL(18,2)) AS fare_amount,
    CAST(o_totalprice / 100 AS DECIMAL(18,2)) AS extra,
    CAST(o_totalprice / 200 AS DECIMAL(18,2)) AS mta_tax,
    CAST(o_totalprice / 50 AS DECIMAL(18,2)) AS tip_amount,
    CAST(o_totalprice / 400 AS DECIMAL(18,2)) AS tolls_amount,
    CAST(o_totalprice / 500 AS DECIMAL(18,2)) AS improvement_surcharge,
    CAST(o_totalprice / 8 AS DECIMAL(18,2)) AS total_amount,
    CAST(o_totalprice / 300 AS DECIMAL(18,2)) AS congestion_surcharge,
    CAST(o_totalprice / 600 AS DECIMAL(18,2)) AS airport_fee
  FROM orders
  WHERE year(o_orderdate) = 1995
)
SELECT
  CASE vendorid WHEN 1 THEN 'Creative Mobile Technologies, LLC'
                WHEN 2 THEN 'Curb Mobility, LLC'
                WHEN 6 THEN 'Myle Technologies Inc'
                WHEN 7 THEN 'Helix' END AS vendor,
  count(*) AS total_trips,
  CAST(sum(total_amount) AS DOUBLE) AS total_revenue,
  round(avg(dur_min), 2) AS avg_duration_minutes
FROM bronze
GROUP BY 1
ORDER BY total_revenue DESC
"""


@register("sql_scripts_gold_vendor", oracle=_ORACLE, tags=("sqlport", "x4", "gold"))
def sql_scripts_gold_vendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the shipped silver+gold .sql scripts end-to-end over the
    fixture bronze and return ``gold_vendor_metrics`` — the X4 surface
    as an oracle-checked driver query, not just a pytest claim."""
    bronze = orders_as_taxi(spark, sf_dir)
    bronze.createOrReplaceTempView("bronze_yellow_taxi_raw")
    run_sql_file(spark, SQL_DIR / "silver_full_refresh.sql")
    run_sql_file(spark, SQL_DIR / "gold_aggregate_layer.sql")
    return spark.table("gold_vendor_metrics")


@register(
    "monthly_metrics_padded_month",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month_start,
           rpad(monthname(o_orderdate), 9, ' ') AS month,
           count(*) AS total_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY 1, 2
    ORDER BY total_orders DESC
    """,
    tags=("gold", "parity", "date"),
)
def monthly_metrics_padded_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold.monthly_metrics with Postgres ``TO_CHAR('Month')`` 9-char
    month padding (`/root/reference/src/sql/gold_aggregate_layer.sql:17`)
    — the parity twin of the default unpadded ``monthly_metrics``
    (documented divergence, SURVEY §2.8 F4). Both variants are
    oracle-checked; the taxi gold view selects via
    ``create_gold_views(padded_month=True)``."""
    from pyspark.sql import functions as F

    from ..functions.scalars import decimal_sum, month_name, month_start

    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            month_start("o_orderdate").alias("month_start"),
            month_name("o_orderdate", padded=True).alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            decimal_sum("o_totalprice", "total_value"),
        )
        .orderBy(F.desc("total_orders"))
    )
