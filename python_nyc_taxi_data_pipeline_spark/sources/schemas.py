"""Explicit StructType schemas — never inferred (SURVEY §1.3).

Mirrors the reference DDL exactly, including its deliberate quirks
(`/root/reference/src/db_setup.py:78-102`): ``passenger_count``,
``ratecodeid`` and ``store_and_fwd_flag`` are TEXT in bronze even
though numeric in the source parquet; silver re-casts ``ratecodeid``
(text→numeric→int) and ``payment_type`` (→int) but leaves
``passenger_count`` as text (`db_setup.py:189`).

Type mapping decisions (SURVEY §1.2): Postgres NUMERIC → Decimal(18,2)
for money/distance; timestamp (no tz) → TimestampNTZType; INTERVAL
runtime → seconds as double; status enum → string.
"""

from __future__ import annotations

from pyspark.sql import types as T

_D = T.DecimalType(18, 2)

BRONZE_TAXI_SCHEMA = T.StructType(
    [
        T.StructField("vendorid", T.IntegerType()),
        T.StructField("tpep_pickup_datetime", T.TimestampNTZType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampNTZType()),
        T.StructField("passenger_count", T.StringType()),  # text, per reference
        T.StructField("trip_distance", _D),
        T.StructField("ratecodeid", T.StringType()),  # text, per reference
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("pulocationid", T.IntegerType()),
        T.StructField("dolocationid", T.IntegerType()),
        T.StructField("payment_type", T.IntegerType()),
        T.StructField("fare_amount", _D),
        T.StructField("extra", _D),
        T.StructField("mta_tax", _D),
        T.StructField("tip_amount", _D),
        T.StructField("tolls_amount", _D),
        T.StructField("improvement_surcharge", _D),
        T.StructField("total_amount", _D),
        T.StructField("congestion_surcharge", _D),
        T.StructField("airport_fee", _D),
    ]
)

# Composite dead-letter key (`db_setup.py:129-137`).
INVALID_RECORDS_KEY = (
    "vendorid",
    "tpep_pickup_datetime",
    "tpep_dropoff_datetime",
    "trip_distance",
    "pulocationid",
    "dolocationid",
    "total_amount",
)

VENDOR_SCHEMA = T.StructType(
    [
        T.StructField("vendorid", T.IntegerType()),
        T.StructField("vendor", T.StringType()),
    ]
)

RATECODE_SCHEMA = T.StructType(
    [
        T.StructField("ratecodeid", T.IntegerType()),
        T.StructField("rate", T.StringType()),
    ]
)

PAYMENT_TYPE_SCHEMA = T.StructType(
    [
        T.StructField("payment_type_id", T.IntegerType()),
        T.StructField("payment_type", T.StringType()),
    ]
)

# Static dim contents (`silver_full_refresh_transformation.sql:15-31`).
RATECODE_ROWS = [
    (1, "Standard rate"),
    (2, "JFK"),
    (3, "Newark"),
    (4, "Nassau or Westchester"),
    (5, "Negotiated fare"),
    (6, "Group ride"),
    (99, "Unknown"),
]

PAYMENT_TYPE_ROWS = [
    (0, "Flex Fare trip"),
    (1, "Credit card"),
    (2, "Cash"),
    (3, "No charge"),
    (4, "Dispute"),
    (5, "Unknown"),
    (6, "Voided trip"),
]

# Vendor decode (`silver_full_refresh_transformation.sql:4-9`).
VENDOR_DECODE = {
    1: "Creative Mobile Technologies, LLC",
    2: "Curb Mobility, LLC",
    6: "Myle Technologies Inc",
    7: "Helix",
}
