-- Silver full refresh — Spark SQL port of the reference's
-- src/sql/silver_full_refresh_transformation.sql (PL/pgSQL → Spark SQL).
-- Input: temp view `bronze_yellow_taxi_raw`. Outputs: temp views
-- `silver_vendor`, `silver_ratecode`, `silver_payment_type`,
-- `silver_yellow_taxi`.
-- Semantics notes (SURVEY §2.8): duration uses FLOOR (F5), ratecode the
-- text→double→int chain (F6); passenger_count stays text.

CREATE OR REPLACE TEMP VIEW silver_vendor AS
SELECT
  vendorid,
  CASE
    WHEN vendorid = 1 THEN 'Creative Mobile Technologies, LLC'
    WHEN vendorid = 2 THEN 'Curb Mobility, LLC'
    WHEN vendorid = 6 THEN 'Myle Technologies Inc'
    WHEN vendorid = 7 THEN 'Helix'
  END AS vendor
FROM (SELECT DISTINCT vendorid FROM bronze_yellow_taxi_raw);

CREATE OR REPLACE TEMP VIEW silver_ratecode AS
SELECT * FROM VALUES
  (1, 'Standard rate'),
  (2, 'JFK'),
  (3, 'Newark'),
  (4, 'Nassau or Westchester'),
  (5, 'Negotiated fare'),
  (6, 'Group ride'),
  (99, 'Unknown') AS t(ratecodeid, rate);

CREATE OR REPLACE TEMP VIEW silver_payment_type AS
SELECT * FROM VALUES
  (0, 'Flex Fare trip'),
  (1, 'Credit card'),
  (2, 'Cash'),
  (3, 'No charge'),
  (4, 'Dispute'),
  (5, 'Unknown'),
  (6, 'Voided trip') AS t(payment_type_id, payment_type);

CREATE OR REPLACE TEMP VIEW silver_yellow_taxi AS
WITH deduped AS (
  SELECT *,
    ROW_NUMBER() OVER (
      PARTITION BY vendorid, tpep_pickup_datetime, tpep_dropoff_datetime,
        passenger_count, trip_distance, ratecodeid, store_and_fwd_flag,
        pulocationid, dolocationid, payment_type, fare_amount, extra,
        mta_tax, tip_amount, tolls_amount, improvement_surcharge,
        total_amount, congestion_surcharge, airport_fee
      ORDER BY tpep_pickup_datetime, tpep_dropoff_datetime
    ) AS row_dedup
  FROM bronze_yellow_taxi_raw
)
SELECT
  vendorid,
  tpep_pickup_datetime,
  tpep_dropoff_datetime,
  CAST(FLOOR(timestampdiff(SECOND, tpep_pickup_datetime, tpep_dropoff_datetime) / 60) AS INT)
    AS minute_duration,
  passenger_count,
  trip_distance,
  CAST(FLOOR(CAST(ratecodeid AS DOUBLE)) AS INT) AS ratecodeid,
  store_and_fwd_flag,
  pulocationid,
  dolocationid,
  CAST(payment_type AS INT) AS payment_type,
  fare_amount,
  extra,
  mta_tax,
  tip_amount,
  tolls_amount,
  improvement_surcharge,
  total_amount,
  congestion_surcharge,
  airport_fee,
  date_format(tpep_pickup_datetime, 'yyyy-MM') AS pickup_month
FROM deduped
WHERE row_dedup = 1;
