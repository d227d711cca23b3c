-- Gold aggregate views — Spark SQL port of the reference's
-- src/sql/gold_aggregate_layer.sql. Computed on read, exactly like
-- CREATE OR REPLACE VIEW. Month names unpadded (SURVEY §2.8 F4).

CREATE OR REPLACE TEMP VIEW gold_vendor_metrics AS
SELECT
  v.vendor,
  count(*) AS total_trips,
  CAST(sum(yt.total_amount) AS DOUBLE) AS total_revenue,
  round(avg(yt.minute_duration), 2) AS avg_duration_minutes
FROM silver_yellow_taxi yt
LEFT JOIN silver_vendor v ON yt.vendorid = v.vendorid
GROUP BY v.vendor
ORDER BY total_revenue DESC;

CREATE OR REPLACE TEMP VIEW gold_monthly_metrics AS
SELECT
  date_trunc('month', tpep_pickup_datetime) AS month_start,
  date_format(tpep_pickup_datetime, 'MMMM') AS month,
  count(*) AS total_rides,
  round(avg(trip_distance), 2) AS avg_trip_distance,
  round(avg(minute_duration), 2) AS avg_duration_minutes
FROM silver_yellow_taxi
GROUP BY 1, 2
ORDER BY total_rides DESC;

CREATE OR REPLACE TEMP VIEW gold_payment_metrics AS
SELECT
  pt.payment_type AS payment_type_name,
  count(*) AS total_trip_by_payment,
  round(avg(yt.total_amount), 2) AS avg_amount
FROM silver_yellow_taxi yt
LEFT JOIN silver_payment_type pt ON yt.payment_type = pt.payment_type_id
GROUP BY pt.payment_type
ORDER BY total_trip_by_payment DESC;
