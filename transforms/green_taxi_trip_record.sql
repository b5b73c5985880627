-- Purpose-built aggregation for the green-taxi conformed table.
-- Same semantics as the reference transform
-- (/root/reference/lib/glue_scripts/transformation-sql/green_taxi_trip_record.sql:1-19).
-- Note the source table name differs from the SQL file name in the
-- reference too (file = purpose-built table, FROM = conformed table
-- green_taxi_record_data; lookup rule at
-- etl_conformed_to_purposebuilt.py:181-183).
SELECT COUNT(*)                   AS count,
       COALESCE(vendorid, -1)     AS vendorid,
       day,
       month,
       year,
       pulocationid,
       dolocationid,
       payment_type,
       SUM(passenger_count)       AS passenger_count,
       SUM(trip_distance)         AS total_trip_distance,
       SUM(fare_amount)           AS total_fare_amount,
       SUM(extra)                 AS total_extra,
       SUM(tip_amount)            AS total_tip_amount,
       SUM(tolls_amount)          AS total_tolls_amount,
       SUM(total_amount)          AS total_amount
FROM tlc_taxi_data.green_taxi_record_data
GROUP BY vendorid, year, month, day, pulocationid, dolocationid, payment_type
