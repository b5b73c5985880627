-- Purpose-built aggregation for the yellow-taxi conformed table.
-- Same semantics as the reference transform
-- (/root/reference/lib/glue_scripts/transformation-sql/yellow_taxi_trip_record.sql:1-18),
-- restated: per (vendor, ingest-date, locations, payment type) trip
-- counts and monetary sums.  Duplicate GROUP BY keys in the original
-- are dropped (legal but redundant); COALESCE on the grouping column
-- in the SELECT list is kept (valid: vendorid is a grouping column).
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
FROM tlc_taxi_data.yellow_taxi_trip_record
GROUP BY vendorid, year, month, day, pulocationid, dolocationid, payment_type
