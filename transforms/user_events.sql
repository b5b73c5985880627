-- Demonstrates the §2.6 observation end-to-end: the purpose-built
-- job executes ARBITRARY Spark SQL (etl_conformed_to_purposebuilt.py:199),
-- so window functions, not just the reference's GROUP BY shape, flow
-- through the same pipeline.  Running per-user event total alongside
-- each event, partitioned like every purpose-built table.
SELECT event_id,
       user_id,
       amount,
       SUM(amount) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS running_amount,
       year,
       month,
       day
FROM app_events.user_events
