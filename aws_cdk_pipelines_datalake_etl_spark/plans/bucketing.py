"""Bucketed (pre-shuffled) tables for co-located joins.

The reference's conformed zone is plain partitioned parquet
(``etl_raw_to_conformed.py:216``) — every join over it pays a shuffle
of both sides.  At 100 TB the standing fix for a join that runs every
day on the same key is bucketing: write both tables hash-clustered
(and sorted) by the join key into the same number of buckets, and
Spark's scan planner lines buckets up one-to-one — a sort-merge join
with ZERO exchange on either side, and a following aggregation on the
same key needs no exchange either.

This is the storage-layout half of shuffle elimination; the query
half (broadcast, AQE) is in the registry queries.  Bucketing is a
metastore feature, so these helpers go through ``saveAsTable`` /
``spark.table`` rather than path reads.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Idempotency guard: DROP TABLE alone misses the case where a
    previous session's managed-table directory survived in the
    warehouse while the (per-session, in-memory) catalog forgot the
    table — saveAsTable then fails with LOCATION_ALREADY_EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parsed = urlparse(wh)
    wh_path = parsed.path if parsed.scheme in ("file", "") else None
    if wh_path:
        shutil.rmtree(
            os.path.join(wh_path, table.split(".")[-1].lower()),
            ignore_errors=True,
        )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally per-bucket sorted)
    managed parquet table.  Sorting by the join key lets the
    sort-merge join skip its sort as well."""
    _drop_table_and_location(df.sparkSession, table)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With equal
    bucket counts Spark plans a shuffle-free sort-merge join; the
    plan-quality test asserts the absence of Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
