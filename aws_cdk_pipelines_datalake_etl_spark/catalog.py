"""Catalog database/table upsert with the reference's type rules.

The reference drives the Glue Data Catalog through boto3
(``etl_raw_to_conformed.py:58-160``); this engine uses the Spark
session catalog (Hive-metastore semantics built in), so the same
operations are DDL:

- K2 create-database-if-absent  (etl_raw_to_conformed.py:58-87)
- K3 idempotent table upsert with type normalization
  (etl_raw_to_conformed.py:90-160; variant excluding partition cols
  at etl_conformed_to_purposebuilt.py:107)
- K4 partition discovery / RECOVER PARTITIONS
  (etl_raw_to_conformed.py:218-219)

Type-normalization rules (SURVEY §1.2):
1. ``decimal(10,0)`` -> ``int``   (etl_raw_to_conformed.py:103-105)
2. ``NullType``       -> ``string`` (etl_raw_to_conformed.py:106-107)
3. partition columns ``year/month/day`` are always strings
   (etl_raw_to_conformed.py:129-133)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DataType, DecimalType, IntegerType, NullType, StringType

PARTITION_COLS = ("year", "month", "day")


def normalize_type(dt: DataType) -> DataType:
    """Apply the reference's catalog-side type projection rules."""
    if isinstance(dt, DecimalType) and dt.precision == 10 and dt.scale == 0:
        return IntegerType()  # etl_raw_to_conformed.py:103-105
    if isinstance(dt, NullType):
        return StringType()  # etl_raw_to_conformed.py:106-107
    return dt


def create_database_if_absent(
    spark: SparkSession, database: str, location: str | None = None
) -> None:
    """K2: get-else-create database (etl_raw_to_conformed.py:58-87)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`{loc}")


def _column_ddl(df: DataFrame, include_partition_cols: bool) -> str:
    cols = []
    for f in df.schema.fields:
        if f.name.lower() in PARTITION_COLS:
            continue
        cols.append(f"`{f.name}` {normalize_type(f.dataType).simpleString()}")
    if include_partition_cols:
        # partition keys are always string (etl_raw_to_conformed.py:129-133)
        cols.extend(f"`{c}` string" for c in PARTITION_COLS)
    return ", ".join(cols)


def upsert_table(
    spark: SparkSession,
    df: DataFrame,
    database: str,
    table: str,
    location: str,
    partitioned: bool = True,
) -> None:
    """K3: create-or-replace the external table definition.

    The reference overwrites the catalog entry every run
    (TableVersion '0', create-or-update at
    etl_raw_to_conformed.py:147-154) — last-writer-wins schema, no
    evolution.  DROP+CREATE of an EXTERNAL (location-backed) table
    reproduces that exactly without touching data files.
    """
    create_database_if_absent(spark, database)
    spark.sql(f"DROP TABLE IF EXISTS `{database}`.`{table}`")
    cols = _column_ddl(df, include_partition_cols=partitioned)
    partition_clause = (
        f" PARTITIONED BY ({', '.join(PARTITION_COLS)})" if partitioned else ""
    )
    spark.sql(
        f"CREATE TABLE `{database}`.`{table}` ({cols}) USING PARQUET"
        f"{partition_clause} LOCATION '{location}'"
    )


def recover_partitions(spark: SparkSession, database: str, table: str) -> None:
    """K4: register on-disk partitions (etl_raw_to_conformed.py:218-219)."""
    spark.sql(f"ALTER TABLE `{database}`.`{table}` RECOVER PARTITIONS")
