"""Loaders for the driver-generated TPC-H-ish parquet tables.

Plain ``spark.read.parquet`` scans: columnar, with Catalyst predicate
pushdown and column pruning intact (the same physical access path the
conformed zone uses, SURVEY §2.2 S2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fix_nanos_timestamps(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Convert TIMESTAMP(NANOS) columns read as long (under
    ``spark.sql.legacy.parquet.nanosAsLong``) into proper timestamps,
    truncating ns -> us exactly like engines with microsecond
    timestamps (e.g. DuckDB) do."""
    for c in cols:
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return fix_nanos_timestamps(
        spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for SQL queries."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
