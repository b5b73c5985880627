"""Loaders for the driver-generated TPC-H-ish parquet tables.

Plain ``spark.read.parquet`` scans: columnar, with Catalyst predicate
pushdown and column pruning intact (the same physical access path the
conformed zone uses, SURVEY §2.2 S2).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

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

# Schema cache (round-12 optimization, guide §1/§6 driver overhead):
# ``spark.read.parquet(path)`` re-infers the schema from the file
# footer on EVERY call (~105 ms/call measured on sf0.1 vs ~18 ms with
# an explicit schema).  The testdata tables are immutable per path, so
# the footer-derived schema is pure metadata — cache it per path and
# hand it to the reader explicitly, exactly the posture a production
# deployment gets from its catalog (the reference resolves table
# schemas from the Glue catalog rather than re-reading footers per
# query).  NO DATA is cached: every query still scans the parquet.
_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def parquet_schema(spark: SparkSession, path: str):
    """Footer schema of ``path``, cached on (path, mtime) — the mtime
    key invalidates the entry if anything rewrites the file/dir, so
    non-testdata callers (streaming readers over tmp dirs) are safe
    too."""
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    key = (path, mtime)
    s = _SCHEMA_CACHE.get(key)
    if s is None:
        s = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = s
    return s


def _ntz_wall_micros(c: Column) -> Column:
    """Wall-clock microseconds since 1970-01-01 of a TIMESTAMP_NTZ
    column — pure field decomposition (days since epoch + time of
    day), no timezone anywhere, so the result is identical under ANY
    session timezone, DST included, and correct for pre-1970 values
    (datediff goes negative while time-of-day stays positive — the
    floor semantics epoch arithmetic needs).  Matches DuckDB's
    ``epoch_us(ts)`` on naive timestamps exactly.
    """
    days = F.datediff(F.to_date(c), F.lit("1970-01-01").cast("date")).cast("long")
    tod_us = (
        (F.hour(c).cast("long") * 3600 + F.minute(c).cast("long") * 60)
        * 1_000_000
        + (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
    )
    return days * 86_400_000_000 + tod_us


def fix_nanos_timestamps(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize event-time columns to session-timezone-INDEPENDENT
    TIMESTAMP (instant = the file's wall-clock read as UTC), whatever
    physical type the parquet carries:

    - TIMESTAMP(NANOS) read as long (under
      ``spark.sql.legacy.parquet.nanosAsLong``): ns -> us truncation,
      exactly like microsecond engines (e.g. DuckDB) do;
    - TIMESTAMP_NTZ (Spark 4 reads isAdjustedToUTC=false micros this
      way): converted via wall-clock interval arithmetic, NOT a
      session-tz cast — ``unix_micros``, ``withWatermark``,
      ``F.window`` etc. then work and agree with DuckDB's naive
      timestamps bit-for-bit;
    - TIMESTAMP (LTZ): already fine, untouched.
    """
    for c in cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn(c, F.timestamp_micros(_ntz_wall_micros(F.col(c))))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return fix_nanos_timestamps(
        spark.read.schema(parquet_schema(spark, path)).parquet(path)
    )


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for SQL queries."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
