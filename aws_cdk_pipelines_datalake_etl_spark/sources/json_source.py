"""Raw-zone JSON scan (SURVEY §2.6 source extension).

The reference's raw zone is CSV-only; JSON-lines is the same
operator family (S1) with a different codec.  Same semantics:
header-free schema inference (or explicit schema for the
single-pass production path) and malformed-row dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_raw_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    mode: str = "DROPMALFORMED",
) -> DataFrame:
    reader = spark.read.format("json").option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
