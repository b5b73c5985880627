"""Raw-zone CSV scan (SURVEY §2.2 S1).

Parity with the reference's raw read — header row, comma delimiter,
schema inference, malformed rows dropped
(``lib/glue_scripts/etl_raw_to_conformed.py:180-185``) — with an
explicit-schema fast path for production: at 100 TB, ``inferSchema``
costs a full extra pass over the input, so callers that already know
the schema pass it and get a single-pass scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_raw_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "DROPMALFORMED",
) -> DataFrame:
    """Read a raw CSV file/directory the way the reference job does.

    Parity: etl_raw_to_conformed.py:180-185 (format csv, header true,
    delimiter ',', inferSchema true, mode DROPMALFORMED).
    """
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.load(path)
