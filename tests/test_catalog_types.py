"""Catalog-side type projection rules (SURVEY §1.2; catalog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    NullType,
    StringType,
)

from aws_cdk_pipelines_datalake_etl_spark.catalog import (
    normalize_type,
    upsert_table,
)


def test_normalize_type_rules():
    # rule 1: decimal(10,0) -> int (etl_raw_to_conformed.py:103-105)
    assert normalize_type(DecimalType(10, 0)) == IntegerType()
    # other decimals untouched
    assert normalize_type(DecimalType(12, 2)) == DecimalType(12, 2)
    assert normalize_type(DecimalType(10, 2)) == DecimalType(10, 2)
    # rule 2: NullType -> string (etl_raw_to_conformed.py:106-107)
    assert normalize_type(NullType()) == StringType()
    # everything else is identity
    assert normalize_type(DoubleType()) == DoubleType()


def test_upsert_applies_rules_to_catalog(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.range(3).select(
        F.col("id").cast(DecimalType(10, 0)).alias("dec10"),
        F.col("id").cast(DecimalType(12, 2)).alias("dec12"),
        F.col("id").cast("double").alias("dbl"),
    )
    df.write.mode("overwrite").parquet(loc)
    upsert_table(
        spark, df, database="cat_rules_db", table="t", location=loc,
        partitioned=False,
    )
    dtypes = dict(spark.table("cat_rules_db.t").dtypes)
    assert dtypes["dec10"] == "int"
    assert dtypes["dec12"] == "decimal(12,2)"
    assert dtypes["dbl"] == "double"
    spark.sql("DROP TABLE cat_rules_db.t")
    spark.sql("DROP DATABASE cat_rules_db")
