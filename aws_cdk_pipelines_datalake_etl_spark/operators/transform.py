"""Job 2: conformed -> purpose-built via declarative SQL (SURVEY §3.3).

Reimplements ``lib/glue_scripts/etl_conformed_to_purposebuilt.py``:
look up ``transforms/<table>.sql`` (S3), execute it with ``spark.sql``
against catalog tables (S2), upsert the output table definition
(partition cols excluded from the regular column list,
etl_conformed_to_purposebuilt.py:107), write partitioned Parquet with
dynamic overwrite, recover partitions.

This is the engine's real query entry point: SQL string -> Catalyst
parse/analyze/optimize -> physical plan.  The engine writes zero
planner/executor code — the declared query surface is all of Spark
SQL (SURVEY §2.6), so joins, windows, set ops, HAVING etc. come for
free and are validated by the oracle harness.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark import catalog
from aws_cdk_pipelines_datalake_etl_spark.params import JobParams
from aws_cdk_pipelines_datalake_etl_spark.sources.sql_text import load_transform_sql


def validate_table(
    spark: SparkSession, database: str, table: str, n: int = 10
) -> DataFrame:
    """R7: the consumer validation query — ``SELECT * FROM db.t LIMIT
    n`` (the reference's documented Athena check, README.md:263-265),
    run against the session catalog.  A LIMIT over parquet plans as a
    CollectLimit that stops after the first file(s) — O(n), not a
    scan."""
    return spark.sql(f"SELECT * FROM `{database}`.`{table}` LIMIT {int(n)}")


def run_sql(spark: SparkSession, sql_text: str) -> DataFrame:
    """Execute one transformation-SQL statement
    (parity: etl_conformed_to_purposebuilt.py:199)."""
    return spark.sql(sql_text)


class TransformResult(NamedTuple):
    table: DataFrame  # the purpose-built catalog table
    n_rows: int  # rows written, observed during the write itself


def transform(
    spark: SparkSession,
    params: JobParams,
    purposebuilt_root: str,
    transforms_dir: str | Path | None = None,
    target_database: str | None = None,
) -> TransformResult:
    """Run the purpose-built job for one conformed table
    (parity: etl_conformed_to_purposebuilt.py:180-212 ``main``).
    The row count is observed during the write (same rationale as
    operators/conform.py: no second scan of the written table)."""
    sql_text = load_transform_sql(params.table_name, transforms_dir)
    df = run_sql(spark, sql_text)

    obs = Observation(f"transform_{params.execution_id or params.table_name}")
    df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))

    database = target_database or params.target_database_name
    location = f"{purposebuilt_root.rstrip('/')}/{params.table_name}"
    (
        df.write.partitionBy("year", "month", "day")
        .format("parquet")
        .mode("overwrite")
        .save(location)
    )
    n_rows = int(obs.get["n_rows"])
    catalog.upsert_table(
        spark,
        df,
        database=database,
        table=params.table_name,
        location=location,
    )
    catalog.recover_partitions(spark, database, params.table_name)
    return TransformResult(
        spark.table(f"`{database}`.`{params.table_name}`"), n_rows
    )
