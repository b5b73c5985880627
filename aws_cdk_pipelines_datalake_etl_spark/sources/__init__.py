"""Sources: scans the engine reads from (SURVEY §2.2 S1-S3)."""

from aws_cdk_pipelines_datalake_etl_spark.sources.csv_source import read_raw_csv  # noqa: F401
from aws_cdk_pipelines_datalake_etl_spark.sources.sql_text import load_transform_sql  # noqa: F401
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    register_testdata_views,
)
