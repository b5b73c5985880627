"""PySpark-native data-lake analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of ``aws-samples/aws-cdk-pipelines-datalake-etl``
(three-zone S3 data lake: raw CSV -> conformed partitioned Parquet
-> purpose-built SQL aggregates, with catalog upsert + audit), built
Spark-first: the DataFrame/SQL API declares every plan and Catalyst
/ Tungsten execute it.  The AWS control plane (Lambda / Step
Functions / Glue / DynamoDB / SNS) collapses into a local Python
runner; the analytics surface is all of Spark SQL plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns).

Reference parity citations use ``path:line`` into ``/root/reference``.
"""

__version__ = "0.1.0"

from aws_cdk_pipelines_datalake_etl_spark.session import get_spark  # noqa: F401
