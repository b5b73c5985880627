from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table
from aws_cdk_pipelines_datalake_etl_spark.streaming.windowed import tumbling_window_agg

from tests.conftest import SF_DIR_SMOKE


def test_stream_equals_batch(spark):
    """Driving the finite file source through the streaming plan must
    reproduce the batch aggregation exactly."""
    streamed = tumbling_window_agg(
        spark, os.path.join(SF_DIR_SMOKE, "events.parquet")
    )
    batch = (
        load_table(spark, SF_DIR_SMOKE, "events")
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 2).alias("total_value"),
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert len(s) > 0
