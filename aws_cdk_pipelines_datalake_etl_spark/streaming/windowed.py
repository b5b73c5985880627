"""Streaming ingest + windowed aggregation (the reference's
event-triggered batch model, SURVEY §2.5 O1, generalized to
Structured Streaming — Tier E).

``readStream`` over a file source -> event-time tumbling window
aggregation -> memory sink.  For tests/oracles the batch of files is
driven to completion synchronously with ``processAllAvailable``; the
identical plan runs unbounded against a real stream with a watermark
bounding state.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround


def tumbling_window_agg(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_size: str = "1 hour",
    watermark: str = "1 day",
    slide: str | None = None,
) -> DataFrame:
    """Run a tumbling-window (or, with ``slide``, hopping-window)
    count+sum over a parquet directory AS A STREAM and return the
    final result as a batch DataFrame.  With ``slide`` each event
    lands in ``window_size / slide`` overlapping windows.

    The watermark bounds state at production scale (late rows beyond
    it are dropped); with a finite file source it never discards, so
    the result equals the batch GROUP BY — which is exactly what the
    oracle asserts.
    """
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
        parquet_schema,
    )

    schema = parquet_schema(spark, path)
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        # the file-stream source wants a directory; point it at the
        # parent and glob just this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream_path = os.path.dirname(path)
    else:
        stream_path = path
    stream = fix_nanos_timestamps(reader.parquet(stream_path), (ts_col,))
    win = (
        F.window(ts_col, window_size, slide)
        if slide
        else F.window(ts_col, window_size)
    )
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum(value_col), 2).alias("total_value"),
        )
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col(key_col),
        "n_events",
        "total_value",
    )


def streaming_daily_distinct(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming deduplication: the distinct (key..., day) set emitted
    incrementally — "which users did what each day", the daily-active
    building block, computed on the stream instead of a batch DISTINCT.

    The dedup key *includes* the event-time day and the watermark is
    set on it, so Spark evicts a day's dedup state once the watermark
    passes it — state is O(distinct keys per ~watermark window), not
    O(all history).  A plain ``dropDuplicates`` on non-time keys would
    grow state forever; that is the trap this operator exists to avoid
    at 100 TB.  With a finite source nothing is evicted early, so the
    result equals batch ``SELECT DISTINCT`` — the oracle's claim.
    """
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream_path = os.path.dirname(path)
    else:
        stream_path = path
    stream = fix_nanos_timestamps(reader.parquet(stream_path), (ts_col,))
    deduped = (
        stream.withColumn("day_ts", F.date_trunc("day", F.col(ts_col)))
        .withWatermark("day_ts", watermark)
        .dropDuplicates([*key_cols, "day_ts"])
    )
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        *key_cols, F.to_date("day_ts").alias("day")
    )


def session_window_agg(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "90 days",
) -> DataFrame:
    """Spark's native gap-based session windows
    (``F.session_window``), driven as a stream over a finite file
    source.  A session spans events whose gaps are < ``gap``; the
    window end is ``last event + gap`` (Spark's definition, which the
    oracle replicates as ``max(ts) + gap``).  State is bounded by the
    watermark in a live deployment; with a finite source the result
    equals the batch session aggregation.
    """
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream_path = os.path.dirname(path)
    else:
        stream_path = path
    stream = fix_nanos_timestamps(reader.parquet(stream_path), (ts_col,))
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum(value_col), 2).alias("total_value"),
        )
    )
    name = f"sessionw_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        F.col(key_col),
        "n_events",
        "total_value",
    )


def streaming_dedup_within_watermark(
    spark: SparkSession,
    path: str,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """``dropDuplicatesWithinWatermark``: streaming dedup whose state
    holds a key only until the watermark passes its event time plus
    the delay — the API for at-least-once upstreams that may redeliver
    an event within a bounded window, without keying state on a time
    bucket (contrast :func:`streaming_daily_distinct`).

    To make the run meaningful the source is read TWICE (two glob
    passes of the same files = a full redelivery); the drained result
    must equal one copy — which the DISTINCT oracle asserts.  State is
    O(keys per watermark window) on an unbounded stream.
    """
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        glob = os.path.basename(path)
        stream_dir = os.path.dirname(path)
    else:
        glob = "*.parquet"
        stream_dir = path

    # two deliveries of every file: copy into a temp dir twice
    import shutil
    import tempfile

    src_dir = tempfile.mkdtemp(prefix="dedupww_")
    for i in (0, 1):
        for f in os.listdir(stream_dir):
            if f == glob or (glob == "*.parquet" and f.endswith(".parquet")):
                shutil.copy(
                    os.path.join(stream_dir, f),
                    os.path.join(src_dir, f"copy{i}_{f}"),
                )

    stream = fix_nanos_timestamps(
        spark.readStream.schema(schema).parquet(src_dir), (ts_col,)
    )
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
    name = f"ddww_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(src_dir, ignore_errors=True)
    return spark.table(name).select(*key_cols, ts_col, "event_type")
