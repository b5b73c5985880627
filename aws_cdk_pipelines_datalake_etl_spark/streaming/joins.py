"""Stream-stream interval join (Tier E streaming surface).

Two watermarked streams joined on an equality key plus an event-time
interval — the attribution shape ("purchase within an hour of a
view").  Both sides carry watermarks and the join condition bounds
how long either side's rows stay in state, so state is finite on an
unbounded stream; with a finite file source nothing is evicted and
the result equals the batch interval join, which the DuckDB oracle
asserts exactly.

Generalizes the reference's event-triggered batch correlation model
(SURVEY §2.5 O1) the same way ``windowed.py`` generalizes its
aggregation job.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_stream(spark: SparkSession, path: str, ts_col: str) -> DataFrame:
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return fix_nanos_timestamps(reader.parquet(path), (ts_col,))


def stream_interval_join(
    spark: SparkSession,
    path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join ``left_type`` events to ``right_type`` events of the same
    user occurring within ``[left.ts, left.ts + horizon]``, as a
    stream-stream join, returning the drained result as a batch
    DataFrame of attribution pairs."""
    src = _read_stream(spark, path, ts_col)
    left = (
        src.filter(F.col("event_type") == left_type)
        .select(
            F.col(key_col).alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col(ts_col).alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    right = (
        src.filter(F.col("event_type") == right_type)
        .select(
            F.col(key_col).alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col(ts_col).alias("right_ts"),
            F.col("value").alias("right_value"),
        )
        .withWatermark("right_ts", watermark)
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        "left_ts",
        "right_ts",
        "right_value",
    )


def stream_static_enrich(
    spark: SparkSession,
    stream_path: str,
    dim: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Stream-static join: each micro-batch of the event stream is
    enriched against a *static* (batch) dimension — Spark plans the
    dim side as a per-batch broadcast, so the join is STATELESS: no
    watermark needed, nothing accumulates, and at 100 TB/day stream
    rates the cost is one broadcast hash probe per event.

    This is the streaming twin of the reference's catalog-table joins
    (SURVEY §2.6 — the declared join surface), demonstrated as a
    keyed rollup over the enriched stream so the finite-source result
    equals the equivalent batch join + GROUP BY (the oracle's claim).
    """
    stream = _read_stream(spark, stream_path, ts_col)
    from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround

    enriched = stream.join(F.broadcast(dim), on=on)
    agg_cols = [c for c in dim.columns if c != on]
    agg = enriched.groupBy(*agg_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        pround(F.sum(value_col), 2).alias("total_value"),
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
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
    return spark.table(name)


def stream_interval_left_join(
    spark: SparkSession,
    path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the hardest watermark
    semantics: matched pairs emit like the inner join, but an
    UNMATCHED left row can only emit (with nulls) once the watermark
    has passed ``left_ts + horizon``, proving no match can still
    arrive.  On a finite source the watermark stalls at
    ``max(ts) - delay``, which would withhold the tail's unmatched
    rows forever — so this driver feeds the data as batch one, then a
    far-future sentinel pair as batch two, advancing the watermark
    past everything; the drained result then equals the BATCH left
    join (the oracle's claim).  Sentinels are tagged OUT-OF-BAND via
    an extra ``__sentinel`` boolean column in the stream schema (the
    real files lack the column, so they read as null -> false) — no
    key-space convention is stolen from the data, so negative user
    ids in real events survive.  Their far-future timestamp already
    guarantees they can't interval-match any real row.
    """
    import shutil
    import tempfile

    import pandas as pd

    batch = spark.read.parquet(path)
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    max_ts = (
        fix_nanos_timestamps(batch, (ts_col,))
        .agg(F.max(ts_col).alias("mx"))
        .collect()[0]["mx"]
    )
    src_dir = tempfile.mkdtemp(prefix="ssleftjoin_")
    if os.path.isfile(path):
        shutil.copy(path, os.path.join(src_dir, "batch0.parquet"))
    else:
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(path, f), os.path.join(src_dir, f))

    from pyspark.sql.types import BooleanType

    from pyspark.sql.types import StructField, StructType

    schema = spark.read.parquet(src_dir).schema
    # Extended read schema: the real files have no __sentinel column,
    # so the parquet reader fills it with null (coalesced to false).
    # Built as a fresh StructType — StructType.add mutates in place,
    # which would silently turn `schema` into the extended schema too.
    stream_schema = StructType(
        list(schema.fields) + [StructField("__sentinel", BooleanType())]
    )
    src = fix_nanos_timestamps(
        spark.readStream.schema(stream_schema).parquet(src_dir), (ts_col,)
    )
    left = (
        src.filter(F.col("event_type") == left_type)
        .select(
            F.col(key_col).alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col(ts_col).alias("left_ts"),
            F.coalesce(F.col("__sentinel"), F.lit(False)).alias("l_sentinel"),
        )
        .withWatermark("left_ts", watermark)
    )
    right = (
        src.filter(F.col("event_type") == right_type)
        .select(
            F.col(key_col).alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col(ts_col).alias("right_ts"),
        )
        .withWatermark("right_ts", watermark)
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    )
    name = f"ssleft_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch two: one sentinel per side, 30 days past the end —
        # the watermark sweep that releases every unmatched left row.
        # Rows are built against the SOURCE file schema (testdata
        # stores ts as nanos-long; other sources as timestamp).
        from pyspark.sql.types import LongType

        sentinel_ts = pd.Timestamp(max_ts) + pd.Timedelta(days=30)
        ts_value = (
            int(sentinel_ts.value)
            if isinstance(schema[ts_col].dataType, LongType)
            else sentinel_ts.to_pydatetime()
        )

        def sentinel_row(event_id: int, event_type: str) -> tuple:
            vals = {
                "event_id": event_id,
                ts_col: ts_value,
                key_col: 0,
                "event_type": event_type,
                "value": 0.0,
                "props": "{}",
                "__sentinel": True,
            }
            return tuple(vals.get(f.name) for f in stream_schema.fields)

        sentinels = spark.createDataFrame(
            [sentinel_row(-1, left_type), sentinel_row(-2, right_type)],
            stream_schema,
        )
        sentinels.coalesce(1).write.mode("append").parquet(src_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .filter(~F.col("l_sentinel"))
        .select(
            F.col("l_user").alias("user_id"),
            "left_id",
            "right_id",
            "left_ts",
            "right_ts",
        )
    )
