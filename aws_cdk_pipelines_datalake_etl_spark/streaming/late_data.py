"""Watermark semantics made testable: a deterministic three-micro-batch
replay that exercises late-row DROPPING, late-row ACCEPTANCE within the
watermark, and append-mode window finalization (Tier E; the reference
is batch-only, SURVEY §2.6).

Spark keeps two watermark values per micro-batch (empirically verified
here on 4.1.2, matching ``WatermarkTracker``): input rows are filtered
with the PREVIOUS batch's watermark, while state eviction/emission uses
the CURRENT one.  A two-batch feed therefore never drops anything —
the late rows merge into not-yet-evicted windows.  Three batches pin
every path:

- batch 1 — early on-time rows (``ts < t1``, minus a "delayed" slice
  ``event_id % late_mod == 0``): establishes watermark
  ``wm1 = max(batch1.ts) - delay``.
- batch 2 — middle on-time rows (``t1 <= ts < t2``, minus the slice):
  at its end, windows ending before ``wm2 = max(ts so far) - delay``
  are emitted and evicted.
- batch 3 — the delayed slice (all timestamps) plus the tail
  (``ts >= t2``): delayed rows whose window end <= ``wm1`` find their
  window evicted and are DROPPED; delayed rows inside the watermark
  are aggregated normally.
- final no-data batch — flushes windows up to
  ``wm_final = max(all ts) - delay``.

Every rule is a plain SQL predicate over the source table — the oracle
replays the batching arithmetic exactly (boundary operators calibrated
empirically: drop when ``window_end <= wm1``, emit when
``window_end <= wm_final``).

Micro-batch order is forced with ``maxFilesPerTrigger=1`` + staged
file modification times.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround


def _stage_single_file(df: DataFrame, directory: str, name: str, mtime: int) -> None:
    tmp = os.path.join(directory, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(directory, name)
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def tumbling_window_late_drop(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_size: str = "1 hour",
    delay: str = "2 days",
    t1: str = "2024-01-15",
    t2: str = "2024-01-25",
    late_mod: int = 11,
) -> DataFrame:
    """Tumbling count+sum with a real watermark over a deterministic
    3-batch replay; returns the append-mode emitted windows."""
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    src = fix_nanos_timestamps(spark.read.parquet(path), (ts_col,))
    ts = F.col(ts_col)
    delayed = F.col("event_id") % late_mod == 0
    in1 = (ts < F.lit(t1).cast("timestamp")) & ~delayed
    in2 = (
        (ts >= F.lit(t1).cast("timestamp"))
        & (ts < F.lit(t2).cast("timestamp"))
        & ~delayed
    )

    stream_dir = tempfile.mkdtemp(prefix="late_stream_")
    try:
        _stage_single_file(src.filter(in1), stream_dir, "b1.parquet", 1_000_000_000)
        _stage_single_file(src.filter(in2), stream_dir, "b2.parquet", 1_000_002_000)
        _stage_single_file(
            src.filter(~in1 & ~in2), stream_dir, "b3.parquet", 1_000_004_000
        )

        schema = spark.read.parquet(os.path.join(stream_dir, "b1.parquet")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        agg = (
            stream.withWatermark(ts_col, delay)
            .groupBy(F.window(ts_col, window_size).alias("win"), F.col(key_col))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                pround(F.sum(value_col), 2).alias("total_value"),
            )
        )
        name = f"late_out_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.table(name).select(
            F.col("win.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "total_value",
        )
        # materialize before the staged files are deleted
        out = out.cache()
        out.count()
        return out
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
