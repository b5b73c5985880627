"""Streaming CDC upsert: a change stream merged into a keyed state
table via ``foreachBatch`` — the streaming twin of
:func:`..operators.cdc.apply_changes`.

Without a table format that supports MERGE (no Delta/Iceberg in this
environment), the scale-correct shape is a **bucket-partitioned state
table**: rows live under ``key_bucket=pmod(xxhash64(key), n_buckets)``
and each micro-batch

1. computes the (small) set of buckets its keys touch,
2. reads ONLY those partitions of the current state (partition-pruned
   scan — the untouched 99% of a 100 TB state table is never read),
3. re-resolves latest-per-key over ``current ∪ batch`` (one shuffle,
   bounded by touched-bucket size), and
4. rewrites only the touched buckets via dynamic partition overwrite.

**Idempotent by construction**: the merge is a latest-per-key
resolution, so replaying a batch whose rows are already folded into
the state produces the identical bucket contents — a crash anywhere
between the data write and the checkpoint commit is healed by the
replay, including a crash that overwrote only SOME touched buckets
(each bucket independently converges).  This is the same
exactly-once-effect argument as streaming/ingest.py, but via a
naturally idempotent merge instead of a recorded stamp.

Versioning: last-writer-wins on ``(version_col, tiebreak_col)`` —
NOT on arrival order — so out-of-order and cross-batch-duplicated
change events resolve identically to the batch operator.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import latest_snapshot

BUCKET_COL = "key_bucket"


def with_key_bucket(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))
    )


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current state table (all buckets); empty-dir-safe is the
    caller's concern — use after at least one merged batch."""
    return spark.read.parquet(state_dir)


def make_cdc_merge_batch(
    state_dir: str,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body: merge one micro-batch of change rows
    into the bucket-partitioned state table."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        b = with_key_bucket(batch, key_cols, n_buckets)
        if not os.path.isdir(state_dir) or not any(
            e.startswith(f"{BUCKET_COL}=") for e in os.listdir(state_dir)
        ):
            current = None
        else:
            # collect() here is the touched-bucket LIST — bounded by
            # n_buckets (a config constant), never by data volume
            touched = [
                r[0] for r in b.select(BUCKET_COL).distinct().collect()
            ]
            current = read_state(spark, state_dir).filter(
                F.col(BUCKET_COL).isin(touched)
            )
        merged = latest_snapshot(
            b if current is None else current.unionByName(b),
            key_cols,
            version_col,
            tiebreak_col,
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.repartition(BUCKET_COL)
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(state_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return merge_batch


def stream_cdc_upsert(
    spark: SparkSession,
    changes_path: str,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
    ts_cols: tuple[str, ...] = (),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive a file-source change stream to completion
    (``Trigger.AvailableNow`` — bounded backlog drain with streaming
    semantics) through the bucket-merge, then return the final state."""
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    schema = spark.read.parquet(changes_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(changes_path):
        reader = reader.option("pathGlobFilter", os.path.basename(changes_path))
        stream_path = os.path.dirname(changes_path)
    else:
        stream_path = changes_path
    stream = fix_nanos_timestamps(reader.parquet(stream_path), ts_cols)
    q = (
        stream.writeStream.foreachBatch(
            make_cdc_merge_batch(
                state_dir, key_cols, version_col, tiebreak_col, n_buckets
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(f"cdc_upsert_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination()
    return read_state(spark, state_dir)
