"""Streaming raw-zone conformance: the reference's O1 trigger as a
real Structured Streaming job (SURVEY §2.5 O1, §2.6 streaming
extension).

``PipelineRunner.watch`` polls the raw zone and keeps its own durable
ledger; this module is the Spark-native alternative: a ``readStream``
file source whose CHECKPOINT is the ledger.  Spark's file-source log
records every processed file exactly once and survives restarts, so
arrival tracking, dedup of re-delivered files, and crash recovery all
come from the engine instead of hand-rolled driver state — the right
trade once arrival rates outgrow a polling loop.

Each micro-batch runs the same conformance transform as the batch job
(partition stamp R1 + NullType repair R3, operators/conform.py) and
appends into the same Hive-partitioned conformed layout (K1).  Append
(not overwrite) because the checkpoint already guarantees each file
is processed once; dynamic partition overwrite would let a replayed
batch clobber a partition other batches also wrote to.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from aws_cdk_pipelines_datalake_etl_spark.operators.conform import (
    repair_null_columns,
    stamp_partitions,
)


def stream_conform(
    spark: SparkSession,
    raw_dir: str,
    conformed_location: str,
    schema: StructType,
    checkpoint_dir: str,
    clock: Callable[[], datetime] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = False,
    lineage: bool = False,
) -> StreamingQuery:
    """Start the streaming conformance job over a raw CSV directory.

    Returns the live ``StreamingQuery``; callers drive it with
    ``processAllAvailable()`` (tests / drain-and-stop), let it run, or
    pass ``available_now=True`` (Trigger.AvailableNow) to process the
    current backlog in bounded batches and stop — the modern
    batch-over-stream pattern: scheduled-job economics with streaming
    checkpoint/exactly-once semantics.  ``max_files_per_trigger``
    bounds per-batch work either way, so one giant backlog cannot
    produce one giant micro-batch.

    ``lineage=True`` stamps each row with its source file from the
    hidden ``_metadata`` column — row-level provenance at the cost of
    one low-cardinality string column (the reference keeps file
    identity only in the audit trail; this carries it into the data).
    """
    clk = clock or (lambda: datetime.now(timezone.utc))
    import pyspark.sql.functions as F

    reader = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.csv(raw_dir)
    if lineage:
        stream = stream.withColumn(
            "source_file", F.col("_metadata.file_name")
        )

    def conform_batch(batch: DataFrame, _batch_id: int) -> None:
        now = clk()
        out = stamp_partitions(
            batch, now.strftime("%Y"), now.strftime("%m"), now.strftime("%d")
        )
        out = repair_null_columns(out)
        (
            out.write.partitionBy("year", "month", "day")
            .mode("append")
            .parquet(conformed_location)
        )

    writer = stream.writeStream.foreachBatch(conform_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
