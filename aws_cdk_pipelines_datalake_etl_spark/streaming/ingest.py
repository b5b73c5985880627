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
writes into the same Hive-partitioned conformed layout (K1), extended
with an ``ingest_batch`` partition column.

**Delivery semantics — exactly-once EFFECT via idempotent replay.**
``foreachBatch`` itself is at-least-once: a crash after the write but
before the checkpoint commit replays the batch.  Two mechanisms make
the replay a no-op instead of a duplicate:

1. *Replay-stable partition stamp*: the ingest-date stamp for batch N
   is computed once and durably recorded under
   ``<checkpoint>/batch_stamps/N.txt`` (atomic tmp+rename) BEFORE the
   data write; a replay — even one that crosses midnight — reuses the
   recorded stamp rather than re-reading the clock.
2. *Per-batch dynamic partition overwrite*: rows land under
   ``.../ingest_batch=N`` and the write uses dynamic
   ``partitionOverwriteMode`` — batch N only ever touches its own
   ``ingest_batch=N`` leaf partitions (stamp stability guarantees the
   same leaves on replay), so a replayed write REPLACES its own prior
   output and never clobbers other batches.

Cost at scale: one extra partition level (one leaf dir per
(ingest-date, batch)) and a provenance column consumers may ignore;
in exchange, replays are idempotent without any read-side dedup.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from aws_cdk_pipelines_datalake_etl_spark.operators.conform import (
    repair_null_columns,
    stamp_partitions,
)


def make_conform_batch(
    conformed_location: str,
    checkpoint_dir: str,
    clock: Callable[[], datetime] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the idempotent ``foreachBatch`` function (exposed so tests
    can replay a batch id and assert the no-duplicate guarantee
    without orchestrating a real mid-batch crash)."""
    clk = clock or (lambda: datetime.now(timezone.utc))
    stamps_dir = os.path.join(checkpoint_dir, "batch_stamps")

    def _stable_stamp(batch_id: int) -> tuple[str, str, str]:
        """The (year, month, day) stamp for this batch id — computed
        once, durable, replay-stable (ADVICE r3: a replay after
        midnight must not re-stamp a different partition)."""
        os.makedirs(stamps_dir, exist_ok=True)
        path = os.path.join(stamps_dir, f"{batch_id}.txt")
        if os.path.exists(path):
            with open(path) as f:
                y, m, d = f.read().strip().split("-")
                return y, m, d
        now = clk()
        stamp = now.strftime("%Y-%m-%d")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(stamp)
        os.replace(tmp, path)  # atomic on POSIX
        y, m, d = stamp.split("-")
        return y, m, d

    def conform_batch(batch: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        y, m, d = _stable_stamp(batch_id)
        out = repair_null_columns(stamp_partitions(batch, y, m, d)).withColumn(
            "ingest_batch", F.lit(int(batch_id))
        )
        (
            out.write.partitionBy("year", "month", "day", "ingest_batch")
            # dynamic overwrite only replaces the leaf partitions this
            # batch writes — all keyed by its own ingest_batch=N, so a
            # replay replaces its prior output (idempotent) and cannot
            # touch other batches' partitions
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(conformed_location)
        )

    return conform_batch


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
    checkpoint semantics.  ``max_files_per_trigger`` bounds per-batch
    work either way, so one giant backlog cannot produce one giant
    micro-batch.  Batch writes are idempotent on batch id (see module
    docstring), so the end-to-end effect is exactly-once.

    ``lineage=True`` stamps each row with its source file from the
    hidden ``_metadata`` column — row-level provenance at the cost of
    one low-cardinality string column (the reference keeps file
    identity only in the audit trail; this carries it into the data).
    """
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

    conform_batch = make_conform_batch(conformed_location, checkpoint_dir, clock)
    writer = stream.writeStream.foreachBatch(conform_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
