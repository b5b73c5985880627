"""Streaming sinks beyond the built-ins: foreachBatch upsert.

The reference's pipeline materializes each run into a queryable
table (etl_conformed_to_purposebuilt.py:205-212).  The streaming
generalization is a change stream continuously MERGEd into a keyed
snapshot — here via ``foreachBatch`` + the batch CDC collapse
(:mod:`..operators.cdc`), the standard pattern when the table format
is plain parquet (a transactional format would use MERGE INTO; the
semantics below are identical).

Each micro-batch: read current snapshot, last-writer-wins merge with
the batch's changes, rewrite atomically (write-aside + rename).  The
merge is one shuffle on the key; the rewrite cost is the snapshot
size — the right trade for snapshot tables that are much smaller
than their change streams (user-state, dimension tables).  Exactly-
once: foreachBatch can replay a batch after failure, but the merge is
idempotent (same key+version wins twice), which is the standard
recipe.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import apply_changes


def upsert_batch_into_parquet(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str,
) -> None:
    """Merge one (micro-)batch of change rows into the parquet
    snapshot at ``table_path`` with last-writer-wins semantics."""
    if os.path.exists(table_path):
        base = spark.read.parquet(table_path)
        merged = apply_changes(base, batch, key_cols, version_col, tiebreak_col)
    else:
        merged = apply_changes(
            batch.limit(0), batch, key_cols, version_col, tiebreak_col
        )
    tmp = table_path.rstrip("/") + "__upserting"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(table_path):
        bak = table_path.rstrip("/") + "__preupsert"
        os.rename(table_path, bak)
        os.rename(tmp, table_path)
        shutil.rmtree(bak)
    else:
        os.rename(tmp, table_path)


def stream_upsert_parquet(
    spark: SparkSession,
    source_path: str,
    table_path: str,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str,
    max_files_per_trigger: int = 1,
    checkpoint_path: str | None = None,
    sink_fn=None,
) -> None:
    """Drive a finite file-source change stream to completion,
    continuously upserting into the parquet snapshot — the streaming
    twin of the batch CDC collapse, which the tests prove it equals.

    ``maxFilesPerTrigger=1`` forces multiple micro-batches over a
    multi-file source, so the merge-per-batch path (not a single
    degenerate batch) is what's exercised.

    ``checkpoint_path`` pins the checkpoint so a crashed run can be
    RESUMED with the same call: the source offsets are transactional
    in the checkpoint and the merge is idempotent, so replaying the
    failed batch converges to the same snapshot (crash-recovery test
    proves it).  ``sink_fn(batch, batch_id)`` overrides the sink for
    fault-injection in tests.
    """
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        upsert_batch_into_parquet(
            spark, batch, table_path, key_cols, version_col, tiebreak_col
        )

    q = (
        stream.writeStream.foreachBatch(sink_fn or _sink)
        .option(
            "checkpointLocation",
            checkpoint_path
            or table_path.rstrip("/") + f"__ckpt_{uuid.uuid4().hex[:8]}",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
