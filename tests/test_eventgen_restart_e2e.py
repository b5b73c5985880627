"""Real-checkpoint restart of the parallel Python streaming source:
the exactly-once claim under the call sequences SPARK itself produces,
not a simulated one (ADVICE r4: a fresh reader after a cleanly
committed batch must never regress the offset and re-emit rows).

Each restart constructs a NEW reader instance (fresh in-memory
cursor); the file sink + checkpoint give end-to-end exactly-once, so
any offset regression shows up as duplicate event_ids in the output.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.sources import eventgen


@pytest.mark.streaming
def test_parallel_source_restart_with_checkpoint_no_duplicates(
    spark, tmp_path
):
    eventgen.register_parallel(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        return (
            spark.readStream.format("eventgenpar")
            .option("n", "5000")
            .option("batch_rows", "1100")
            .option("parallelism", "4")
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # run 1: drain the bounded source fully, stop cleanly — the
    # checkpoint now holds a committed offset (5000) far above any
    # fresh reader's in-memory cursor.  (The MID-stream committed-
    # checkpoint restart is the second test below, via a capped first
    # run.)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart 1..2: each constructs a fresh reader whose cursor starts
    # at 0 — the round-4 bug re-offered offsets below the checkpoint
    # here and re-emitted committed rows
    for _ in range(2):
        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    got = spark.read.parquet(out)
    assert got.count() == 5000
    assert got.select("event_id").distinct().count() == 5000
    lo, hi = got.agg(
        F.min("event_id"), F.max("event_id")
    ).collect()[0]
    assert (lo, hi) == (0, 4999)
    # closed form survives the restarts bit-for-bit
    row = got.filter(F.col("event_id") == 4321).collect()[0]
    assert (row.user_id, row.value) == (4321 % 37, (4321 * 4321) % 101)


@pytest.mark.streaming
def test_parallel_source_restart_mid_stream_resumes_forward(spark, tmp_path):
    """Stop after the FIRST non-empty batch (first run capped by a
    small n so it cannot drain everything), then restart with the full
    n: the union of both runs must be exactly 0..n-1 once each."""
    eventgen.register_parallel(spark)
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    name = f"eg_restart_{uuid.uuid4().hex[:6]}"

    def start(n: int):
        return (
            spark.readStream.format("eventgenpar")
            .option("n", str(n))
            .option("batch_rows", "700")
            .option("parallelism", "4")
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .queryName(name)
            .start()
        )

    # first run sees only a prefix of the stream (n=1400 -> 2 batches)
    q = start(1400)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(out).count()
    assert first == 1400

    # reconfigured restart (n=3000): fresh reader, committed checkpoint
    # at 1400 — must resume AT 1400, not 700, not 0
    q = start(3000)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 3000
    assert got.select("event_id").distinct().count() == 3000
