"""Streaming Python DataSource (sources/eventgen.py): offset
bookkeeping, multi-batch drain, and replay fidelity."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.sources import eventgen


@pytest.mark.streaming
def test_drains_in_multiple_microbatches_exactly_once(spark):
    eventgen.register(spark)
    stream = (
        spark.readStream.format("eventgen")
        .option("n", "5000")
        .option("batch_rows", "1100")
        .load()
    )
    name = f"eventgen_t_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    out = spark.table(name)
    # exactly-once across batches: every index exactly once
    assert out.count() == 5000
    assert out.select("event_id").distinct().count() == 5000
    # and it really was incremental: ceil(5000/1100) = 5 micro-batches
    assert n_batches >= 4
    # closed form holds on a sample row
    row = out.filter(F.col("event_id") == 123).collect()[0]
    assert (row.user_id, row.value) == (123 % 37, (123 * 123) % 101)


def test_read_between_offsets_replays_identically():
    r = eventgen.EventGenStreamReader({"n": "50", "batch_rows": "20"})
    it, end = r.read({"index": 20})
    original = list(it)
    assert end == {"index": 40}
    replay = list(r.readBetweenOffsets({"index": 20}, {"index": 40}))
    assert replay == original == [eventgen.event_row(i) for i in range(20, 40)]
    # drained source reports no new data: same offset back, zero rows
    it2, end2 = r.read({"index": 50})
    assert end2 == {"index": 50} and list(it2) == []
