"""Streaming Python DataSource (sources/eventgen.py): offset
bookkeeping, multi-batch drain, and replay fidelity."""

from __future__ import annotations

import os
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
    # a checkpoint offset beyond a reconfigured (smaller) n must not
    # regress: end == start, zero rows
    it3, end3 = r.read({"index": 70})
    assert end3 == {"index": 70} and list(it3) == []


def test_parallel_reader_plans_executor_slices():
    r = eventgen.EventGenParallelStreamReader(
        {"n": "5000", "batch_rows": "1100", "parallelism": "4"}
    )
    assert r.initialOffset() == {"index": 0}
    # latestOffset claims bounded chunks and drains to n, then goes quiet
    claims = [r.latestOffset()["index"] for _ in range(7)]
    assert claims == [1100, 2200, 3300, 4400, 5000, 5000, 5000]
    parts = r.partitions({"index": 1100}, {"index": 2200})
    assert [(p.start, p.end) for p in parts] == [
        (1100, 1375), (1375, 1650), (1650, 1925), (1925, 2200)
    ]
    # slices cover the range exactly once; executor read reproduces rows
    rows = [row for p in parts for row in r.read(p)]
    assert rows == [eventgen.event_row(i) for i in range(1100, 2200)]
    # empty range -> no partitions (Spark calls with start == end)
    assert r.partitions({"index": 5000}, {"index": 5000}) == []
    # commit past the cursor re-syncs it (restart resilience)
    r2 = eventgen.EventGenParallelStreamReader({"n": "50", "batch_rows": "20"})
    r2.commit({"index": 40})
    assert r2.latestOffset()["index"] == 50


def test_parallel_reader_restart_after_committed_checkpoint():
    """A fresh reader for a RESTARTED query never regresses the offset.

    Restart sequences Spark can produce on a new reader instance
    (initialOffset is only called when there is no checkpoint):

    1. cleanly committed last batch -> first call is latestOffset().
       The stale in-memory cursor (0) must NOT be offered: the reader
       has no way to learn the checkpointed start (e.g. 3300), so it
       must claim an offset >= any possible checkpoint — the full n.
    2. uncommitted last batch -> first call is partitions(start, end)
       replay, which syncs the cursor; chunked pacing then resumes
       from the checkpoint, not from 0.
    """
    # case 1: committed checkpoint at 3300; no initialOffset call
    r = eventgen.EventGenParallelStreamReader(
        {"n": "5000", "batch_rows": "1100", "parallelism": "4"}
    )
    end = r.latestOffset()["index"]
    assert end >= 3300  # never below any committable checkpoint
    # the batch Spark now plans is (3300, end): forward-only rows
    parts = r.partitions({"index": 3300}, {"index": end})
    rows = [row for p in parts for row in r.read(p)]
    assert rows == [eventgen.event_row(i) for i in range(3300, end)]
    # subsequent planning stays monotone and drains
    assert r.latestOffset()["index"] == 5000

    # case 2: uncommitted replay syncs the cursor before planning
    r2 = eventgen.EventGenParallelStreamReader(
        {"n": "5000", "batch_rows": "1100", "parallelism": "4"}
    )
    replay = r2.partitions({"index": 2200}, {"index": 3300})
    assert [(p.start, p.end) for p in replay][0][0] == 2200
    # next chunk claims from the synced cursor — never 1100
    assert r2.latestOffset()["index"] == 4400


@pytest.mark.streaming
def test_parallel_stream_equals_simple_stream(spark):
    eventgen.register(spark)
    eventgen.register_parallel(spark)
    results = []
    for fmt in ("eventgen", "eventgenpar"):
        stream = (
            spark.readStream.format(fmt)
            .option("n", "3000").option("batch_rows", "800")
            .load()
        )
        name = f"cmp_{fmt}_{uuid.uuid4().hex[:6]}"
        q = (stream.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        results.append({tuple(r) for r in spark.table(name).collect()})
    assert results[0] == results[1] and len(results[0]) == 3000


def test_jsonl_sink_two_phase_commit_and_replay(tmp_path):
    from pyspark.sql import Row

    from aws_cdk_pipelines_datalake_etl_spark.sources import jsonl_sink

    path = str(tmp_path / "sink")
    w = jsonl_sink.JsonlDirStreamWriter({"path": path})
    # task writes stage, nothing visible
    m1 = w.write(iter([Row(event_id=1, user_id=1, value=10)]))
    m2 = w.write(iter([Row(event_id=2, user_id=2, value=20)]))
    assert m1.rows == 1 and os.path.exists(m1.path)
    assert not os.path.exists(os.path.join(path, "batch=0"))
    # commit publishes atomically with a marker
    w.commit([m1, m2], batchId=0)
    assert os.path.exists(os.path.join(path, "batch=0", "_COMMIT"))
    files = sorted(os.listdir(os.path.join(path, "batch=0")))
    assert files == ["_COMMIT", "part-00000.jsonl", "part-00001.jsonl"]
    # replayed batch: marker detected, re-delivered staging discarded
    m3 = w.write(iter([Row(event_id=1, user_id=1, value=10)]))
    w.commit([m3], batchId=0)
    assert not os.path.exists(m3.path)
    assert sorted(os.listdir(os.path.join(path, "batch=0"))) == files
    # abort leaves nothing visible
    m4 = w.write(iter([Row(event_id=9, user_id=9, value=90)]))
    w.abort([m4], batchId=1)
    assert not os.path.exists(m4.path)
    assert not os.path.exists(os.path.join(path, "batch=1"))


def test_jsonl_sink_reader_ignores_uncommitted(spark, tmp_path):
    from pyspark.sql import Row

    from aws_cdk_pipelines_datalake_etl_spark.sources import jsonl_sink

    path = str(tmp_path / "sink2")
    w = jsonl_sink.JsonlDirStreamWriter({"path": path})
    w.commit([w.write(iter([Row(event_id=1, user_id=1, value=10)]))], batchId=0)
    # a half-published batch dir WITHOUT a marker must be invisible
    bad = os.path.join(path, "batch=1")
    os.makedirs(bad)
    with open(os.path.join(bad, "part-00000.jsonl"), "w") as f:
        f.write('{"event_id": 99, "user_id": 99, "value": 99}\n')
    back = jsonl_sink.read_committed(spark, path)
    assert [r.event_id for r in back.collect()] == [1]


def test_jsonl_batch_writer_roundtrip(spark, tmp_path):
    from aws_cdk_pipelines_datalake_etl_spark.sources import jsonl_sink

    jsonl_sink.register(spark)
    path = str(tmp_path / "bsink")
    df = spark.range(100).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "id * 3 AS value"
    )
    df.write.format("jsonldir").option("path", path).mode("append").save()
    job_dirs = [d for d in os.listdir(path) if d.startswith("batch=job-")]
    assert len(job_dirs) == 1
    assert os.path.exists(os.path.join(path, job_dirs[0], "_COMMIT"))
    back = jsonl_sink.read_committed(spark, path)
    assert back.count() == 100
    assert back.selectExpr("sum(value)").collect()[0][0] == sum(
        i * 3 for i in range(100)
    )
    # overwrite replaces the published data
    df.limit(10).write.format("jsonldir").option("path", path).mode(
        "overwrite"
    ).save()
    assert jsonl_sink.read_committed(spark, path).count() == 10


def test_jsonl_batch_append_jobs_never_collide(spark, tmp_path):
    """Two append jobs publish into job-unique dirs: the second must
    not clobber the first's part files or marker (the round-4 bug:
    both jobs wrote data/part-00000.jsonl... from index 0)."""
    from aws_cdk_pipelines_datalake_etl_spark.sources import jsonl_sink

    jsonl_sink.register(spark)
    path = str(tmp_path / "asink")
    a = spark.range(50).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "id AS value"
    )
    b = spark.range(50, 80).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "id AS value"
    )
    a.write.format("jsonldir").option("path", path).mode("append").save()
    b.write.format("jsonldir").option("path", path).mode("append").save()
    job_dirs = [d for d in os.listdir(path) if d.startswith("batch=job-")]
    assert len(job_dirs) == 2
    back = jsonl_sink.read_committed(spark, path)
    assert back.count() == 80
    assert back.select("event_id").distinct().count() == 80
    # stage dir left clean (orphan sweep)
    staged = os.path.join(path, ".staged")
    assert not os.path.isdir(staged) or os.listdir(staged) == []


def test_jsonl_stream_commit_sweeps_orphaned_staging(tmp_path):
    """A failed task attempt's staged file (no surviving commit
    message) is swept at commit — .staged/ must not leak files on a
    long-running stream."""
    from pyspark.sql import Row

    from aws_cdk_pipelines_datalake_etl_spark.sources import jsonl_sink

    path = str(tmp_path / "osink")
    w = jsonl_sink.JsonlDirStreamWriter({"path": path})
    m_ok = w.write(iter([Row(event_id=1, user_id=1, value=10)]))
    # simulate a failed attempt: staged file exists, message lost
    m_dead = w.write(iter([Row(event_id=2, user_id=2, value=20)]))
    assert os.path.exists(m_dead.path)
    w.commit([m_ok], batchId=0)
    assert not os.path.exists(m_dead.path)
    assert os.listdir(os.path.join(path, ".staged")) == []
    # published batch holds only the surviving message's rows
    files = sorted(os.listdir(os.path.join(path, "batch=0")))
    assert files == ["_COMMIT", "part-00000.jsonl"]


def test_jsonl_batch_concurrent_jobs_staging_isolated(spark, tmp_path):
    """Two in-flight batch jobs stage under job-scoped dirs: one job's
    commit (which sweeps ITS staging wholesale) must not touch the
    other's staged-but-uncommitted files."""
    from pyspark.sql import Row

    from aws_cdk_pipelines_datalake_etl_spark.sources import jsonl_sink

    path = str(tmp_path / "csink")
    a = jsonl_sink.JsonlDirBatchWriter({"path": path}, overwrite=False)
    b = jsonl_sink.JsonlDirBatchWriter({"path": path}, overwrite=False)
    ma = a.write(iter([Row(event_id=1, user_id=1, value=10)]))
    mb = b.write(iter([Row(event_id=2, user_id=2, value=20)]))
    a.commit([ma])  # sweeps only a's staging root
    assert os.path.exists(mb.path)
    b.commit([mb])
    back = jsonl_sink.read_committed(spark, path)
    assert {r.event_id for r in back.collect()} == {1, 2}
    # both staging roots gone after their commits
    staged = os.path.join(path, ".staged")
    assert not os.path.isdir(staged) or os.listdir(staged) == []


def test_parallel_reader_rejects_backward_batch():
    """A strictly backward batch (checkpoint beyond a reconfigured
    smaller n) must fail LOUD: silently WALing the regressed end would
    replay already-delivered rows on a later restart with n restored."""
    r = eventgen.EventGenParallelStreamReader({"n": "1400", "batch_rows": "700"})
    with pytest.raises(ValueError, match="exceeds the configured n"):
        r.partitions({"index": 3300}, {"index": 1400})
    # empty (start == end) batches remain fine
    assert r.partitions({"index": 1400}, {"index": 1400}) == []
