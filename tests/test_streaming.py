from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table
from aws_cdk_pipelines_datalake_etl_spark.streaming.windowed import tumbling_window_agg

from tests.conftest import SF_DIR_SMOKE


def test_stream_equals_batch(spark):
    """Driving the finite file source through the streaming plan must
    reproduce the batch aggregation exactly."""
    streamed = tumbling_window_agg(
        spark, os.path.join(SF_DIR_SMOKE, "events.parquet")
    )
    batch = (
        load_table(spark, SF_DIR_SMOKE, "events")
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 2).alias("total_value"),
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_session_window_stream_equals_batch(spark):
    """Native session_window: driving the stream must reproduce the
    batch session aggregation (same built-in, batch execution)."""
    from aws_cdk_pipelines_datalake_etl_spark.streaming.windowed import (
        session_window_agg,
    )

    streamed = session_window_agg(
        spark, os.path.join(SF_DIR_SMOKE, "events.parquet")
    )
    batch = (
        load_table(spark, SF_DIR_SMOKE, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_stateful_sessionize_emits_closed_sessions(spark):
    """applyInPandasWithState sessionization: one-batch finite source
    emits every session except each user's last (still open) one."""
    from aws_cdk_pipelines_datalake_etl_spark.streaming.stateful import (
        sessionize_stream,
    )

    out = sessionize_stream(spark, os.path.join(SF_DIR_SMOKE, "events.parquet"))
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }

    ev = load_table(spark, SF_DIR_SMOKE, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sess = (
        ev.withColumn(
            "new_s",
            F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed = sess.join(last_sid, "user_id").filter(F.col("sid") < F.col("max_sid"))
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in closed.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_sessionize_event_time_timeout(spark, tmp_path):
    """The EventTimeTimeout path: when the watermark passes an open
    session's gap deadline, the session is flushed by timeout."""
    import glob
    import shutil

    from pyspark.sql import Row

    from aws_cdk_pipelines_datalake_etl_spark.streaming.stateful import (
        sessionize_stream,
    )

    d = str(tmp_path / "stream")
    os.makedirs(d)

    def stage(rows, name, mtime):
        df = spark.createDataFrame(
            [Row(ts=t, user_id=u, value=v) for t, u, v in rows]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        staging = str(tmp_path / "_s")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(d, name)
        shutil.move(part, dest)
        os.utime(dest, (mtime, mtime))

    # user 1: a closed morning session + an open 15:00 session whose
    # timeout (15:30) is passed once user 2's 20:00 event drives the
    # watermark to 19:00
    stage(
        [
            ("2024-01-01 10:00:00", 1, 1.0),
            ("2024-01-01 10:10:00", 1, 2.0),
            ("2024-01-01 15:00:00", 1, 4.0),
        ],
        "b1.parquet",
        1_000_000_000,
    )
    stage([("2024-01-01 20:00:00", 2, 8.0)], "b2.parquet", 1_000_002_000)

    out = sessionize_stream(spark, d, gap="30 minutes", watermark="1 hour")
    rows = {
        (r.user_id, str(r.session_start), r.n_events, r.total_value)
        for r in out.collect()
    }
    assert (1, "2024-01-01 10:00:00", 2, 3.0) in rows  # closed by gap
    assert (1, "2024-01-01 15:00:00", 1, 4.0) in rows  # flushed by timeout
    # user 2's session is still open (watermark never passed 20:30)
    assert not any(r[0] == 2 for r in rows)


def test_late_data_dropped_beyond_watermark(spark):
    """3-batch watermark replay: delayed rows whose window the
    watermark already finalized must NOT be counted; windows past the
    final watermark must not be emitted."""
    from aws_cdk_pipelines_datalake_etl_spark.streaming.late_data import (
        tumbling_window_late_drop,
    )

    out = tumbling_window_late_drop(
        spark, os.path.join(SF_DIR_SMOKE, "events.parquet")
    )
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    t1 = F.lit("2024-01-15").cast("timestamp")
    b1 = ev.filter((F.col("ts") < t1) & (F.col("event_id") % 11 != 0))
    wm1 = b1.agg(F.max("ts")).first()[0]
    wmf = ev.agg(F.max("ts")).first()[0]
    import datetime

    wm1 -= datetime.timedelta(days=2)
    wmf -= datetime.timedelta(days=2)

    # no emitted window may end past the final watermark
    assert (
        out.filter(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR") > F.lit(wmf)
        ).count()
        == 0
    )
    # windows finalized before wm1: counts must equal the on-time-only
    # aggregation (delayed-slice rows dropped)
    on_time = ev.filter(F.col("event_id") % 11 != 0)
    expected_old = (
        on_time.withColumn(
            "window_start", F.date_trunc("hour", F.col("ts"))
        )
        .filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(wm1))
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got_old = out.filter(
        F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(wm1)
    ).select("window_start", "event_type", "n_events")
    g = {tuple(r) for r in got_old.collect()}
    e = {tuple(r) for r in expected_old.collect()}
    assert g == e and len(g) > 0
    # and at least one delayed row really was dropped
    dropped_candidates = ev.filter(
        (F.col("event_id") % 11 == 0)
        & (F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR") <= F.lit(wm1))
    ).count()
    assert dropped_candidates > 0


def test_stream_upsert_equals_batch_cdc(spark, tmp_path):
    """foreachBatch CDC sink: a multi-file change stream upserted
    micro-batch by micro-batch into a parquet snapshot must end in
    the same state as one batch last-writer-wins collapse over all
    changes."""
    from pyspark.sql import functions as F

    from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import apply_changes
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table
    from aws_cdk_pipelines_datalake_etl_spark.streaming.sinks import (
        stream_upsert_parquet,
    )

    src = str(tmp_path / "changes")
    table = str(tmp_path / "state")
    ev = (
        load_table(spark, SF_DIR_SMOKE, "events")
        .limit(3000)
        .select("user_id", "ts", "event_id", "event_type", "value")
    )
    # several files -> several micro-batches (maxFilesPerTrigger=1)
    ev.repartition(4).write.parquet(src)
    stream_upsert_parquet(
        spark, src, table, ["user_id"], version_col="ts", tiebreak_col="event_id"
    )
    streamed = spark.read.parquet(table)
    all_changes = spark.read.parquet(src)
    expected = apply_changes(
        all_changes.limit(0), all_changes, ["user_id"], "ts", "event_id"
    )
    assert sorted(
        streamed.select("user_id", "event_id").collect()
    ) == sorted(expected.select("user_id", "event_id").collect())
    # one row per key
    assert streamed.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0


def test_upsert_batch_replay_is_idempotent(spark, tmp_path):
    """Replaying the exact same micro-batch into the snapshot (the
    foreachBatch failure-recovery scenario) must leave it unchanged."""
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table
    from aws_cdk_pipelines_datalake_etl_spark.streaming.sinks import (
        upsert_batch_into_parquet,
    )

    table = str(tmp_path / "snap")
    batch = (
        load_table(spark, SF_DIR_SMOKE, "events")
        .limit(500)
        .select("user_id", "ts", "event_id", "value")
    )
    upsert_batch_into_parquet(spark, batch, table, ["user_id"], "ts", "event_id")
    state1 = sorted(map(tuple, spark.read.parquet(table).collect()))
    upsert_batch_into_parquet(spark, batch, table, ["user_id"], "ts", "event_id")
    state2 = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert state1 == state2


def test_stream_upsert_crash_recovery_from_checkpoint(spark, tmp_path):
    """Kill the upsert stream mid-run (fault injected in the second
    micro-batch AFTER its merge was applied — the worst case: work
    done, commit lost), restart with the SAME checkpoint, and the
    final snapshot must equal the clean one-shot run: transactional
    source offsets + idempotent merge = exactly-once state."""
    import pyspark.errors

    from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import apply_changes
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table
    from aws_cdk_pipelines_datalake_etl_spark.streaming.sinks import (
        stream_upsert_parquet,
        upsert_batch_into_parquet,
    )

    src = str(tmp_path / "changes")
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ev = (
        load_table(spark, SF_DIR_SMOKE, "events")
        .limit(2000)
        .select("user_id", "ts", "event_id", "event_type", "value")
    )
    ev.repartition(4).write.parquet(src)

    crashed = {"done": False}

    def crashing_sink(batch, batch_id):
        upsert_batch_into_parquet(
            spark, batch, table, ["user_id"], "ts", "event_id"
        )
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash AFTER merge, before commit")

    try:
        stream_upsert_parquet(
            spark, src, table, ["user_id"], "ts", "event_id",
            checkpoint_path=ckpt, sink_fn=crashing_sink,
        )
        raise AssertionError("expected the injected crash to propagate")
    except (RuntimeError, pyspark.errors.exceptions.base.PySparkException,
            Exception) as exc:
        assert "injected crash" in str(exc)
    assert crashed["done"]

    # resume: same checkpoint; batch 1 replays (idempotent), 2-3 run
    stream_upsert_parquet(
        spark, src, table, ["user_id"], "ts", "event_id", checkpoint_path=ckpt
    )
    recovered = sorted(
        map(tuple, spark.read.parquet(table).select("user_id", "event_id").collect())
    )
    all_changes = spark.read.parquet(src)
    expected = apply_changes(
        all_changes.limit(0), all_changes, ["user_id"], "ts", "event_id"
    )
    assert recovered == sorted(
        map(tuple, expected.select("user_id", "event_id").collect())
    )


def test_tws_distinct_types(spark, tmp_path):
    """transformWithStateInPandas distinct tracker == batch
    COUNT(DISTINCT) under any file split (monotone emissions, max
    taken).  Skips where the protobuf state-server dependency is
    absent; the gate itself must raise a clear ImportError there."""
    import pytest as _pytest

    from aws_cdk_pipelines_datalake_etl_spark.streaming.tws import (
        stream_distinct_types,
        tws_available,
    )

    events = spark.createDataFrame(
        [
            (1, "view"),
            (1, "view"),
            (1, "purchase"),
            (2, "view"),
            (2, "click"),
            (2, "view"),
            (3, "click"),
        ],
        ["user_id", "event_type"],
    ).withColumn("ts", F.current_timestamp())
    path = str(tmp_path / "events")
    events.repartition(3).write.parquet(path)

    if not tws_available():
        with _pytest.raises(ImportError, match="protobuf"):
            stream_distinct_types(spark, path)
        _pytest.skip("protobuf absent: transformWithState gated off")

    got = {
        (r.user_id, r.n_types)
        for r in stream_distinct_types(spark, path).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 1)}
