"""Streaming raw-zone conformance (streaming/ingest.py): checkpoint
is the ledger — restarts skip processed files, new files flow."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from aws_cdk_pipelines_datalake_etl_spark.streaming.ingest import stream_conform

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("v", DoubleType()),
        StructField("name", StringType()),
    ]
)
FIXED_NOW = datetime(2020, 8, 15, tzinfo=timezone.utc)


def _write_csv(raw_dir: str, fname: str, rows: list[str]) -> None:
    os.makedirs(raw_dir, exist_ok=True)
    with open(os.path.join(raw_dir, fname), "w") as f:
        f.write("id,v,name\n" + "\n".join(rows) + "\n")


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


@pytest.mark.streaming
def test_stream_conform_exactly_once_across_restart(spark, tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "conformed")
    ckpt = str(tmp_path / "ckpt")

    _write_csv(raw, "a.csv", ["1,10.5,x", "2,20.5,y"])
    _write_csv(raw, "b.csv", ["3,30.5,z"])
    _drain(
        stream_conform(
            spark, raw, out, SCHEMA, ckpt, clock=lambda: FIXED_NOW,
            max_files_per_trigger=1,
        )
    )
    first = spark.read.parquet(out)
    assert first.count() == 3
    # ingest-date partition stamp (R1), hive layout (K1)
    assert os.path.isdir(os.path.join(out, "year=2020", "month=08", "day=15"))

    # restart with the SAME checkpoint: old files must NOT reprocess
    _write_csv(raw, "c.csv", ["4,40.5,w"])
    _drain(
        stream_conform(
            spark, raw, out, SCHEMA, ckpt, clock=lambda: FIXED_NOW
        )
    )
    again = spark.read.parquet(out)
    assert again.count() == 4  # 3 old (once) + 1 new
    assert sorted(
        r["id"] for r in again.select("id").collect()
    ) == [1, 2, 3, 4]
    # content sanity: per-row values survived conformance
    assert (
        again.filter(F.col("id") == 4).select("v").collect()[0][0] == 40.5
    )


@pytest.mark.streaming
def test_available_now_with_lineage(spark, tmp_path):
    """Trigger.AvailableNow drains the backlog in bounded batches and
    terminates by itself; lineage stamps each row's source file."""
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "conformed")
    ckpt = str(tmp_path / "ckpt")
    _write_csv(raw, "a.csv", ["1,10.5,x"])
    _write_csv(raw, "b.csv", ["2,20.5,y", "3,30.5,z"])

    q = stream_conform(
        spark, raw, out, SCHEMA, ckpt, clock=lambda: FIXED_NOW,
        max_files_per_trigger=1, available_now=True, lineage=True,
    )
    assert q.awaitTermination(120), "AvailableNow query did not finish"

    got = spark.read.parquet(out)
    assert got.count() == 3
    by_id = {r["id"]: r["source_file"] for r in got.collect()}
    assert by_id == {1: "a.csv", 2: "b.csv", 3: "b.csv"}


@pytest.mark.streaming
def test_replayed_batch_is_idempotent_even_across_midnight(spark, tmp_path):
    """foreachBatch is at-least-once: simulate the crash-after-write-
    before-checkpoint-commit replay by invoking the batch function
    twice with the SAME batch id — the second run must replace, not
    duplicate, and must reuse the durably recorded ingest-date stamp
    even though the clock has crossed midnight in between."""
    from aws_cdk_pipelines_datalake_etl_spark.streaming.ingest import (
        make_conform_batch,
    )

    out = str(tmp_path / "conformed")
    ckpt = str(tmp_path / "ckpt")
    clock_value = [datetime(2020, 8, 15, 23, 59, tzinfo=timezone.utc)]
    fn = make_conform_batch(out, ckpt, clock=lambda: clock_value[0])

    batch = spark.createDataFrame([(1, 10.5, "x"), (2, 20.5, "y")], SCHEMA)
    fn(batch, 7)
    # crash happened after the write; replay arrives after midnight
    clock_value[0] = datetime(2020, 8, 16, 0, 1, tzinfo=timezone.utc)
    fn(batch, 7)

    got = spark.read.parquet(out)
    assert got.count() == 2, "replay duplicated rows"
    # partition-value inference reads the dirs back as ints
    days = {(int(r["year"]), int(r["month"]), int(r["day"])) for r in got.collect()}
    assert days == {(2020, 8, 15)}, "replay re-stamped a new partition"
    assert not os.path.isdir(os.path.join(out, "year=2020", "month=08", "day=16"))

    # a DIFFERENT batch id appends alongside, untouched by replays
    fn(spark.createDataFrame([(3, 30.5, "z")], SCHEMA), 8)
    assert spark.read.parquet(out).count() == 3
    fn(batch, 7)  # yet another replay of batch 7
    final = spark.read.parquet(out)
    assert final.count() == 3
    assert sorted(r["id"] for r in final.collect()) == [1, 2, 3]
