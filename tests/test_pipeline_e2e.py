"""End-to-end: fixture CSV -> conformed parquet + catalog ->
SQL aggregation -> purpose-built parquet (SURVEY §7 step 1)."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest

from aws_cdk_pipelines_datalake_etl_spark.runner import LakeLayout, PipelineRunner

FIXED_NOW = datetime(2020, 8, 15, 12, 0, 0, tzinfo=timezone.utc)


@pytest.fixture()
def runner(spark, lake_root):
    notifications = []
    r = PipelineRunner(
        spark=spark,
        layout=LakeLayout(lake_root),
        transforms_dir=os.path.join(os.path.dirname(__file__), "..", "transforms"),
        notifier=lambda subject, message: notifications.append((subject, message)),
        clock=lambda: FIXED_NOW,
    )
    r.notifications = notifications
    return r


def test_yellow_end_to_end(spark, runner, yellow_csv, lake_root):
    result = runner.on_file(yellow_csv)
    assert result.status == "SUCCEEDED", result.error_message

    # conformed: 4 valid rows (malformed dropped), ingest-date partitions
    conformed = spark.table("tlc_taxi_data.yellow_taxi_trip_record")
    assert conformed.count() == 4
    row = conformed.limit(1).collect()[0]
    assert (row.year, row.month, row.day) == ("2020", "08", "15")
    # partition directories on disk are hive-style
    part_dir = os.path.join(
        lake_root, "conformed", "yellow_taxi_trip_record", "year=2020", "month=08", "day=15"
    )
    assert os.path.isdir(part_dir)

    # purpose-built aggregate via the shipped SQL semantics
    built = spark.table("tlc_taxi_data_purposebuilt.yellow_taxi_trip_record")
    rows = {
        (r.vendorid, r.pulocationid): r for r in built.collect()
    }
    # group (vendor 1, PU 100): 2 trips, fares 10+20
    g = rows[(1, 100)]
    assert g["count"] == 2
    assert g.total_fare_amount == pytest.approx(30.0)
    # null vendor -> coalesce(-1)
    assert (-1, 101) in rows
    assert rows[(-1, 101)]["count"] == 1

    # audit trail: STARTED then SUCCEEDED, last-event-wins view
    latest = runner.audit.latest_status().collect()
    assert len(latest) == 1
    assert latest[0].job_latest_status == "SUCCEEDED"
    # notification subject is correct (reference swaps these; §1.5-2)
    assert runner.notifications[-1][0] == "Job Completed"


def test_rerun_is_idempotent_dynamic_overwrite(spark, runner, yellow_csv):
    assert runner.on_file(yellow_csv).status == "SUCCEEDED"
    assert runner.on_file(yellow_csv).status == "SUCCEEDED"
    # same partition rewritten, not doubled
    conformed = spark.table("tlc_taxi_data.yellow_taxi_trip_record")
    assert conformed.count() == 4


def test_failure_edge_audits_and_notifies(spark, runner, lake_root):
    key = "tlc_taxi_data/missing_table/nope.csv"
    result = runner.on_file(key)
    assert result.status == "FAILED"
    assert result.error_message
    latest = runner.audit.latest_status().collect()
    assert latest[0].job_latest_status == "FAILED"
    assert latest[0].error_message
    assert runner.notifications[-1][0] == "Job Failed"


def test_watch_processes_files_as_they_arrive(spark, lake_root):
    """The continuous O1 trigger: each poll picks up only newly
    arrived files, each processed exactly once."""
    def write_raw(key: str, header: str, rows: list[str]) -> None:
        path = os.path.join(lake_root, "raw", key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(header + "\n" + "\n".join(rows) + "\n")

    r = PipelineRunner(
        spark=spark,
        layout=LakeLayout(lake_root),
        transforms_dir=os.path.join(os.path.dirname(__file__), "..", "transforms"),
        notifier=lambda s, m: None,
        clock=lambda: FIXED_NOW,
    )
    write_raw("shop/first/a.csv", "id,v", ["1,10"])

    def arrive_second(_seconds: float) -> None:
        write_raw("shop/second/b.csv", "id,v", ["2,20", "3,30"])

    results = r.watch(polls=2, sleep=arrive_second)
    assert [res.params.table_name for res in results] == ["first", "second"]
    assert all(res.status == "SUCCEEDED" for res in results)
    assert spark.table("shop.first").count() == 1
    assert spark.table("shop.second").count() == 2


def test_schema_drift_last_writer_wins(spark, lake_root):
    """Two files of one table inferring different schemas: the catalog
    entry is overwritten per run (reference TableVersion '0' upsert,
    etl_raw_to_conformed.py:147-154) — last writer wins, no merge; the
    earlier partition stays on disk and reads through the new schema."""
    def write_raw(key: str, header: str, rows: list[str]) -> None:
        path = os.path.join(lake_root, "raw", key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(header + "\n" + "\n".join(rows) + "\n")

    now = {"t": datetime(2020, 8, 1, tzinfo=timezone.utc)}
    r = PipelineRunner(
        spark=spark,
        layout=LakeLayout(lake_root),
        transforms_dir=os.path.join(os.path.dirname(__file__), "..", "transforms"),
        notifier=lambda s, m: None,
        clock=lambda: now["t"],
    )
    write_raw("shop/items/day1.csv", "id,qty", ["1,10", "2,20"])
    assert r.on_file("shop/items/day1.csv").status == "SUCCEEDED"
    assert dict(spark.table("shop.items").dtypes)["qty"] in ("int", "bigint")

    # day 2: qty now carries units -> inferred string; a new column appears
    now["t"] = datetime(2020, 8, 2, tzinfo=timezone.utc)
    write_raw("shop/items/day2.csv", "id,qty,color", ['3,"7 kg",red'])
    assert r.on_file("shop/items/day2.csv").status == "SUCCEEDED"
    t = spark.table("shop.items")
    dt = dict(t.dtypes)
    assert dt["qty"] == "string" and "color" in dt  # last writer won
    # both ingest-date partitions remain readable through the new schema
    assert t.count() == 3
    assert {row.day for row in t.select("day").distinct().collect()} == {"01", "02"}


def test_nulltype_column_repaired_to_string(spark, runner, yellow_csv):
    runner.on_file(yellow_csv)
    conformed = spark.table("tlc_taxi_data.yellow_taxi_trip_record")
    # congestion_surcharge was all-empty -> NullType -> cast to string
    assert dict(conformed.dtypes)["congestion_surcharge"] == "string"
