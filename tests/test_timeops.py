"""Event-time normalization (sources/testdata.py): the NTZ wall-clock
epoch must equal naive-datetime arithmetic for ANY wall time, under a
non-UTC session timezone."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import _ntz_wall_micros

EPOCH = datetime(1970, 1, 1)

CASES = [
    datetime(1900, 1, 1, 0, 0, 0),
    datetime(1969, 12, 31, 23, 59, 59, 999999),
    datetime(1970, 1, 1, 0, 0, 0, 1),
    datetime(1972, 2, 29, 12, 0, 0),          # leap day
    datetime(2000, 2, 29, 23, 59, 59, 500000),  # century leap day
    datetime(2024, 3, 10, 2, 30, 0),          # inside a US DST gap
    datetime(2024, 11, 3, 1, 30, 0, 123456),  # ambiguous US DST hour
    datetime(2038, 1, 19, 3, 14, 8),          # past 32-bit time_t
    datetime(2100, 12, 31, 23, 59, 59, 999999),
]


@pytest.mark.parametrize("tz", ["America/Chicago", "Asia/Kolkata"])
def test_ntz_wall_micros_matches_naive_datetime(spark, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = spark.createDataFrame(
            [(i, d.strftime("%Y-%m-%d %H:%M:%S.%f")) for i, d in enumerate(CASES)],
            "i int, s string",
        ).select("i", F.col("s").cast("timestamp_ntz").alias("ts"))
        got = {
            r["i"]: r["eus"]
            for r in df.select("i", _ntz_wall_micros(F.col("ts")).alias("eus")).collect()
        }
        for i, d in enumerate(CASES):
            want = round((d - EPOCH).total_seconds() * 1_000_000)
            # recompute exactly (total_seconds loses ulp on huge values)
            delta = d - EPOCH
            want = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            assert got[i] == want, (d, got[i], want)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_interval_join_bin_boundaries(spark):
    """Points exactly on interval start (inclusive) and end
    (exclusive) and intervals spanning multiple bins all resolve
    exactly; every qualifying pair appears exactly once."""
    from datetime import datetime

    from aws_cdk_pipelines_datalake_etl_spark.operators.rangejoin import (
        interval_join,
    )

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    points = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00")),  # == start: kept
            (2, ts("2024-01-03 00:00:00")),  # == end: excluded
            (3, ts("2024-01-02 13:00:00")),  # mid, second bin
            (4, ts("2024-02-01 00:00:00")),  # no interval
        ],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (10, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
            (11, ts("2024-01-02 12:00:00"), ts("2024-01-02 14:00:00")),
        ],
        ["iid", "w_start", "w_end"],
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "w_start", "w_end", 86400
        ).collect()
    }
    assert got == {(1, 10), (3, 10), (3, 11)}

    # exactly-once: row count equals distinct pair count even though
    # interval 10 spans 3 bins
    rows = interval_join(
        points, intervals, "ts", "w_start", "w_end", 86400
    ).count()
    assert rows == 3
