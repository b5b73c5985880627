"""Gap-fill / forward-fill, stratified sampling, and streaming daily
distinct: semantic invariants beyond the oracle hash-compare.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.sampling import (
    stratified_hash_sample,
)
from aws_cdk_pipelines_datalake_etl_spark.operators.timeseries import (
    gapfill_forward_fill,
)
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

from .conftest import SF_DIR_SMOKE


def _gap_df(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 5), 10.0),
        (1, datetime.datetime(2024, 1, 1, 9), 5.0),
        # 2024-01-02..03 silent
        (1, datetime.datetime(2024, 1, 4, 1), 7.0),
        (2, datetime.datetime(2024, 1, 2, 0), 1.0),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_gapfill_dense_spine_and_carry_forward(spark):
    out = gapfill_forward_fill(_gap_df(spark)).collect()
    by_key = {(r.user_id, str(r.day)): r for r in out}
    # user 1: 4 consecutive days, user 2: 1 day — spine is dense
    assert len(by_key) == 5
    assert by_key[(1, "2024-01-01")].filled_value == 15.0
    assert by_key[(1, "2024-01-01")].is_observed
    # the gap days carry the last observed sum, flagged as filled
    for d in ("2024-01-02", "2024-01-03"):
        assert by_key[(1, d)].filled_value == 15.0
        assert not by_key[(1, d)].is_observed
    assert by_key[(1, "2024-01-04")].filled_value == 7.0
    assert by_key[(2, "2024-01-02")].filled_value == 1.0


def test_gapfill_spine_size_is_keys_times_days(spark):
    """The spine grows with |keys| x |days|, never with event count —
    the property that makes it safe at 100 TB."""
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    out = gapfill_forward_fill(ev)
    expected = (
        ev.groupBy("user_id")
        .agg(F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias("d"))
        .agg(F.sum(F.col("d") + 1))
        .collect()[0][0]
    )
    assert out.count() == expected


def test_stratified_sample_stable_and_proportional(spark):
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    strata = {"view": 2, "purchase": 16}
    s1 = {
        r.event_id
        for r in stratified_hash_sample(ev, "event_id", "event_type", strata)
        .select("event_id")
        .collect()
    }
    s2 = {
        r.event_id
        for r in stratified_hash_sample(
            ev.repartition(13), "event_id", "event_type", strata
        )
        .select("event_id")
        .collect()
    }
    assert s1 == s2
    counts = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    kept = (
        stratified_hash_sample(ev, "event_id", "event_type", strata)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    kept = {r.event_type: r.n for r in kept}
    assert set(kept) <= {"view", "purchase"}  # unlisted strata dropped
    assert kept["purchase"] == counts["purchase"]  # 16/16 keeps all
    assert 0.05 * counts["view"] <= kept["view"] <= 0.25 * counts["view"]


def test_streaming_daily_distinct_equals_batch(spark, tmp_path):
    from aws_cdk_pipelines_datalake_etl_spark.streaming.windowed import (
        streaming_daily_distinct,
    )

    src = str(tmp_path / "ev")
    ev = load_table(spark, SF_DIR_SMOKE, "events").limit(2000)
    ev.write.parquet(src)
    streamed = streaming_daily_distinct(spark, src)
    batch = ev.select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    ).distinct()
    assert sorted(streamed.collect()) == sorted(batch.collect())


def test_ewma_constant_series_is_identity(spark):
    from datetime import datetime

    from aws_cdk_pipelines_datalake_etl_spark.operators.timeseries import (
        ewma_halflife,
    )

    rows = [(i, 1, datetime(2024, 1, 1, 0, i), 7.25) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = ewma_halflife(df)
    assert all(r.ewma_value == 7.25 for r in out.collect())


def test_ewma_weights_recent_values_most(spark):
    from datetime import datetime

    from aws_cdk_pipelines_datalake_etl_spark.operators.timeseries import (
        ewma_halflife,
    )

    # 20 zeros then a single 100: EWMA at the jump = 100 * w0 / sum(w)
    rows = [(i, 1, datetime(2024, 1, 1, 0, i), 0.0) for i in range(20)]
    rows.append((20, 1, datetime(2024, 1, 1, 0, 20), 100.0))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r.event_id: r.ewma_value for r in ewma_halflife(df).collect()}
    # depth 16: w0 = 2^15, full den = 2^16 - 1
    expected = 100.0 * (1 << 15) / ((1 << 16) - 1)
    assert abs(got[20] - expected) <= 1e-6
    assert got[19] == 0.0
