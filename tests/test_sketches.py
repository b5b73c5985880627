"""HLL sketch rollup: mergeability and accuracy (operators/sketches.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aws_cdk_pipelines_datalake_etl_spark.operators.sketches import (
    build_hll_rollup,
    estimate_total,
    merge_hll_rollup,
)
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )


@pytest.fixture(scope="module")
def rollup(events):
    # one fact-table scan -> (day, event_type) sketch table
    df = build_hll_rollup(events, ["day", "event_type"], "user_id")
    df.cache().count()
    return df


def test_rollup_shape(events, rollup):
    keys = events.select("day", "event_type").distinct().count()
    assert rollup.count() == keys
    assert dict(rollup.dtypes)["hll"] == "binary"


def test_merged_estimate_within_error(events, rollup):
    """Union of per-(day,type) sketches answers per-type distinct
    users within HLL error bounds (lgK=12 -> ~1.6% rse; assert 5%)."""
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_hll_rollup(rollup, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)


def test_merge_equals_direct_sketch(events, rollup):
    """Register-wise-max mergeability: unioning the per-day sketches
    gives the SAME estimate as sketching the raw data directly — the
    property that makes the rollup a lossless-for-estimates artifact."""
    merged = estimate_total(rollup).collect()[0]["approx_distinct"]
    direct = (
        build_hll_rollup(events.withColumn("g", F.lit(1)), ["g"], "user_id")
        .select(F.hll_sketch_estimate("hll").alias("e"))
        .collect()[0]["e"]
    )
    assert merged == direct


def test_range_query_from_rollup_only(events, rollup):
    """Arbitrary date-range distinct count served from the rollup."""
    lo, hi = "2024-01-03", "2024-01-10"
    sub = rollup.filter((F.col("day") >= lo) & (F.col("day") <= hi))
    est = estimate_total(sub).collect()[0]["approx_distinct"]
    exact = (
        events.filter((F.col("day") >= lo) & (F.col("day") <= hi))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(est - exact) <= max(2, 0.05 * exact)


# --- Theta: set algebra, exact under nominal entries ----------------------


def test_theta_overlap_exact_under_nominal(spark, events):
    from aws_cdk_pipelines_datalake_etl_spark.operators.sketches import (
        build_theta_rollup,
        theta_overlap,
    )

    rollup = build_theta_rollup(events, ["event_type"], "user_id")
    got = theta_overlap(rollup, "event_type", "view", "purchase").collect()[0]

    viewers = {
        r[0] for r in events.filter(F.col("event_type") == "view")
        .select("user_id").distinct().collect()
    }
    buyers = {
        r[0] for r in events.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().collect()
    }
    # sf0.01 cardinalities are far below 2^15 nominal entries -> exact
    assert got["n_left"] == len(viewers)
    assert got["n_right"] == len(buyers)
    assert got["n_union"] == len(viewers | buyers)
    assert got["n_intersection"] == len(viewers & buyers)
    assert got["n_left_only"] == len(viewers - buyers)


# --- KLL: mergeable quantiles ---------------------------------------------


def test_kll_merged_quantiles_match_exact_within_rank_error(spark, events):
    from aws_cdk_pipelines_datalake_etl_spark.operators.sketches import (
        build_kll_rollup,
        merge_kll_quantiles,
    )

    ev = events
    rollup = build_kll_rollup(ev, ["day", "event_type"], "value")
    got = {
        r["event_type"]: (r["q50"], r["q95"])
        for r in merge_kll_quantiles(
            rollup, ["event_type"], [0.5, 0.95]
        ).collect()
    }
    for etype, (q50, q95) in got.items():
        vals = sorted(
            r[0]
            for r in ev.filter(F.col("event_type") == etype)
            .select("value")
            .collect()
        )
        n = len(vals)
        # k=1600 -> ~0.33% rank error; allow 1% rank slack
        for q, est in ((0.5, q50), (0.95, q95)):
            lo = vals[max(0, int((q - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.01) * n))]
            assert lo <= est <= hi, (etype, q, est, lo, hi)


# --- Count-min: mergeable frequency estimation ----------------------------


def test_cm_overestimates_never_underestimates(spark, events):
    from aws_cdk_pipelines_datalake_etl_spark.operators.sketches import (
        CM_DEPTH,
        CM_WIDTH,
        build_cm_rollup,
        cm_estimate,
    )

    cells = build_cm_rollup(events, "user_id")
    # the summary is bounded by depth*width rows regardless of input
    assert cells.count() <= CM_DEPTH * CM_WIDTH
    est = {
        r.user_id: r.cm_est
        for r in cm_estimate(cells, events.select("user_id"), "user_id").collect()
    }
    true = {
        r.user_id: r.c
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


def test_cm_never_seen_key_estimates_zero_or_collision(spark, events):
    from aws_cdk_pipelines_datalake_etl_spark.operators.sketches import (
        build_cm_rollup,
        cm_estimate,
    )

    cells = build_cm_rollup(events, "user_id")
    probes = spark.createDataFrame([(10**12 + i,) for i in range(50)], ["user_id"])
    ests = [r.cm_est for r in cm_estimate(cells, probes, "user_id").collect()]
    # unseen keys estimate whatever their min cell holds -- with 150
    # true keys in 4x512 cells most probes must land on an empty cell
    assert min(ests) == 0
    assert sum(1 for e in ests if e == 0) >= 40


def test_cm_merge_equals_build_on_union(spark, events):
    from aws_cdk_pipelines_datalake_etl_spark.operators.sketches import (
        build_cm_rollup,
        cm_merge,
    )

    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = {
        (r.d, r.cell): r.cnt
        for r in cm_merge(build_cm_rollup(a, "user_id"), build_cm_rollup(b, "user_id")).collect()
    }
    full = {
        (r.d, r.cell): r.cnt for r in build_cm_rollup(events, "user_id").collect()
    }
    assert merged == full
