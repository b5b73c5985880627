"""Scale-posture operators: salted aggregation, deterministic hash
sampling, approximate aggregates, stream-stream join.

Correctness here means "identical to the naive/exact formulation" —
the whole point of each operator is that it changes the *physical*
strategy (spread the hot key, skip the shuffle, bound the state)
without changing the answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround
from aws_cdk_pipelines_datalake_etl_spark.operators.sampling import hash_sample
from aws_cdk_pipelines_datalake_etl_spark.operators.skew import salted_sum_count
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

from .conftest import SF_DIR_SMOKE


def test_salted_agg_equals_plain_groupby(spark):
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    salted = salted_sum_count(ev, ["event_type"], "value", "event_id", n_salts=16)
    plain = ev.groupBy("event_type").agg(
        pround(F.sum("value"), 2).alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
        pround(F.sum("value") / F.count(F.lit(1)), 6).alias("avg_value"),
    )
    assert sorted(salted.collect()) == sorted(plain.collect())


def test_salted_agg_spreads_hot_key(spark):
    """Stage-1 output must hold >1 partial row per key — i.e. the hot
    key's rows really were split across salts."""
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    salt = (F.crc32(F.col("event_id").cast("string")) % 16).alias("_salt")
    partials = (
        ev.select("event_type", salt)
        .groupBy("event_type", "_salt")
        .count()
        .groupBy("event_type")
        .count()
    )
    assert all(r["count"] > 1 for r in partials.collect())


def test_hash_sample_stable_across_partitioning(spark):
    d = load_table(spark, SF_DIR_SMOKE, "documents")
    ids_1 = {r.doc_id for r in hash_sample(d, "doc_id", 4).select("doc_id").collect()}
    ids_2 = {
        r.doc_id
        for r in hash_sample(d.repartition(17), "doc_id", 4).select("doc_id").collect()
    }
    assert ids_1 == ids_2
    n = d.count()
    # md5 is uniform: 4/16 sample within generous tolerance
    assert 0.15 * n <= len(ids_1) <= 0.35 * n


def test_hash_sample_composes(spark):
    """An 8/16 sample restricted to 4/16 is exactly the 4/16 sample
    (nested prefix ranges) — the property that makes staged
    downsampling reproducible."""
    d = load_table(spark, SF_DIR_SMOKE, "documents")
    nested = hash_sample(hash_sample(d, "doc_id", 8), "doc_id", 4)
    direct = hash_sample(d, "doc_id", 4)
    assert sorted(r.doc_id for r in nested.select("doc_id").collect()) == sorted(
        r.doc_id for r in direct.select("doc_id").collect()
    )


def test_approx_distinct_within_rsd(spark):
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.05 * r["exact"])


def test_approx_quantile_within_accuracy(spark):
    o = load_table(spark, SF_DIR_SMOKE, "orders")
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
            F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert r["approx"] == pytest.approx(r["exact"], rel=0.02)


def test_stream_stream_join_equals_batch(spark):
    import os

    from aws_cdk_pipelines_datalake_etl_spark.streaming.joins import (
        stream_interval_join,
    )

    path = os.path.join(SF_DIR_SMOKE, "events.parquet")
    streamed = stream_interval_join(spark, path)
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("left_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
        F.col("value").alias("right_value"),
    )
    batch = v.join(
        p,
        (v.user_id == p.p_user)
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "left_id", "right_id", "left_ts", "right_ts", "right_value")
    key = lambda r: (r.user_id, r.left_id, r.right_id)  # noqa: E731
    assert sorted(streamed.collect(), key=key) == sorted(batch.collect(), key=key)


def test_dq_checks_catch_injected_violations(spark):
    """Nulls, out-of-range values, duplicate keys, and orphans must
    flip the respective checks to passed=False with the right
    metric values."""
    from aws_cdk_pipelines_datalake_etl_spark.operators import quality as dq

    child = spark.createDataFrame(
        [(1, 0.5), (2, 1.5), (2, 0.2), (None, 0.3)],
        "k int, v double",
    )
    parent = spark.createDataFrame([(1,)], ["pk"])
    rep = {
        (r.check_name, r.target): (r.value, r.passed)
        for r in dq.completeness_and_bounds_report(
            child, ["k"], {"v": (0.0, 1.0)}
        )
        .unionByName(dq.uniqueness_report(child, ["k"]))
        .unionByName(dq.referential_report(child, parent, "k", "pk"))
        .collect()
    }
    assert rep[("completeness", "k")] == (0.75, False)
    assert rep[("bounds", "v")] == (0.75, False)
    # 3 distinct non-null-ish keys of 4 rows (None stringifies empty)
    assert rep[("uniqueness", "k")][1] is False
    # rows with k=2 (x2) are orphans; the null key row is not matched either
    value, passed = rep[("referential", "k->pk")]
    assert passed is False and value == 3.0


def test_aqe_splits_skewed_join_partitions(spark):
    """The engine leaves UNKNOWN-skew handling to AQE (SCALE.md:
    salting is for known-hot keys).  This pins that the session's AQE
    config actually splits a skewed SMJ partition at runtime: 90% of
    the left side shares one key, thresholds are scaled down to the
    test's data size, and the finalized adaptive plan must show the
    skew-handled join — with the result still exact."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.lpad(F.lit("x"), 64, "x").alias("pad"),
        )
        right = spark.range(0, 300_000, 7).select(F.col("id").alias("k"))
        j = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        # 270000 rows match k=0, plus multiples of lcm(10,7)=70: 4286
        assert j.collect()[0]["n"] == 274_286
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_temperature_mix_flattens_mixture(spark):
    """tau=2 moves source shares toward uniform relative to the
    natural mixture, the output is ~target_fraction of the corpus,
    and the kept set is deterministic."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.sampling import (
        temperature_mix,
    )
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

    from tests.conftest import SF_DIR_SMOKE

    # a deliberately skewed mixture (the testdata sources are uniform,
    # where flattening is a no-op): 1600 / 320 / 80 rows
    d = spark.range(2000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 1600 THEN 'web' WHEN id < 1920 THEN 'books' "
        "ELSE 'code' END AS source",
    )
    n = d.count()
    kept = temperature_mix(d, "doc_id", tau=2.0, target_fraction=0.5)
    k1 = {r.doc_id for r in kept.collect()}
    assert k1 == {r.doc_id for r in kept.collect()}  # deterministic
    assert 0.35 * n <= len(k1) <= 0.65 * n  # ~half in expectation
    nat = {r.source: r.n for r in d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    got = {r.source: r.n for r in kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # flattening: tau=2 shrinks the dominant/minority share ratio
    # (sqrt mixture: 20x natural -> ~4.5x expected); generous slack
    # for hash-sampling noise still separates it from no-op
    nat_ratio = max(nat.values()) / min(nat.values())  # 20x
    got_ratio = max(got.values()) / min(got.values())
    assert got_ratio < nat_ratio / 2
    # and the small source is UPWEIGHTED in relative share
    assert got["code"] / len(k1) > nat["code"] / n


def test_mixture_plan_hand_computed(spark):
    """Two sources, hand math: tempered shares flatten toward uniform,
    the keep fractions realize the token budget, small sources cap at
    1.0, and the whole table is layout-invariant."""
    import math

    from aws_cdk_pipelines_datalake_etl_spark.operators.sampling import (
        mixture_plan,
    )

    rows = (
        [(i, "big", "w " * 99 + "w") for i in range(90)]       # 100 tok x 90
        + [(i + 100, "small", "w w w w") for i in range(10)]   # 4 tok x 10
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in mixture_plan(df).collect()}
    big, small = got["big"], got["small"]
    assert big["n_docs"] == 90 and big["n_tokens"] == 9000
    assert small["n_docs"] == 10 and small["n_tokens"] == 40
    wq_big = math.floor(math.sqrt(9000.0) * 1e6 + 0.5)
    wq_small = math.floor(math.sqrt(40.0) * 1e6 + 0.5)
    assert big["weight_micro"] == wq_big
    assert small["weight_micro"] == wq_small
    zq = wq_big + wq_small
    assert big["share_micro"] == wq_big * 1_000_000 // zq
    # tempering flattens: small's tempered share >> its natural share
    assert small["share_micro"] > 40 * 1_000_000 // 9040
    # small source caps at keep 1.0
    small_frac = min(1.0, 0.5 * 9040 * wq_small / (float(zq) * 40))
    assert small_frac == 1.0 and small["keep_frac_micro"] == 1_000_000
    big_frac = min(1.0, 0.5 * 9040 * wq_big / (float(zq) * 9000))
    assert big["keep_frac_micro"] == math.floor(big_frac * 1e6 + 0.5)
    assert big["expected_tokens"] == 9000 * big["keep_frac_micro"] // 1_000_000
    again = {
        (r["source"], r["keep_frac_micro"], r["share_micro"])
        for r in mixture_plan(df.repartition(7)).collect()
    }
    assert again == {
        (s, r["keep_frac_micro"], r["share_micro"]) for s, r in got.items()
    }
