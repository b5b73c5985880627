"""Storage-layout operators: bucketed co-located joins, small-file
compaction, CDC upsert, salted join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import apply_changes
from aws_cdk_pipelines_datalake_etl_spark.operators.maintenance import (
    compact_parquet_dir,
)
from aws_cdk_pipelines_datalake_etl_spark.operators.skew import salted_join
from aws_cdk_pipelines_datalake_etl_spark.plans.bucketing import (
    colocated_join,
    write_bucketed,
)
from aws_cdk_pipelines_datalake_etl_spark.plans.explain import formatted_plan
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

from .conftest import SF_DIR_SMOKE


def test_bucketed_join_has_zero_exchanges(spark):
    """Same-bucketed tables must sort-merge join AND aggregate on the
    bucket key with NO exchange anywhere — the layout pre-paid the
    shuffle once at write time."""
    write_bucketed(
        load_table(spark, SF_DIR_SMOKE, "customer").withColumnRenamed(
            "c_custkey", "custkey"
        ),
        "t_bkt_c",
        ["custkey"],
        4,
        sort_cols=["custkey"],
    )
    write_bucketed(
        load_table(spark, SF_DIR_SMOKE, "orders").withColumnRenamed(
            "o_custkey", "custkey"
        ),
        "t_bkt_o",
        ["custkey"],
        4,
        sort_cols=["custkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = (
            colocated_join(spark, "t_bkt_c", "t_bkt_o", on=["custkey"])
            .groupBy("custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan
        assert ") Exchange" not in plan
        # and it's not just a plan: result matches the plain join
        plain = (
            load_table(spark, SF_DIR_SMOKE, "customer")
            .join(
                load_table(spark, SF_DIR_SMOKE, "orders"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .groupBy(F.col("c_custkey").alias("custkey"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(df.collect()) == sorted(plain.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_c")
        spark.sql("DROP TABLE IF EXISTS t_bkt_o")


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "smallfiles")
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    ev.repartition(40).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 40
    before = ev.count()
    n_after = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    assert n_after == 1
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    assert sorted(r.event_id for r in after_df.select("event_id").collect()) == sorted(
        r.event_id for r in ev.select("event_id").collect()
    )


def test_apply_changes_upsert(spark):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k int, v int, payload string"
    )
    changes = spark.createDataFrame(
        [(2, 20, "b2"), (3, 5, "c")], "k int, v int, payload string"
    )
    out = apply_changes(base, changes, ["k"], version_col="v", tiebreak_col="payload")
    got = {r.k: (r.v, r.payload) for r in out.collect()}
    assert got == {1: (10, "a"), 2: (20, "b2"), 3: (5, "c")}


def test_apply_changes_tiebreak_is_deterministic(spark):
    base = spark.createDataFrame([(1, 10, "x")], "k int, v int, payload string")
    changes = spark.createDataFrame([(1, 10, "y")], "k int, v int, payload string")
    out = apply_changes(base, changes, ["k"], version_col="v", tiebreak_col="payload")
    assert [(r.k, r.payload) for r in out.collect()] == [(1, "y")]


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR_SMOKE, "lineitem")
    s = load_table(spark, SF_DIR_SMOKE, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    salted = salted_join(li, s, key="l_suppkey", id_col="l_orderkey", n_salts=8)
    plain = li.join(s, on="l_suppkey")
    cols = ["l_orderkey", "l_linenumber", "s_name"]
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )
    # the physical join key must carry the salt
    assert "_salt" in formatted_plan(salted)


def test_dynamic_partition_pruning_on_partitioned_lake(spark, tmp_path):
    """A fact table partitioned on the reference's year/month/day-style
    key must prune partitions at RUNTIME when joined to a filtered
    dimension: the pushed condition only materializes after the dim
    side is evaluated, which is exactly what keeps a 100 TB
    date-partitioned lake from full-scanning on every dim-filtered
    join."""
    from pyspark.sql import functions as F

    from aws_cdk_pipelines_datalake_etl_spark.plans.explain import formatted_plan
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

    fact_path = str(tmp_path / "ev_part")
    dim_path = str(tmp_path / "day_dim")
    ev = load_table(spark, SF_DIR_SMOKE, "events").withColumn("day", F.to_date("ts"))
    ev.write.partitionBy("day").parquet(fact_path)
    # the dim must live on disk and carry an explicitly *selective*
    # predicate (a comparison — a bare boolean column doesn't count
    # as selective to the DPP heuristic)
    (
        ev.select("day")
        .distinct()
        .withColumn(
            "vol_class", F.when(F.dayofmonth("day") <= 3, "high").otherwise("low")
        )
        .write.parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)
    joined = (
        fact.join(dim.filter(F.col("vol_class") == "high"), "day")
        .groupBy("day")
        .count()
    )
    plan = formatted_plan(joined)
    assert "dynamicpruningexpression" in plan.lower(), plan


def test_sorted_write_produces_skippable_file_ranges(spark, tmp_path):
    """Writing repartitioned-by-range + sorted-within-partitions on the
    filter column must yield parquet files whose min/max ranges are
    (near-)disjoint — the footer-stats layout that lets a selective
    filter skip whole files/row-groups at scan time.  Verified against
    the actual parquet metadata via pyarrow."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

    path = str(tmp_path / "ev_sorted")
    ev = load_table(spark, SF_DIR_SMOKE, "events").select("user_id", "value")
    (
        ev.repartitionByRange(4, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(path)
    )
    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        names = md.schema.to_arrow_schema().names
        col_idx = names.index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {(lo1, hi1)} vs {(lo2, hi2)}"


def test_cluster_rewrite_preserves_rows_and_ranges(spark, tmp_path):
    """cluster_parquet_dir must keep the exact row multiset while
    producing the disjoint-range file layout."""
    import pyarrow.parquet as pq

    from aws_cdk_pipelines_datalake_etl_spark.operators.maintenance import (
        cluster_parquet_dir,
    )

    path = str(tmp_path / "ev_unsorted")
    ev = load_table(spark, SF_DIR_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    ev.repartition(8).write.parquet(path)  # interleaved layout
    before = sorted(r.event_id for r in spark.read.parquet(path).collect())
    n = cluster_parquet_dir(spark, path, "user_id", n_files=4)
    assert n == 4
    after = sorted(r.event_id for r in spark.read.parquet(path).collect())
    assert after == before
    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.to_arrow_schema().names.index("user_id")
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_static_partition_pruning_on_conformed_layout(spark, tmp_path):
    """A literal filter on the reference's partition column must show
    up as a PartitionFilter on the scan — reading one day touches one
    directory, not the lake."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "ev_bydate")
    ev = load_table(spark, SF_DIR_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").parquet(path)
    one_day = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = formatted_plan(one_day)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "2024-01-05" in m.group(1), plan


def test_table_diff_classifies_all_statuses(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import table_diff

    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (5, "e", 50.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["diff_status"] for r in table_diff(left, right, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",  # NULL column equal on both sides
        5: "added",
    }


def test_table_diff_null_vs_separator_values_not_confused(spark):
    """ADVICE r3 regression: NULL vs a literal '\\x00' string, and
    values containing the old '\\x1f' separator shifted across column
    boundaries, must classify as changed — not unchanged."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import table_diff

    left = spark.createDataFrame(
        [(1, None, "x"), (2, "a\x1fb", "c"), (3, "v", "w")],
        ["k", "a", "b"],
    )
    right = spark.createDataFrame(
        [(1, "\x00", "x"), (2, "a", "b\x1fc"), (3, "v", "w")],
        ["k", "a", "b"],
    )
    got = {r.k: r.diff_status for r in table_diff(left, right, ["k"]).collect()}
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}
