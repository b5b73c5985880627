"""Z-order clustering: multi-column file-skipping layout
(functions/zorder.py + maintenance.zorder_parquet_dir)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.maintenance import (
    cluster_parquet_dir,
    zorder_parquet_dir,
)
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 16


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet") or f.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.names.index(col)
        stats = [
            md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)
        ]
        ranges.append(
            (min(s.min for s in stats), max(s.max for s in stats))
        )
    return ranges


def _mean_coverage(path: str, col: str) -> float:
    """Mean fraction of the global value range a single file spans."""
    ranges = _file_ranges(path, col)
    glo = min(r[0] for r in ranges)
    ghi = max(r[1] for r in ranges)
    span = float(ghi - glo) or 1.0
    return sum((hi - lo) / span for lo, hi in ranges) / len(ranges)


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    path = str(base / "events")
    # two independent selective dimensions: user and event id
    load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    ).write.parquet(path)
    return path


def test_zorder_narrows_every_dimension(spark, src, tmp_path):
    zpath = str(tmp_path / "z")
    cpath = str(tmp_path / "c")
    df = spark.read.parquet(src)
    df.write.parquet(zpath)
    df.write.parquet(cpath)

    n = zorder_parquet_dir(spark, zpath, ["user_id", "event_id"], N_FILES)
    assert n == N_FILES
    cluster_parquet_dir(spark, cpath, "user_id", N_FILES)

    # single-column clustering: tight on user_id, blind on event_id
    assert _mean_coverage(cpath, "user_id") < 0.15
    assert _mean_coverage(cpath, "event_id") > 0.6

    # z-order: simultaneously narrow on BOTH dimensions (16 files on
    # an 8-bit-per-dim curve -> ~4x4 grid -> ~25-35% per dim)
    assert _mean_coverage(zpath, "user_id") < 0.45
    assert _mean_coverage(zpath, "event_id") < 0.45

    # row content unchanged
    z = spark.read.parquet(zpath)
    assert z.count() == df.count()
    assert (
        z.agg(F.sum("event_id"), F.sum("user_id")).collect()
        == df.agg(F.sum("event_id"), F.sum("user_id")).collect()
    )


def test_zorder_key_fits_signed_long_with_many_columns(spark):
    """8+ columns at default 8 bits would shift into the sign bit;
    bits must auto-shrink so every key stays non-negative (ADVICE r3)."""
    import pytest
    from pyspark.sql import functions as F

    from aws_cdk_pipelines_datalake_etl_spark.functions.zorder import zorder_key

    cols = [f"c{i}" for i in range(9)]
    df = spark.range(100).select(
        "id", *[(F.col("id") * (i + 3) % 97).alias(c) for i, c in enumerate(cols)]
    )
    keyed = df.withColumn("zk", zorder_key(df, cols))
    assert keyed.filter(F.col("zk") < 0).count() == 0
    # still a useful clustering key: more than one distinct value
    assert keyed.select("zk").distinct().count() > 1
    with pytest.raises(ValueError):
        zorder_key(df, [])


def test_parquet_footer_bounds_match_true_minmax(spark, tmp_path):
    """Footer-stat bounds (zero data scan) equal the aggregate's
    min/max for numeric columns; non-numeric columns fall back."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.zorder import (
        parquet_footer_bounds,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, float(i) * 1.5 - 10, f"s{i}") for i in range(1000)],
        ["a", "b", "s"],
    ).repartition(4).write.parquet(path)
    bounds = parquet_footer_bounds(path, ["a", "b"])
    assert bounds == {"a": (0.0, 999.0), "b": (-10.0, 999 * 1.5 - 10)}
    assert parquet_footer_bounds(path, ["a", "s"]) is None  # string col
    assert parquet_footer_bounds(path, ["a", "nope"]) is None


def test_zorder_key_with_supplied_bounds_matches_scanned(spark):
    """bounds= must produce the identical key column as the
    aggregate-scan path given the same bounds."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.zorder import zorder_key

    df = spark.range(500).select(
        (F.col("id") % 50).alias("x"), (F.col("id") % 7).alias("y")
    )
    scanned = df.withColumn("k", zorder_key(df, ["x", "y"])).collect()
    supplied = df.withColumn(
        "k",
        zorder_key(
            df, ["x", "y"], bounds={"x": (0.0, 49.0), "y": (0.0, 6.0)}
        ),
    ).collect()
    assert {(r.x, r.y, r.k) for r in scanned} == {
        (r.x, r.y, r.k) for r in supplied
    }


def test_string_dimension_is_lexicographic(spark):
    """String z-order dim: bucket order must follow lexicographic
    byte order of the (7-byte-prefix) values; NULL sorts first."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate([None, "", "apple", "apricot", "banana", "zebra"])],
        ["id", "s"],
    )
    keyed = df.withColumn("k", zorder_key(df, ["s"], bits=8)).collect()
    by_s = {r.s: r.k for r in keyed}
    # monotone (non-strict: 8-bit quantization may merge near strings),
    # strictly separating far-apart values
    assert (
        by_s[None]
        <= by_s[""]
        <= by_s["apple"]
        <= by_s["apricot"]
        <= by_s["banana"]
        <= by_s["zebra"]
    )
    assert by_s["apple"] < by_s["banana"] < by_s["zebra"]


def test_zorder_dir_with_string_column(spark, tmp_path):
    """zorder_parquet_dir over (string, numeric): content preserved,
    and files become narrow in the string column (each file touches
    few distinct sources)."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"src{i % 8}", float(i)) for i in range(4000)],
        ["id", "source", "v"],
    ).repartition(8).write.parquet(path)
    before = spark.read.parquet(path).groupBy().sum("id").head()[0]
    zorder_parquet_dir(spark, path, ["source", "id"], n_files=8)
    after = spark.read.parquet(path).groupBy().sum("id").head()[0]
    assert before == after

    distinct_per_file = []
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(path, f), columns=["source"])
            distinct_per_file.append(len(set(t.column("source").to_pylist())))
    # random layout puts all 8 sources in every file; the 2-dim Morton
    # interleave halves that (each file covers a z-range spanning a few
    # source buckets x id ranges)
    assert sum(distinct_per_file) / len(distinct_per_file) <= 5.5
