"""Table maintenance: small-file compaction.

The reference's trigger model writes one job output per arriving file
(``state_machine_trigger/lambda_handler.py:64-92``), so a busy raw
prefix accretes thousands of small parquet files per partition — at
100 TB the scan's task-scheduling and footer-read overhead comes to
dominate.  Compaction rewrites a directory to ~target-sized files.

Rewrite goes to a sibling temp dir first and swaps in atomically-ish
(rename) so a failed compaction never corrupts the live directory.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite a parquet directory into ``ceil(bytes/target)`` files.
    Returns the new file count.  Row content is unchanged (asserted
    by tests); only layout changes."""
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    # coalesce, not repartition: narrowing file count needs no shuffle
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "__precompact"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def zorder_parquet_dir(
    spark: SparkSession,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int | None = None,
) -> int:
    """Rewrite a parquet directory clustered on the Z-order
    (Morton-interleave) key of ``cols`` (functions/zorder.py): files
    become simultaneously narrow in EVERY listed column, so selective
    filters on any of them skip files via footer min/max stats —
    multi-column ``OPTIMIZE ... ZORDER`` over plain parquet.  One
    range shuffle on the key; atomic swap; row content unchanged
    (asserted by tests).

    Bucket bounds come from parquet FOOTER statistics when available
    (functions/zorder.py parquet_footer_bounds) — metadata reads
    instead of the min/max aggregate's extra full scan; non-numeric
    columns or missing stats fall back to the aggregate."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.zorder import (
        DEFAULT_BITS,
        parquet_footer_bounds,
        zorder_key,
    )

    df = spark.read.parquet(path)
    zkey = zorder_key(
        df, cols, bits or DEFAULT_BITS, bounds=parquet_footer_bounds(path, cols)
    )
    tmp = path.rstrip("/") + "__zordering"
    (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    bak = path.rstrip("/") + "__prezorder"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def cluster_parquet_dir(
    spark: SparkSession,
    path: str,
    cluster_col: str,
    n_files: int,
) -> int:
    """Rewrite a parquet directory range-clustered on ``cluster_col``
    (repartitionByRange + sortWithinPartitions): every output file
    covers a disjoint value range, so selective filters on that
    column skip whole files via footer min/max stats — the
    plain-parquet version of OPTIMIZE ... ZORDER for the
    single-column case.  One range shuffle; atomic swap; returns the
    new file count.  Row content unchanged (asserted by tests)."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__clustering"
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    bak = path.rstrip("/") + "__precluster"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
