"""SparkSession factory with the engine's scale-oriented defaults.

The reference delegates all execution to Spark on Glue 2.0
(``/root/reference/lib/glue_stack.py:131,162``); this engine targets
Spark 3.5+/4.x and turns on everything Glue 2.0 lacked (AQE, skew-join
handling, dynamic partition pruning).  Semantics the reference relies
on are pinned explicitly:

- ``spark.sql.caseSensitive=false`` — the shipped transformation SQL
  reads lowercase identifiers against mixed-case CSV-inferred headers
  (``transformation-sql/yellow_taxi_trip_record.sql:3-9``).
- ``spark.sql.sources.partitionOverwriteMode=dynamic`` — re-running a
  job replaces only the touched ``year/month/day`` partitions
  (``lib/glue_scripts/etl_raw_to_conformed.py:191-193``).
- UTC session timezone so timestamp semantics are deterministic and
  comparable against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "datalake-etl-spark"


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[N]`` with shuffle partitions sized to cores so
    neither tiny nor sf0.1 workloads over/under-parallelize.  At 100 TB
    the same code runs unchanged: AQE coalesces the (much larger)
    configured shuffle partitions down to the data's real size.
    """
    par = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.caseSensitive", "false")
        # dynamic partition overwrite: etl_raw_to_conformed.py:191-193
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # adaptive execution: runtime coalesce, skew-join split, plan re-opt
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the pandas-UDF slow path (similarity / multimodal ops)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else par),
        )
        .config("spark.default.parallelism", str(par))
        # keep partition-file splits at a size that fits executor memory
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.createHiveTableByDefault", "false")
        # read TIMESTAMP(NANOS) parquet columns as long (ns since epoch)
        # instead of failing; sources.testdata converts ns -> timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if master is not None:
        builder = builder.master(master)
    elif os.environ.get("SPARK_MASTER") is None:
        builder = builder.master(f"local[{par}]")
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
