"""Incremental aggregate maintenance (materialized-view merge).

The reference recomputes its purpose-built aggregate from scratch on
every file arrival (etl_conformed_to_purposebuilt.py:199-209).  At
100 TB the standing fix is incremental view maintenance for additive
aggregates: keep the rollup as partials (sum, count — avg only at
read time), aggregate ONLY the new batch, and merge partials by key.
Cost per batch: one shuffle of the (tiny) delta aggregate plus a
key-join-sized merge — independent of the base table's history.

Merging is expressed as union + re-aggregate, which Spark executes
with map-side partial aggregation: the base side is already one row
per key, so the merge shuffle moves |keys| + |delta keys| rows, not
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def additive_rollup(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """The maintainable form of a sum/count/avg rollup: partials only
    (``total`` and ``n``); derive avg at read time so the aggregate
    stays mergeable."""
    return df.groupBy(*key_cols).agg(
        F.sum(value_col).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


def merge_rollups(
    base: DataFrame, delta: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Merge two partial rollups of the same shape: sum the partials
    per key.  Associative + commutative, so batches can arrive in any
    order and grouping — the invariant the test asserts."""
    return (
        base.unionByName(delta)
        .groupBy(*key_cols)
        .agg(F.sum("total").alias("total"), F.sum("n").alias("n"))
    )


def read_rollup(df: DataFrame, round_dp: int = 2) -> DataFrame:
    """Read-time view over the partials: rounded total and derived
    average."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround

    return df.select(
        *[c for c in df.columns if c not in ("total", "n")],
        pround(F.col("total"), round_dp).alias("total_value"),
        pround(F.col("total") / F.col("n"), 6).alias("avg_value"),
        F.col("n").alias("n_events"),
    )
