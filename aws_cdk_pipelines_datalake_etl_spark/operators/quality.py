"""Declarative data-quality checks (the Glue Data Quality / deequ
role in the reference's ecosystem), Spark-first.

A check suite compiles into the minimum number of passes:

- completeness + bounds checks fold into ONE aggregation over the
  table (each check is a conditional aggregate — map-side partials,
  one row out);
- uniqueness is a two-phase distinct count (its own pass by nature);
- referential integrity is a left-anti join count against the parent
  keys (broadcast when the parent key set fits, AQE decides).

Output is a long-format report: (check_name, target, value, passed)
— one row per check, queryable/joinable like any other table, which
is what lets a pipeline gate writes on `passed`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround


def _report_row(check_name: str, target: str, value, passed) -> list:
    return [
        F.lit(check_name).alias("check_name"),
        F.lit(target).alias("target"),
        pround(value, 6).alias("value"),
        passed.alias("passed"),
    ]


def completeness_and_bounds_report(
    df: DataFrame,
    completeness_cols: list[str],
    bounds: dict[str, tuple[float, float]],
) -> DataFrame:
    """All completeness + bounds checks in a single aggregation pass.

    completeness value = non-null fraction (passes at 1.0); bounds
    value = in-range fraction (passes when min/max never leave the
    range)."""
    n = F.count(F.lit(1))
    aggs = []
    for c in completeness_cols:
        aggs.append((F.count(c) / n).alias(f"comp_{c}"))
        aggs.append((F.count(c) == n).alias(f"comp_ok_{c}"))
    for c, (lo, hi) in bounds.items():
        in_range = F.when(F.col(c).between(lo, hi), 1.0).otherwise(0.0)
        aggs.append(F.avg(in_range).alias(f"bnd_{c}"))
        aggs.append(
            ((F.min(c) >= lo) & (F.max(c) <= hi)).alias(f"bnd_ok_{c}")
        )
    one = df.agg(*aggs)
    reports = []
    for c in completeness_cols:
        reports.append(
            one.select(
                *_report_row(
                    "completeness", c, F.col(f"comp_{c}"), F.col(f"comp_ok_{c}")
                )
            )
        )
    for c in bounds:
        reports.append(
            one.select(
                *_report_row("bounds", c, F.col(f"bnd_{c}"), F.col(f"bnd_ok_{c}"))
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def uniqueness_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct-key fraction for a (composite) key; passes at 1.0.

    The key is a STRUCT, not a string concatenation: struct values are
    never NULL (so NULL-bearing tuples still count) and field-wise
    distinctness treats (NULL,'x') and ('x',NULL) as different keys —
    string encodings collide on exactly those."""
    target = "+".join(key_cols)
    key = F.struct(*[F.col(c) for c in key_cols])
    one = df.agg(
        (F.count_distinct(key) / F.count(F.lit(1))).alias("frac"),
        (F.count_distinct(key) == F.count(F.lit(1))).alias("ok"),
    )
    return one.select(
        *_report_row("uniqueness", target, F.col("frac"), F.col("ok"))
    )


def referential_report(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Orphan count for child_key -> parent_key; passes at 0."""
    orphans = child.select(child_key).join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )
    one = orphans.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return one.select(
        *_report_row(
            "referential",
            f"{child_key}->{parent_key}",
            F.col("n"),
            F.col("n") == 0,
        )
    )
