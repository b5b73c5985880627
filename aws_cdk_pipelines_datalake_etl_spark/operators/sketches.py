"""Mergeable-sketch pre-aggregation (Tier E — 100 TB rollup reuse).

The scale problem: "distinct users per <arbitrary dimension subset /
date range>" over 100 TB cannot re-scan raw events per question, and
plain per-day distinct counts are NOT additive (the same user appears
on many days).  The classic fix is a sketch rollup: aggregate once
into a small table of **mergeable** HLL sketches (one fixed-size
binary per key), then answer every subsequent question by unioning
sketches — register-wise max, associative and commutative, so partial
(map-side) merge applies and a year-over-arbitrary-ranges query reads
kilobytes instead of terabytes.

Built entirely on Spark 3.5+ Datasketches-backed builtins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
JVM-side, codegen'd, no UDFs.  The same pattern extends the engine's
additive rollups (operators/incremental.py) to the non-additive
distinct-count measure.

Reference tie-in: the purpose-built zone (SURVEY §2.2 K1,
etl_conformed_to_purposebuilt.py:209) materializes aggregates for
downstream query; a sketch column is the scale-correct way to
materialize COUNT(DISTINCT ...) there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 2^12 registers ≈ 1.6% relative standard error, ~4 KB/sketch


def build_hll_rollup(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll",
) -> DataFrame:
    """One scan of the fact table -> per-key HLL sketch table.

    The output is small (|keys| rows x ~2^lgk bytes) and writeable as
    a normal parquet/binary column: the reusable rollup artifact.
    """
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lgk)).alias(sketch_col)
    )


def merge_hll_rollup(
    rollup: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Answer a coarser distinct-count question FROM THE ROLLUP ONLY:
    union the sketches down to ``group_cols`` and read the estimate.
    Never touches the fact table; merge is map-side partial like any
    algebraic aggregate."""
    return rollup.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias(estimate_col)
    )


def estimate_total(
    rollup: DataFrame, sketch_col: str = "hll", estimate_col: str = "approx_distinct"
) -> DataFrame:
    """Grand-total distinct estimate from the rollup (one row)."""
    return rollup.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias(estimate_col)
    )
