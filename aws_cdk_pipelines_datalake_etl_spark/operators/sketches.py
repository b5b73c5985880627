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


# ---------------------------------------------------------------------------
# Theta sketches: distinct-set ALGEBRA (union / intersection / difference).
# HLL can only union; audience questions — "users who did A and B",
# "did A but never B" — need intersections and differences, which is
# exactly what Datasketches Theta provides, still mergeable/partial-
# aggregable.  Below the nominal entry count (2^lg_nom_entries) a theta
# sketch retains every hash, so estimates are EXACT — size the sketch
# to the expected per-key cardinality to buy exactness where it's
# cheap, and degrade gracefully to ~1-2% error beyond.
# ---------------------------------------------------------------------------

DEFAULT_LG_NOM_ENTRIES = 15  # 32768 entries: exact through ~32k distincts/key


def build_theta_rollup(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    lg_nom_entries: int = DEFAULT_LG_NOM_ENTRIES,
    sketch_col: str = "theta",
) -> DataFrame:
    """One scan -> per-key Theta sketch of ``distinct_col``."""
    return df.groupBy(*key_cols).agg(
        F.theta_sketch_agg(F.col(distinct_col), F.lit(lg_nom_entries)).alias(
            sketch_col
        )
    )


def theta_overlap(
    rollup: DataFrame,
    key_col: str,
    left_key: str,
    right_key: str,
    sketch_col: str = "theta",
) -> DataFrame:
    """Audience algebra between two rollup rows, entirely from
    sketches: |A|, |B|, |A ∪ B|, |A ∩ B|, |A \\ B| — e.g. users who
    viewed AND purchased vs viewed but never purchased, without
    touching the fact table."""
    a = rollup.filter(F.col(key_col) == left_key).select(
        F.col(sketch_col).alias("a")
    )
    b = rollup.filter(F.col(key_col) == right_key).select(
        F.col(sketch_col).alias("b")
    )
    both = a.crossJoin(b)  # 1x1: two sketch blobs on the driver-side plan
    return both.select(
        F.theta_sketch_estimate(F.col("a")).cast("long").alias("n_left"),
        F.theta_sketch_estimate(F.col("b")).cast("long").alias("n_right"),
        F.theta_sketch_estimate(F.theta_union(F.col("a"), F.col("b")))
        .cast("long")
        .alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection(F.col("a"), F.col("b")))
        .cast("long")
        .alias("n_intersection"),
        F.theta_sketch_estimate(F.theta_difference(F.col("a"), F.col("b")))
        .cast("long")
        .alias("n_left_only"),
    )


# ---------------------------------------------------------------------------
# KLL sketches: mergeable QUANTILES.  Exact percentiles are holistic
# (per-group value lists); a KLL rollup materializes a fixed-size
# quantile summary per key that merges like any algebraic aggregate,
# so "p95 latency over an arbitrary key/date range" reads the rollup.
# ---------------------------------------------------------------------------


def build_kll_rollup(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 1600,  # ~0.33% normalized rank error (datasketches default 200 -> 1.65%)
    sketch_col: str = "kll",
) -> DataFrame:
    """One scan -> per-key KLL(double) quantile sketch."""
    return df.groupBy(*key_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col), F.lit(k)).alias(sketch_col)
    )


def merge_kll_quantiles(
    rollup: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    sketch_col: str = "kll",
) -> DataFrame:
    """Merge sketches down to ``group_cols`` and read quantile values
    — rank error is bounded by k, independent of data size.

    ``kll_sketch_merge_double`` is a binary scalar (no union-agg
    builtin), so the per-group merge is a collect_list + array fold —
    fine because the rollup is already tiny (one fixed-size sketch per
    input key; group fan-in is #subkeys, e.g. #days, not #rows)."""
    merged = rollup.groupBy(*group_cols).agg(
        F.collect_list(F.col(sketch_col)).alias("s")
    ).select(
        *group_cols,
        F.aggregate(
            F.slice(F.col("s"), 2, F.size(F.col("s"))),
            F.element_at(F.col("s"), 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("m"),
    )
    return merged.select(
        *group_cols,
        *[
            F.kll_sketch_get_quantile_double(F.col("m"), F.lit(q)).alias(
                f"q{int(q * 100):02d}"
            )
            for q in quantiles
        ],
    )
