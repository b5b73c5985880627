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

# ---------------------------------------------------------------------------
# Count-min sketch: mergeable FREQUENCY estimation (heavy hitters).
# HLL/Theta answer "how many distinct"; KLL answers "what quantile";
# count-min answers "how often does key x occur" from a fixed-size
# summary: depth d hash rows x width w counters, estimate = min over
# rows of the counter each hash lands in (Cormode & Muthukrishnan
# 2005, public literature).  Guarantees: est >= true count always;
# est <= true + eps*N with prob 1-delta for w = e/eps, d = ln(1/delta).
#
# Unlike the Datasketches-backed sketches above, this one is built
# from the engine's own portable md5-derived hashes, so the WHOLE
# sketch — cells and estimates — is bit-replayable in an external SQL
# engine: the registry entry is an exact-hash oracle, not rows-only.
#
# Representation: the sketch is a TABLE of non-zero cells
# (d, cell, cnt) rather than a packed array — the natural distributed
# form (one hash-shuffle bounded by depth*width rows regardless of
# input size) and trivially mergeable: union + re-sum (additive).
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 512


def _cm_positions_expr(key: str, depth: int, width: int) -> str:
    """Array of (d, cell) structs for a key: cell_d = h48(d ':' key) % w."""
    h = (
        f"CAST(conv(substring(md5(concat(CAST(d AS STRING), ':', "
        f"CAST({key} AS STRING))), 1, 12), 16, 10) AS BIGINT)"
    )
    return (
        f"transform(sequence(0, {depth - 1}),"
        f" d -> named_struct('d', d, 'cell', {h} % {width}))"
    )


def build_cm_rollup(
    df: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One scan -> the sparse count-min cell table
    ``(group_cols..., d, cell, cnt)``.

    Each input row explodes to ``depth`` (d, cell) rows; the single
    hash aggregate has map-side partial combine, and its output is
    bounded by ``depth * width`` rows per group — the fixed-size
    summary, whatever the input size."""
    gc = list(group_cols or [])
    pos = F.explode(F.expr(_cm_positions_expr(key_col, depth, width))).alias("p")
    return (
        df.select(*gc, pos)
        .select(*gc, F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
        .groupBy(*gc, "d", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge two cell tables: union + re-sum (counters are additive,
    so sketch(A) + sketch(B) == sketch(A ++ B) exactly)."""
    gc = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*gc, "d", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for a (small) probe key set:
    ``(key_col, cm_est)`` with est = min over d of the landed counter
    (0 if some row has no cell — the key was never seen).

    The probe side is tiny by construction (a candidate list), so the
    join against the bounded cell table broadcasts; the fact table is
    never touched."""
    ppos = (
        probes.select(F.col(key_col))
        .distinct()
        .select(
            key_col,
            F.explode(F.expr(_cm_positions_expr(key_col, depth, width))).alias("p"),
        )
        .select(key_col, F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
    )
    joined = ppos.join(cells, ["d", "cell"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("cm_est"))


def cm_oracle_sql(
    key_expr: str,
    table: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> str:
    """DuckDB replay of build_cm_rollup + cm_estimate over all distinct
    keys of ``table`` — bit-identical cells and estimates."""
    h = (
        f"(('0x' || substr(md5(d::VARCHAR || ':' || ({key_expr})::VARCHAR), 1, 12))"
        f"::BIGINT % {width})"
    )
    return f"""
WITH pos AS (
  SELECT {key_expr} AS k, d, {h} AS cell
  FROM {table}, (SELECT unnest(generate_series(0, {depth - 1})) AS d)
), cells AS (
  SELECT d, cell, count(*) AS cnt FROM pos GROUP BY d, cell
), probe_pos AS (
  SELECT DISTINCT k, d, cell FROM pos
)
SELECT p.k, min(coalesce(c.cnt, 0)) AS cm_est
FROM probe_pos p LEFT JOIN cells c USING (d, cell)
GROUP BY p.k
"""
