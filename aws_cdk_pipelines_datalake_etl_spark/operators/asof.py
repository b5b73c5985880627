"""Distributed as-of join (Spark has no native one).

Union-and-window strategy: tag the right ("reference") stream 0 and
the left ("probe") stream 1, union, then a single window pass
per key ordered by (time, tag) carries the latest reference row
forward with ``last_value(..., ignoreNulls)``.  Cost: ONE shuffle on
the key — same as an equi-join — instead of a range join's
quadratic-per-key blowup.  Skewed keys are handled by AQE; for
pathological keys, pre-salt the union.

Equal timestamps: the reference row sorts before the probe row
(tag 0 < tag 1), so matches are inclusive (ref.ts <= probe.ts) —
the same tie rule as DuckDB's ``ASOF JOIN ... ON probe.ts >= ref.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row of the same
    ``on`` key with ``right_ts <= left_ts`` (NULLs when none).

    ``right_cols`` are the right-side columns to carry (renamed with
    ``suffix``).
    """
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "_tag",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_tag") == 1).select(
        F.col("_l.*"),
        *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_next",
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row of the
    same key with ``right_ts >= left_ts`` (NULLs when none) — "what
    happened next", the mirror of :func:`asof_join`'s "latest before".

    Same union-and-window strategy and the same single-shuffle cost;
    the window looks FORWARD (``first_value ignoreNulls`` over
    [current, unbounded following]) and the tag order flips so a
    right row at the exact left timestamp is included (inclusive
    match).  Right rows should be unique per (key, ts) or the carried
    value among ties is partition-order-dependent.
    """
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(*left.columns).alias("_l"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = lt.unionByName(rt).select(
        "_tag",
        "_l",
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_tag") == 0).select(
        F.col("_l.*"),
        *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """:func:`asof_join` semantics via the COGROUP surface:
    ``left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas``
    with a per-key ``pandas.merge_asof``.

    Same single co-partitioning shuffle as the union+window plan, but
    the per-key merge runs in Arrow-fed pandas — the escape hatch for
    per-key logic Spark expressions can't state.  For plain as-of the
    union+window operator is preferred (stays in codegen, no state
    bound to a key's full history); this exists to (a) cover the
    cogroup API and (b) prove both strategies agree (equality is
    oracle-checked against the same DuckDB ASOF JOIN).  Keys with
    many rows bound task memory — at 100 TB shard hot keys upstream.
    """
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    out_fields = list(left.schema.fields) + [
        StructField(f"{c}{suffix}", right.schema[c].dataType)
        for c in right_cols
    ]
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    # Same-named NON-KEY columns across the two cogroup sides collide
    # in the Arrow handoff (the right one is silently dropped), so the
    # right side ships under private names.
    r_in = right.select(
        F.col(on),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(left_ts, kind="mergesort")
        if r.empty:
            for c in right_cols:
                l[f"{c}{suffix}"] = None
            return l[out_cols]
        r2 = r.drop(columns=[on]).sort_values("__rts", kind="mergesort")
        m = pd.merge_asof(
            l, r2, left_on=left_ts, right_on="__rts", direction="backward"
        )
        return m[out_cols]

    return (
        left.groupBy(on)
        .cogroup(r_in.groupBy(on))
        .applyInPandas(merge, schema=out_schema)
    )
