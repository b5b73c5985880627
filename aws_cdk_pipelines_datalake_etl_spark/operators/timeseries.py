"""Time-series regularization (Tier E — hypertable-style rollup).

The reference's aggregation operator (transformation-sql/*.sql:18,
etl_conformed_to_purposebuilt.py:199) produces per-day rollups keyed
by whatever days happen to contain data.  Downstream time-series
consumers (forecasting, charting, training-window extraction) need a
*regular* grid: every key × every day between that key's first and
last observation, with missing days carried forward from the last
observed value.

Spark-first plan — three narrow steps, two shuffles total:

1. daily rollup: ``groupBy(key, day)`` — one shuffle on (key, day);
2. per-key date spine: ``sequence(min_day, max_day, interval 1 day)``
   + ``explode`` — generated from the *aggregated* bounds (one row
   per key), so the explode fans out from tiny input, never from raw
   events;
3. forward fill: ``F.last(value, ignorenulls=True)`` over
   (key ORDER BY day ROWS UNBOUNDED PRECEDING) — one shuffle on key,
   which AQE can reuse from step 1's partitioning when key ⊂ keys.

At 100 TB the spine is |keys| × |days| rows — independent of event
count — and every step is whole-stage-codegen (no UDFs, no collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround


def gapfill_forward_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily per-key rollup on a dense per-key date spine, gaps
    forward-filled from the last observed day.

    Returns ``(key, day, filled_value, is_observed)`` where ``day``
    is a date, ``filled_value`` the (rounded) daily sum carried
    forward across gaps, and ``is_observed`` flags real vs filled
    rows.  The first observed day per key is never null by
    construction, so ``filled_value`` is total.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "day")
        .agg(pround(F.sum("v"), 2).alias("day_value"))
    )
    spine = (
        daily.groupBy("key")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "key",
            F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["key", "day"], "left")
        .select(
            F.col("key").alias(key_col),
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNotNull().alias("is_observed"),
        )
    )


def ewma_halflife(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    depth: int = 16,
):
    """Exponentially-weighted moving average (half-life = 1 step,
    truncated at ``depth`` lags) of each key's value series — the
    monitoring/financial smoothing primitive, formulated for
    engine-exact results: float EWMAs are recursively accumulated and
    never bit-agree across engines, so instead each row's EWMA is an
    EXACT integer quotient — values become cents, the ``depth`` lag
    terms carry power-of-two weights (2^(depth-1-d)), and numerator /
    denominator are exact bigint sums; only the final division is
    float, the identical IEEE op on both engines.

    One window exchange on (key, ts, tiebreak); ``depth`` lag columns
    all share it (codegen scalars, same pattern as the winnowing
    selection).  Truncation error is bounded by 2^-depth of the value
    range — below the 6-dp rounding at depth 16.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for d in range(depth):
        weight = 1 << (depth - 1 - d)
        lag_d = F.lag(cents, d).over(w) if d else cents
        num = num + F.coalesce(lag_d, F.lit(0)) * F.lit(weight)
        den = den + F.when(lag_d.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return df.select(
        F.col(tiebreak_col),
        F.col(key_col),
        pround(num / den / F.lit(100.0), 6).alias("ewma_value"),
    )
