"""Skew-resistant aggregation via two-stage salting (Tier E, the
100 TB posture from SURVEY §7 step 6).

The reference's aggregation operator (A1, a single ``GROUP BY`` —
``transformation-sql/yellow_taxi_trip_record.sql:18``) shuffles every
row for a key to one reducer.  At 100 TB a hot key (one
``payment_type``, one ``event_type``) turns that reducer into the
stage's straggler.  The classic fix is salting: aggregate on
``(key, salt)`` first — the hot key's rows spread over ``n_salts``
reducers and combine map-side — then re-aggregate the (tiny) salted
partials on the bare key.  Decomposable aggregates (sum/count, hence
avg) survive the two stages exactly, so the result is bit-identical
to the plain GROUP BY — which is what the oracle asserts.

Spark's AQE skew handling covers *joins*; skewed *aggregation* keys
still need this pattern (or pre-aggregation), so the engine ships it
as a first-class operator.

The salt is derived from a row identity column via ``crc32`` — fully
deterministic, no ``rand()`` — so replays/retries of a task produce
identical partials (important for speculative execution at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """``GROUP BY key_cols -> sum(value), count(*), avg(value)``
    computed skew-safely in two stages.

    Stage 1 groups by ``(key, crc32(id) % n_salts)`` — partial sums —
    stage 2 folds the partials per key.  Output columns:
    ``key_cols..., total, n_rows, avg_value``.
    """
    salt = (F.crc32(F.col(id_col).cast("string")) % n_salts).alias("_salt")
    partial = (
        df.select(*key_cols, salt, F.col(value_col))
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").alias("_total_raw"),
        F.sum("_pcnt").alias("n_rows"),
    ).select(
        *key_cols,
        pround(F.col("_total_raw"), 2).alias("total"),
        "n_rows",
        pround(F.col("_total_raw") / F.col("n_rows"), 6).alias("avg_value"),
    )
