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
A NULL identity coalesces to salt 0 (crc32(NULL) is NULL, and a NULL
salt would never equal any replicated salt — silently dropping the
row from the join).
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
    salt = (
        F.coalesce(F.crc32(F.col(id_col).cast("string")), F.lit(0)) % n_salts
    ).alias("_salt")
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    id_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically and
    replicate the small side ``n_salts``× so a hot join key spreads
    over ``n_salts`` reducers instead of one straggler.

    The join key stays an equality on ``(key, _salt)`` — still a
    hash-partitionable join, just with the hot key's hash space
    widened.  Row multiset is identical to the plain join (each big
    row matches exactly one replica).  AQE's skew-join split handles
    the same problem reactively at runtime; this operator is the
    deterministic, planner-independent form for keys KNOWN to be hot
    (the "one customer is half the table" case), and the pattern
    composes with joins AQE can't split (e.g. bucketed SMJ).
    """
    salted_big = big.withColumn(
        "_salt",
        F.coalesce(F.crc32(F.col(id_col).cast("string")), F.lit(0)) % n_salts,
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return salted_big.join(replicated_small, on=[key, "_salt"]).drop("_salt")
