"""Change-data-capture style upsert primitives.

The reference's write semantics are last-writer-wins at two levels:
dynamic partition overwrite for data
(``etl_raw_to_conformed.py:191-193,216``) and create-or-update for
the catalog entry (``etl_raw_to_conformed.py:147-154``).  This module
generalizes that to ROW-level last-writer-wins — the merge/upsert
shape every mutable-source ingest (CDC feed, dimension snapshot)
needs: collapse a key's history to its latest version.

Implemented as one window per key ordered by (version desc,
tiebreak desc) + rank-1 filter — a single hash exchange on the key,
partial-sort map-side; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """One row per key: the one with the greatest
    ``(version_col, tiebreak_col)``.  The tiebreaker makes the pick
    total (deterministic) when versions collide."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge a change set into a base snapshot, keeping the newest
    version of every key (rows only in one side pass through).  The
    relational MERGE/upsert, expressed as union + latest_snapshot so
    it stays one shuffle."""
    return latest_snapshot(
        base.unionByName(changes), key_cols, version_col, tiebreak_col
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: classify every key as ``added``
    (right only), ``removed`` (left only), ``changed``, or
    ``unchanged`` — the anti-entropy check after a migration, backfill,
    or CDC replay (does the rebuilt table equal the source?).

    One full outer join on the key; non-key columns are compared via a
    single md5 over the row's JSON form — ``md5(to_json(struct(...)))``
    keys each value by its field name with JSON escaping, so NULL vs a
    real ``'\\x00'`` string, and values containing any would-be
    separator, can never collide (ADVICE r3: the previous concat_ws
    fingerprint was ambiguous on both).  Comparison cost per row stays
    O(row width) with no per-column join conditions.  At 100 TB both
    sides shuffle once on the key — same cost as any big-big join, AQE
    handles skew.
    """
    compare = compare_cols or [
        c for c in left.columns if c not in key_cols
    ]

    def fingerprint(df: DataFrame) -> DataFrame:
        sig = F.md5(F.to_json(F.struct(*[F.col(c) for c in compare])))
        return df.select(*key_cols, sig.alias("_sig"))

    lf = fingerprint(left).withColumnRenamed("_sig", "_lsig")
    rf = fingerprint(right).withColumnRenamed("_sig", "_rsig")
    joined = lf.join(rf, key_cols, "full_outer")
    status = (
        F.when(F.col("_lsig").isNull(), F.lit("added"))
        .when(F.col("_rsig").isNull(), F.lit("removed"))
        .when(F.col("_lsig") == F.col("_rsig"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("diff_status"))


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension Type 2: turn a change stream into
    validity-ranged history rows — (key, attrs, valid_from, valid_to,
    is_current), where ``valid_to`` is the next version's start (NULL
    while current).

    Consecutive versions with IDENTICAL attributes collapse into one
    interval (no-op updates don't fragment history) — detected with a
    lag() over the same key window, so the whole operator is ONE hash
    exchange on the key: versions sort within their key partition,
    runs collapse, ranges come from lead().  No self-joins, no second
    shuffle.
    """
    key_w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col), F.col(tiebreak_col)
    )
    fingerprint = F.md5(
        F.to_json(F.struct(*[F.col(c) for c in attr_cols]))
    )
    runs = (
        changes.withColumn("_fp", fingerprint)
        .withColumn("_prev_fp", F.lag("_fp").over(key_w))
        .filter(F.col("_prev_fp").isNull() | (F.col("_fp") != F.col("_prev_fp")))
    )
    range_w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col), F.col(tiebreak_col)
    )
    return (
        runs.withColumn("valid_from", F.col(version_col))
        .withColumn("valid_to", F.lead(version_col).over(range_w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )
