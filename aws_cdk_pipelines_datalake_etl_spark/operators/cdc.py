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
