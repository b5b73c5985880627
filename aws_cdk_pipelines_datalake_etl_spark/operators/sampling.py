"""Deterministic corpus sampling (Tier E — training-data curation).

``df.sample()`` is seed-dependent *per partition layout*, so the same
call over the same data can select different rows after a repartition
or a cluster resize — useless for reproducible corpus splits.  The
standard large-scale fix is content-hash bucketing: a row is in the
sample iff a stable hash of its id falls in the accepted range.  The
choice is row-local (embarrassingly parallel, no shuffle), stable
across runs/engines, and composable (a 4/16 sample of a 8/16 sample
is a 2/16 sample of the original).

We bucket on the first hex digit of ``md5(id)`` — md5 is available
and bit-identical in Spark, DuckDB, and Python, which is what lets
the DuckDB oracle replay the *exact* row set.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = string.digits + "abcdef"


def hash_sample(df: DataFrame, id_col: str, sixteenths: int) -> DataFrame:
    """Keep rows whose ``md5(id)`` starts with one of the first
    ``sixteenths`` hex digits — a deterministic ~``sixteenths``/16
    sample.  The predicate is computed (md5) so it can't reach the
    parquet reader as a pushed filter, but it evaluates row-local
    inside the scan stage — no shuffle, no extra pass."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    accepted = list(HEX_DIGITS[:sixteenths])
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return df.filter(bucket.isin(accepted))


def hash_sample_predicate_sql(id_col: str, sixteenths: int) -> str:
    """The identical predicate in portable SQL (DuckDB oracle)."""
    accepted = ", ".join(f"'{d}'" for d in HEX_DIGITS[:sixteenths])
    return f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 1) IN ({accepted})"


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, sixteenths_by_stratum: dict[str, int]
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    ~n/16 hash fraction (rare classes can keep 16/16 = everything,
    dominant classes 1/16) — the standard class-rebalancing pass for
    training-corpus curation.  Strata not listed are dropped.

    Same scale posture as :func:`hash_sample`: the keep decision is
    row-local (md5 of the id), so no shuffle, stable under
    repartitioning, and identical across engines.  Unlike
    ``df.sampleBy()``, which is seeded per-partition-layout, the
    selected row *set* is reproducible bit-for-bit.
    """
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    pred = F.lit(False)
    for stratum, n in sixteenths_by_stratum.items():
        if not 0 < n <= 16:
            raise ValueError("sixteenths must be in 1..16")
        pred = pred | (
            (F.col(stratum_col) == stratum) & bucket.isin(list(HEX_DIGITS[:n]))
        )
    return df.filter(pred)


def stratified_predicate_sql(
    id_col: str, stratum_col: str, sixteenths_by_stratum: dict[str, int]
) -> str:
    """The identical stratified predicate in portable SQL."""
    clauses = []
    for stratum, n in sixteenths_by_stratum.items():
        accepted = ", ".join(f"'{d}'" for d in HEX_DIGITS[:n])
        clauses.append(
            f"({stratum_col} = '{stratum}' AND "
            f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 1) IN ({accepted}))"
        )
    return " OR ".join(clauses)
