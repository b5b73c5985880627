"""Binned interval join — the big-big range join Spark doesn't have.

A point-in-interval join (``p.ts BETWEEN i.start AND i.end``) has no
equi-key, so Catalyst's only strategies are broadcast nested-loop
(fine while ONE side is small — that's q30) or a cartesian product
(never fine).  When both sides are big, the classic fix is interval
bucketing: quantize time into fixed-width bins, explode each interval
to every bin it overlaps, map each point to its single bin, and
equi-join on the bin — turning the non-equi join into a hash/sort
shuffle join with the exact predicate re-checked after the match.

Correctness needs no dedup: a qualifying (point, interval) pair meets
in EXACTLY one bin — the point's — because the point maps to one bin
and the interval's explosion covers it once.

Cost model: intervals fan out by ``ceil(len/bin_width)+1`` rows;
points don't fan out at all.  Pick ``bin_width`` near the typical
interval length — ~2 exploded rows per interval — and the shuffle is
barely bigger than the inputs, with perfect key parallelism (time
bins) instead of one broadcast loop.  Skew note: a bin only gets hot
if many intervals AND many points share one time quantum; widen bins
or salt the bin key for pathological spikes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIN_COL = "_tbin"


def _bin_of(ts, width_s: int):
    return F.floor(F.unix_timestamp(ts) / F.lit(width_s)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` via bin equi-join + exact re-check.

    ``how='inner'`` only (outer variants would need unmatched-point
    recovery via anti-join; compose that explicitly if needed).
    Column names must be disjoint apart from the join being on the
    bin; the output carries all columns of both inputs."""
    if how != "inner":
        raise ValueError("interval_join supports how='inner'")
    p = points.withColumn(BIN_COL, _bin_of(F.col(point_ts), bin_width_seconds))
    i = intervals.withColumn(
        BIN_COL,
        F.explode(
            F.sequence(
                _bin_of(F.col(start_col), bin_width_seconds),
                _bin_of(F.col(end_col), bin_width_seconds),
            )
        ),
    )
    return p.join(i, BIN_COL, "inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    ).drop(BIN_COL)
