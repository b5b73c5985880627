"""Z-order (Morton) interleave key — multi-column data skipping.

Single-column range clustering (operators/maintenance.py
``cluster_parquet_dir``) makes files disjoint in ONE column; filters
on any other column still read everything.  Interleaving the bits of
several columns' bucket indices gives a space-filling-curve key:
range-clustering on it yields files that are simultaneously narrow in
EVERY participating column, so footer min/max stats prune files for
selective filters on any of them — the plain-parquet equivalent of
``OPTIMIZE ... ZORDER BY``.

The whole key is one JVM-side codegen'd expression (shift/mask/or
over ``width_bucket``-style normalized ranks): no UDF, no extra scan
beyond one min/max aggregate per column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # 2^8 buckets per dimension; D dims -> 2^(8D) cells


def _bucket(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Uniform [lo, hi] -> integer bucket in [0, 2^bits).  Equi-width
    is one aggregate per column; heavy skew can substitute
    approxQuantile boundaries upstream without touching the
    interleave."""
    n = (1 << bits) - 1
    if hi <= lo:  # constant column: everything in bucket 0
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.greatest(F.floor(scaled * n), F.lit(0)).cast("long"), F.lit(n).cast("long")
    )


def parquet_footer_bounds(
    path: str, cols: list[str]
) -> dict[str, tuple[float, float]] | None:
    """Column min/max for NUMERIC columns read from parquet FOOTERS
    only — no data scan.  The maintenance-path shortcut: at 100 TB the
    z-order min/max aggregate is otherwise a full extra pass; footer
    statistics give the same bounds for the cost of metadata reads
    (driver-side here; shard the footer list over executors when file
    counts get large).

    Returns None (caller falls back to the aggregate scan) if any
    column is non-numeric, any row group lacks stats, or bounds are
    non-finite — bounds must COVER the data or clustering quality
    degrades at the clamped edges."""
    import math as _math

    try:
        import pyarrow.dataset as pads
    except ImportError:  # pragma: no cover
        return None
    try:
        dset = pads.dataset(path, format="parquet")
    except (OSError, ValueError):
        return None
    lo: dict[str, float] = {}
    hi: dict[str, float] = {}
    want = set(cols)
    for frag in dset.get_fragments():
        md = frag.metadata
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for j in range(group.num_columns):
                col = group.column(j)
                name = col.path_in_schema
                if name not in want:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    return None
                if not isinstance(st.min, (int, float)) or isinstance(
                    st.min, bool
                ):
                    return None  # non-numeric: Spark cast semantics differ
                mn, mx = float(st.min), float(st.max)
                if not (_math.isfinite(mn) and _math.isfinite(mx)):
                    return None
                lo[name] = min(lo.get(name, mn), mn)
                hi[name] = max(hi.get(name, mx), mx)
    if set(lo) != want:
        return None
    return {c: (lo[c], hi[c]) for c in cols}


def _string_dim(c: str) -> Column:
    """A string column as a z-order dimension: the first 7 bytes,
    big-endian, as a number — monotone with the lexicographic
    byte order (shorter strings zero-pad low), so range-bucketing it
    clusters lexicographic neighbors together.  NULL sorts first."""
    return F.coalesce(
        F.conv(
            F.rpad(F.hex(F.substring(F.col(c), 1, 7)), 14, "0"), 16, 10
        ).cast("double"),
        F.lit(0.0),
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton key over ``cols`` (numeric/date/timestamp, plus STRING
    via the 7-byte lexicographic prefix rank — see :func:`_string_dim`;
    string bounds always come from the aggregate, parquet footer stats
    stay numeric-only).  One
    min/max aggregate per column (driver-side, single reduced row) —
    or zero scans when the caller supplies ``bounds`` (e.g. from
    :func:`parquet_footer_bounds`) — then a pure bit-interleave
    expression: bit i of column d lands at position ``i*D + d``.

    ``bits`` auto-shrinks so the interleave fits a signed long: with
    the default 8 bits, 8+ columns would shift a bit into the sign
    position and break the clustering order (ADVICE r3)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        bits = 63 // len(cols)
        if bits < 1:
            raise ValueError(f"too many z-order columns ({len(cols)} > 63)")
    dtypes = dict(df.dtypes)
    exprs = [
        _string_dim(c) if dtypes.get(c) == "string" else F.col(c).cast("double")
        for c in cols
    ]
    if bounds is not None:
        bound_list = [bounds[c] for c in cols]
    else:
        aggs = []
        for e in exprs:
            aggs += [F.min(e), F.max(e)]
        row = df.agg(*aggs).collect()[0]
        bound_list = [(row[2 * i], row[2 * i + 1]) for i in range(len(cols))]
    bounds_resolved = bound_list
    buckets = [
        _bucket(e, lo if lo is not None else 0.0, hi if hi is not None else 0.0, bits)
        for e, (lo, hi) in zip(exprs, bounds_resolved)
    ]
    d = len(cols)
    key: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * d + j))
    return key
