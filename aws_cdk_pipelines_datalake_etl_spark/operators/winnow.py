"""Winnowing document fingerprints (the MOSS algorithm).

Whole-doc fingerprints (:func:`..operators.dedup.fingerprint`) only
catch exact/normalized copies; winnowing selects a *guaranteed
position-covering subset* of k-gram hashes, so two documents sharing
any run of >= w + k - 1 tokens are guaranteed to share at least one
fingerprint — the classic rolling-hash fingerprinting scheme for
partial-overlap / plagiarism / contamination detection
(Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003 — public literature).

Algorithm, per document (one window shuffle on (doc, position) — the
plan's only exchange — with every expression inside whole-stage
codegen; see :func:`winnow_fingerprints` for why the obvious
row-local array formulation loses):

1. hash every word k-gram with the portable 48-bit md5 hash
   (:func:`..functions.text_fn.hash48` semantics, replayable in
   DuckDB);
2. slide a window of ``w`` consecutive hashes; in each window select
   the minimum hash, ties broken by the **rightmost** position (the
   paper's rule — it minimizes the fingerprint count);
3. the document's fingerprint set is the distinct (position, hash)
   pairs selected.

Overlap detection is then an equi-join on the fingerprint hash —
documents that share no fingerprint never meet, so cost scales with
fingerprint co-occurrence (like the shingle join, but ~1/w the rows:
winnowing with w=4 keeps roughly a quarter of the k-gram hashes).

The reference has no fingerprinting at all (its dedup surface is
empty); this is Tier-E per SURVEY §2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
    hash48,
    hash48_sql_duckdb,
)

_HUGE = 1 << 62  # > any 48-bit hash; stands in for "no element" on leads


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """``(doc_id, pos, fp)`` winnowed fingerprints, one row per
    selected (position, hash) pair; ``pos`` is the 1-based k-gram
    position.  Documents shorter than ``k`` tokens emit nothing.

    Formulated for whole-stage codegen end to end — no higher-order
    lambdas anywhere (a ``transform``-array formulation measured ~7x
    slower at sf0.1 and ~17x-over-linear at 10x: lambda bodies run
    interpreted, and each consuming expression re-evaluates them):

    1. explode an integer ``sequence`` of k-gram positions and build
       each shingle with scalar ``element_at`` + ``concat_ws`` ->
       portable 48-bit hash — all codegen, one Generate;
    2. the per-window rightmost-min selection collapses to a closed
       form over ``w-1`` ``lag``/``lead`` columns (one window
       exchange+sort on (id, pos); every comparison a codegen scalar).
       With ``a`` = run length of consecutive left neighbors >= h
       (missing -> stop) and ``b`` = run of consecutive right
       neighbors > h (missing -> infinity), position ``pos`` is the
       rightmost argmin of the window starting at ``pos - d`` iff
       ``d <= a`` and ``w-1-d <= b``; some valid window start exists
       iff ``max(d_lo, w-1-b) <= min(d_hi, a)`` where
       ``d_lo = max(0, pos - max(1, n-w+1))`` and
       ``d_hi = min(w-1, pos-1)`` bound the window starts that exist
       (this also covers the single truncated window when n < w).

    Each selected position is emitted exactly once, so no dedup pass;
    the window exchange on (id, pos) is the plan's only shuffle.
    Proven identical to the per-window reference implementation
    (tests) and to the DuckDB per-window-replay oracle.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), " ").alias("toks"),
    )
    shingle = F.concat_ws(
        " ", *[F.element_at("toks", F.col("pos") + j) for j in range(k)]
    )
    rows = (
        toks.filter(F.size("toks") >= k)
        .select(
            "id",
            (F.size("toks") - (k - 1)).alias("n"),
            F.explode(F.expr(f"sequence(1, size(toks) - {k - 1})")).alias("pos"),
            "toks",
        )
        .select("id", "n", "pos", hash48(shingle).alias("h"))
    )
    ws = Window.partitionBy("id").orderBy("pos")
    neigh = [
        F.coalesce(F.lag("h", l).over(ws), F.lit(-1)).alias(f"g{l}")
        for l in range(1, w)
    ] + [
        F.coalesce(F.lead("h", l).over(ws), F.lit(_HUGE)).alias(f"h{l}")
        for l in range(1, w)
    ]
    r = rows.select("id", "n", "pos", "h", *neigh)

    def run(prefix, cmp, l=1):
        # maximal consecutive-neighbor run length, capped at w-1
        tail = F.lit(w - 1) if l == w - 1 else run(prefix, cmp, l + 1)
        return F.when(cmp(F.col(f"{prefix}{l}")), tail).otherwise(F.lit(l - 1))

    a = run("g", lambda c: c >= F.col("h"))
    b = run("h", lambda c: c > F.col("h"))
    d_lo = F.greatest(
        F.lit(0), F.col("pos") - F.greatest(F.lit(1), F.col("n") - (w - 1))
    )
    d_hi = F.least(F.lit(w - 1), F.col("pos") - 1)
    selected = F.greatest(d_lo, F.lit(w - 1) - b) <= F.least(d_hi, a)
    return r.filter(selected).select(
        F.col("id").alias(id_col), "pos", F.col("h").alias("fp")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct fingerprint
    hashes: ``(id1, id2, n_shared)``.

    The join key is the fingerprint hash itself (distinct per doc
    first, so a hash repeated at several positions counts once) — a
    plain equi-join shuffle keyed on ``fp``; never all-pairs.  Hot
    fingerprints (boilerplate shared by many docs) fan out
    quadratically like hot shingles in the Jaccard path: ``max_df``
    caps them — fingerprints held by more than ``max_df`` documents
    are dropped before pair generation (one extra df aggregate over
    the already-winnowed rows; a fp at df ceiling d contributes at
    most d(d-1)/2 pairs, so worst-case pair count is bounded by
    |fps| * max_df / 2).  The cap trades recall ONLY on content
    shared that widely — i.e. exactly the boilerplate a contamination
    scan wants to ignore anyway.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, w).select(
        F.col(id_col).alias("id"), "fp"
    ).distinct()
    if max_df is not None:
        rare = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("fp")
        )
        fps = fps.join(rare, "fp", "left_semi")
    a = fps.select(F.col("id").alias("id1"), "fp")
    b = fps.select(F.col("id").alias("id2"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# DuckDB oracle twins -------------------------------------------------------


def winnow_fingerprints_oracle(k: int = 3, w: int = 4) -> str:
    """DuckDB replay of :func:`winnow_fingerprints` (identical rows)."""
    joined = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    h = hash48_sql_duckdb(f"({joined})")
    return f"""
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
), hs AS (
  SELECT doc_id,
         CASE WHEN len(toks) < {k} THEN []
              ELSE list_transform(generate_series(1, len(toks) - {k - 1}),
                                  i -> {h}) END AS hs
  FROM d
), win AS (
  SELECT doc_id, hs, unnest(generate_series(1, greatest(1, len(hs) - {w - 1}))) AS i
  FROM hs WHERE len(hs) > 0
)
SELECT DISTINCT doc_id,
       list_max(list_filter(generate_series(i, least(i + {w - 1}, len(hs))),
                            j -> hs[j] = list_min(hs[i:i+{w - 1}]))) AS pos,
       list_min(hs[i:i+{w - 1}]) AS fp
FROM win
"""


def winnow_overlap_oracle(k: int = 3, w: int = 4, min_shared: int = 2) -> str:
    fps = winnow_fingerprints_oracle(k, w)
    return f"""
WITH fp_rows AS ({fps}),
fps AS (SELECT DISTINCT doc_id AS id, fp FROM fp_rows)
SELECT a.id AS id1, b.id AS id2, count(*) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""
