"""Winnowing document fingerprints (the MOSS algorithm).

Whole-doc fingerprints (:func:`..operators.dedup.fingerprint`) only
catch exact/normalized copies; winnowing selects a *guaranteed
position-covering subset* of k-gram hashes, so two documents sharing
any run of >= w + k - 1 tokens are guaranteed to share at least one
fingerprint — the classic rolling-hash fingerprinting scheme for
partial-overlap / plagiarism / contamination detection
(Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003 — public literature).

Algorithm, per document (entirely **row-local** — token array ->
k-gram hash array -> per-window argmin — zero shuffles until the
overlap join):

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import hash48_sql_duckdb

# Spark-side expression fragments ------------------------------------------

_HASH48 = "CAST(conv(substring(md5({s}), 1, 12), 16, 10) AS BIGINT)"


def _kgram_hashes_expr(toks: str, k: int) -> str:
    """Array of 48-bit hashes of the word k-grams of ``toks``."""
    joined = " || ' ' || ".join(f"{toks}[i + {j} - 1]" for j in range(k))
    h = _HASH48.format(s=f"({joined})")
    return (
        f"CASE WHEN size({toks}) < {k} THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - {k - 1}), i -> {h}) END"
    )


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

    Everything up to the final explode is a row-local array pipeline
    (whole-stage codegen, no Python, no shuffle); the ``distinct``
    de-dupes the same (pos, fp) selected by overlapping windows and is
    the only exchange — on (doc, pos, fp) triples, ~|kgrams|/w rows.
    """
    hs_expr = _kgram_hashes_expr("toks", k)
    # per window i (1-based over hashes array `hs`, n - w + 1 windows;
    # if n < w a single window covers the whole array): minimum hash,
    # rightmost position on ties
    minv = f"array_min(slice(hs, i, {w}))"
    pos = (
        f"array_max(filter(sequence(i, least(i + {w - 1}, size(hs))),"
        f" j -> element_at(hs, j) = {minv}))"
    )
    sel = (
        f"transform(sequence(1, greatest(1, size(hs) - {w - 1})),"
        f" i -> named_struct('pos', {pos}, 'fp', {minv}))"
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.split(F.lower(F.col(text_col)), " ").alias("toks"),
        )
        .select("id", F.expr(hs_expr).alias("hs"))
        .filter(F.size("hs") > 0)
        .select("id", F.explode(F.expr(sel)).alias("s"))
        .select(
            F.col("id").alias(id_col),
            F.col("s.pos").alias("pos"),
            F.col("s.fp").alias("fp"),
        )
        .distinct()
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
