"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what a 100 TB vector corpus needs:

- **Brute-force top-k** — exact cosine against a (small) query set.
  The query set is broadcast, so the big side streams through a
  narrow map + per-query top-k window; no all-pairs shuffle.  This is
  the correctness baseline.
- **IVF-style bucketed ANN** — vectors are assigned to their nearest
  centroid (a fixed, deterministic codebook) at write time; a query
  probes only the ``nprobe`` nearest buckets, cutting the scanned
  fraction to ~nprobe/n_centroids.  Approximate (recall < 1 when the
  true neighbor lives in an unprobed bucket) — the scale path.

Cosines are computed with sequential-fold array expressions
(:mod:`..functions.vector`) entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround

from aws_cdk_pipelines_datalake_etl_spark.functions.vector import as_double_array, cosine


def _with_double_vec(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, as_double_array(vec_col))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` is expected to be small (it is broadcast); neighbors
    exclude the query vector itself.  Output is deterministic: ties
    broken by neighbor id on the 6-dp-rounded cosine.
    """
    v = _with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col).alias("neighbor_id"), "v"
    )
    q = _with_double_vec(queries, vec_col, "q").select(
        F.col(id_col).alias("query_id"), "q"
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", pround(cosine("q", "v"), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def assign_ivf_buckets(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF assignment: each vector to its nearest centroid (by cosine).

    ``centroids`` is a small broadcast codebook DataFrame
    (centroid_id, embedding).  At scale this runs once at ingest and
    the output is written bucketed/partitioned by centroid_id so a
    probe only reads its buckets' files (partition pruning).
    """
    v = _with_double_vec(vectors, vec_col, "v").select(id_col, "v")
    c = _with_double_vec(centroids, vec_col, "c").select(
        F.col("centroid_id"), "c"
    )
    scored = v.join(F.broadcast(c)).withColumn("sim", pround(cosine("v", "c"), 6))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "centroid_id", "v")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` closest buckets.

    Candidate set = vectors whose bucket is among the query's nprobe
    nearest centroids; exact cosine + top-k inside the candidates.
    """
    bucketed = assign_ivf_buckets(vectors, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("centroid_id").alias("v_bucket"),
        "v",
    )
    q = _with_double_vec(queries, vec_col, "q").select(
        F.col(id_col).alias("query_id"), "q"
    )
    c = _with_double_vec(centroids, vec_col, "c").select("centroid_id", "c")
    qprobe = (
        q.join(F.broadcast(c))
        .withColumn("sim", pround(cosine("q", "c"), 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("centroid_id")
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q", F.col("centroid_id").alias("v_bucket"))
    )
    scored = (
        bucketed.join(F.broadcast(qprobe), "v_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", pround(cosine("q", "v"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_lsh_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    nbits: int = 96,
    bands: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by cosine >= threshold via random-hyperplane LSH
    — the 100 TB path that replaces the all-pairs product of
    :func:`embedding_near_dup_pairs`.

    Sign-bit signatures (SimHash for vectors, Charikar 2002): bit i is
    ``sign(v . h_i)`` for a fixed seeded Gaussian hyperplane h_i; two
    vectors at angle theta agree per bit with prob 1 - theta/pi.  Bits
    are grouped into ``bands`` bands of r = nbits/bands rows; vectors
    sharing any full band land in one LSH bucket.  A true pair at
    cosine c is missed with prob (1 - p^r)^bands — at the defaults
    and c = 0.4 that is ~1e-4, driven to equality-with-exact at test
    scale (the oracle's claim), and vanishing for the high-c pairs
    dedup actually targets.

    Physical plan: one Arrow-batched pandas UDF pass computes all
    band keys per vector with a single numpy matmul (N x dim @ dim x
    nbits — this is the textbook case where a vectorized UDF beats
    96 fold-expressions); explode to (bucket_key, id); ONE shuffle on
    the packed long key; pairs expand inside each bucket; exact
    JVM-side cosine verifies every candidate.  No all-pairs join
    anywhere, and bucket keys shuffle as 8-byte longs.
    """
    from pyspark.sql.functions import pandas_udf

    if nbits % bands:
        raise ValueError("nbits must be divisible by bands")
    rows_per_band = nbits // bands

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf cannot resolve — series-to-series is
    # inferred from the single argument
    @pandas_udf("array<long>")
    def band_keys(embs):
        import numpy as np
        import pandas as pd

        M = np.stack(embs.to_numpy())  # N x dim
        # hyperplanes depend only on (dim, nbits, seed) — identical
        # in every batch on every executor
        H = np.random.RandomState(seed).standard_normal((M.shape[1], nbits))
        bits = (M @ H) > 0  # N x nbits
        packed = bits.reshape(len(M), bands, rows_per_band) @ (
            1 << np.arange(rows_per_band, dtype=np.int64)
        )  # N x bands, each < 2^r
        # disambiguate band index into the key: (band << r) | rowbits
        keys = (np.arange(bands, dtype=np.int64) << rows_per_band) | packed
        return pd.Series(list(keys))

    banded = vectors.select(
        F.col(id_col).alias("id"), F.explode(band_keys(F.col(vec_col))).alias("bk")
    )
    buckets = (
        banded.groupBy("bk")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    candidates = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> named_struct('id1', least(x, y), 'id2', greatest(x, y)))))"
                )
            ).alias("p")
        )
        .select("p.id1", "p.id2")
        .distinct()
    )
    v1 = _with_double_vec(vectors, vec_col, "v1").select(
        F.col(id_col).alias("id1"), "v1"
    )
    v2 = _with_double_vec(vectors, vec_col, "v2").select(
        F.col(id_col).alias("id2"), "v2"
    )
    return (
        candidates.join(v1, "id1")
        .join(v2, "id2")
        .withColumn("cosine", pround(cosine("v1", "v2"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; all-pairs join —
    verification-grade.  At scale, run :func:`assign_ivf_buckets`
    first and only compare within buckets)."""
    v1 = _with_double_vec(vectors, vec_col, "v1").select(
        F.col(id_col).alias("id1"), "v1"
    )
    v2 = _with_double_vec(vectors, vec_col, "v2").select(
        F.col(id_col).alias("id2"), "v2"
    )
    return (
        v1.join(v2, F.col("id1") < F.col("id2"))
        .withColumn("cosine", pround(cosine("v1", "v2"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q8",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    scale = max|x| / 127, values -> round(x / scale) in [-127, 127].
    At 100 TB of vectors this is the 4x storage/shuffle cut (float32
    -> int8 + one float scale) that makes ANN layouts affordable;
    reconstruction error is bounded by scale/2 per component.

    Pure codegen'd array expressions (aggregate + transform), no UDF.
    Rounding is floor(x + 0.5) so the quantized codes are identical on
    any engine (banker's rounding differs across engines).  All-zero
    vectors get scale 0 and all-zero codes.
    """
    v = as_double_array(vec_col)
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = absmax / F.lit(127.0)
    codes = F.transform(
        v,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(x / scale + 0.5))
        .cast("int"),
    )
    return df.withColumn(scale_col, scale).withColumn(q_col, codes)


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q8",
    scale_col: str = "scale",
    out_col: str = "embedding_hat",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings` (approximate)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda c: c.cast("double") * F.col(scale_col)),
    )
