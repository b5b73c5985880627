from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators import similarity as sim
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR_SMOKE, "embeddings").cache()


def test_planted_duplicate_is_top1(spark, emb):
    """A vector duplicated under a new id must be its own top-1."""
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(999_999))
    vectors = emb.unionByName(dup)
    top = sim.brute_force_topk(vectors, dup, k=1).collect()
    assert len(top) == 1
    assert top[0].neighbor_id == 0
    assert top[0].cosine == pytest.approx(1.0)


def test_topk_shape_and_determinism(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    a = sim.brute_force_topk(emb, q, k=5).collect()
    b = sim.brute_force_topk(emb, q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_q = {}
    for r in a:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_ivf_recall_against_brute_force(spark, emb):
    """IVF with nprobe=4 of 8 buckets must keep decent recall@5."""
    q = emb.filter(F.col("vec_id") < 10)
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_topk(emb, q, centroids, k=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall@5 {recall}"


def test_near_dup_pairs_ordered_ids(spark, emb):
    pairs = sim.embedding_near_dup_pairs(emb, threshold=0.3).collect()
    assert pairs, "threshold 0.3 should produce pairs on test data"
    assert all(r.id1 < r.id2 for r in pairs)


def test_hyperplane_lsh_equals_exact_pairs(spark, emb):
    """At the default band settings the LSH miss probability is ~1e-4
    per true pair, so the candidate-verified output must equal the
    exact all-pairs formulation on test data."""
    exact = {
        (r.id1, r.id2, r.cosine)
        for r in sim.embedding_near_dup_pairs(emb, threshold=0.35).collect()
    }
    lsh = {
        (r.id1, r.id2, r.cosine)
        for r in sim.hyperplane_lsh_near_dup_pairs(emb, threshold=0.35).collect()
    }
    assert exact, "threshold 0.35 should produce pairs on test data"
    assert lsh == exact


def test_quantize_reconstruction_error_bounded(spark):
    """int8 round-trip: every component within scale/2 of the
    original, codes within [-127, 127]."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rt = dequantize_embeddings(quantize_embeddings(emb))
    bad = rt.select(
        F.exists(
            F.zip_with(
                "embedding",
                "embedding_hat",
                lambda a, b: (F.abs(a.cast("double") - b) > F.col("scale") / 2 + 1e-12),
            ),
            lambda x: x,
        ).alias("violated"),
        F.exists(F.col("q8"), lambda c: F.abs(c) > 127).alias("overflow"),
    )
    agg = bad.agg(
        F.sum(F.col("violated").cast("int")).alias("nv"),
        F.sum(F.col("overflow").cast("int")).alias("no"),
    ).collect()[0]
    assert (agg["nv"], agg["no"]) == (0, 0)
