"""Product quantization (operators/pq.py): determinism, code shape,
recall gate for the shortlist+re-rank pipeline, and full-shortlist
equality with the exact path."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators import pq
from aws_cdk_pipelines_datalake_etl_spark.operators.similarity import brute_force_topk
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR_SMOKE, "embeddings").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq.train_pq_codebooks(emb, m=16, ksub=16)


def test_training_is_deterministic(emb, books):
    again = pq.train_pq_codebooks(emb, m=16, ksub=16)
    assert books == again
    assert len(books) == 16 and len(books[0]) == 16 and len(books[0][0]) == 4


def test_codes_shape_and_range(emb, books):
    rows = pq.pq_encode(emb, books).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == 16
        assert all(0 <= c < 16 for c in r.codes)


def test_rerank_recall_gate(spark, emb, books):
    """ADC shortlist(50) + exact re-rank must recover >= 0.8 of the
    exact top-5 on the test vectors (measured 0.94)."""
    codes = pq.pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = collections.defaultdict(set)
    for r in brute_force_topk(emb, queries, k=5).collect():
        exact[r.query_id].add(r.neighbor_id)
    got = collections.defaultdict(set)
    for r in pq.pq_shortlist_rerank(codes, emb, books, queries, k=5, shortlist=50).collect():
        got[r.query_id].add(r.neighbor_id)
    assert set(got) == set(exact)
    recall = sum(len(got[q] & exact[q]) / 5 for q in exact) / len(exact)
    assert recall >= 0.8, recall


def test_full_shortlist_equals_brute_force(spark, emb, books):
    codes = pq.pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    full = pq.pq_shortlist_rerank(codes, emb, books, queries, k=5, shortlist=n)
    exact = brute_force_topk(emb, queries, k=5)
    assert full.exceptAll(exact).count() == 0
    assert exact.exceptAll(full).count() == 0


def test_ivf_pq_full_probe_full_shortlist_equals_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    full = pq.ivf_pq_topk(emb, queries, k=5, coarse_k=4, nprobe=4, shortlist=n)
    exact = brute_force_topk(emb, queries, k=5)
    assert full.exceptAll(exact).count() == 0
    assert exact.exceptAll(full).count() == 0


def test_ivf_pq_recall_gate_on_clustered_data(spark):
    """On clustered data (the regime IVF exists for) the composed
    IVF+PQ stack at nprobe=2 of 10 with ADC shortlist + re-rank must
    reach recall@5 >= 0.85 vs brute force."""
    from tests.test_similarity import _planted_clusters

    vectors = _planted_clusters(spark).cache()
    try:
        queries = vectors.filter(F.col("vec_id") % 50 == 0)
        exact = collections.defaultdict(set)
        for r in brute_force_topk(vectors, queries, k=5).collect():
            exact[r.query_id].add(r.neighbor_id)
        got = collections.defaultdict(set)
        for r in pq.ivf_pq_topk(
            vectors, queries, k=5, coarse_k=10, nprobe=2, shortlist=50
        ).collect():
            got[r.query_id].add(r.neighbor_id)
        recall = sum(len(got[q] & exact[q]) / 5 for q in exact) / len(exact)
        assert recall >= 0.85, recall
    finally:
        vectors.unpersist()


def test_residual_full_probe_equals_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    full = pq.ivf_pq_topk_residual(
        emb, queries, k=5, coarse_k=4, nprobe=4, shortlist=n
    )
    exact = brute_force_topk(emb, queries, k=5)
    assert full.exceptAll(exact).count() == 0
    assert exact.exceptAll(full).count() == 0


def test_residual_recall_gate_on_clustered_data(spark):
    """Residual encoding must match the raw-vector variant's recall
    gate (>= 0.85 at nprobe=2, shortlist=50).  On THIS synthetic
    corpus residuals are near-isotropic noise, so no superiority is
    claimed — the gate is parity, the full-probe test above is
    exactness."""
    from tests.test_similarity import _planted_clusters

    vectors = _planted_clusters(spark).cache()
    try:
        queries = vectors.filter(F.col("vec_id") % 50 == 0)
        exact = collections.defaultdict(set)
        for r in brute_force_topk(vectors, queries, k=5).collect():
            exact[r.query_id].add(r.neighbor_id)
        got = collections.defaultdict(set)
        for r in pq.ivf_pq_topk_residual(
            vectors, queries, k=5, coarse_k=10, nprobe=2, shortlist=50
        ).collect():
            got[r.query_id].add(r.neighbor_id)
        recall = sum(len(got[q] & exact[q]) / 5 for q in exact) / len(exact)
        assert recall >= 0.85, recall
    finally:
        vectors.unpersist()


# ---------------------------------------------------------------------------
# Broadcast-table ADC (the large-query-batch path): the distance
# tables travel as a broadcast DataFrame instead of plan literals, so
# the expression tree is constant-size in nq.  Property: bit-equal
# result sets vs the literal form; plan: BroadcastHashJoin, no
# per-query literal arrays.
# ---------------------------------------------------------------------------


def _rowset(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_adc_broadcast_equals_literal(spark, emb, books):
    codes = pq.pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10)
    lit = pq.pq_adc_topk(codes, books, queries, k=5, tables="literal")
    bc = pq.pq_adc_topk(codes, books, queries, k=5, tables="broadcast")
    cols = ["query_id", "vec_id", "adc_dist", "rank"]
    assert _rowset(lit, cols) == _rowset(bc, cols)
    # the broadcast plan: hash join on the table data, constant-size
    # expressions (no element_at(array(<ksub lits>)) per query)
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_ivf_pq_broadcast_equals_literal(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    # full probe + corpus shortlist: both forms must equal brute force
    lit = pq.ivf_pq_topk(
        emb, queries, k=5, coarse_k=4, nprobe=4, shortlist=n, tables="literal"
    )
    bc = pq.ivf_pq_topk(
        emb, queries, k=5, coarse_k=4, nprobe=4, shortlist=n, tables="broadcast"
    )
    assert _rowset(lit, cols) == _rowset(bc, cols)
    # partial probe: the pruning decisions themselves must agree
    litp = pq.ivf_pq_topk(
        emb, queries, k=5, coarse_k=4, nprobe=2, shortlist=50, tables="literal"
    )
    bcp = pq.ivf_pq_topk(
        emb, queries, k=5, coarse_k=4, nprobe=2, shortlist=50, tables="broadcast"
    )
    assert _rowset(litp, cols) == _rowset(bcp, cols)


def test_residual_broadcast_equals_literal(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    lit = pq.ivf_pq_topk_residual(
        emb, queries, k=5, coarse_k=4, nprobe=2, shortlist=50, tables="literal"
    )
    bc = pq.ivf_pq_topk_residual(
        emb, queries, k=5, coarse_k=4, nprobe=2, shortlist=50, tables="broadcast"
    )
    assert _rowset(lit, cols) == _rowset(bc, cols)


def test_adc_auto_dispatch(spark, emb, books):
    """auto -> literal for a bounded probe set, broadcast past the
    threshold; both by construction return the same rows (above), so
    here only the strategy choice is pinned via the plan."""
    codes = pq.pq_encode(emb, books)
    small = emb.filter(F.col("vec_id") < 10)
    big = emb.limit(80)
    p_small = pq.pq_adc_topk(
        codes, books, small, k=5, tables="auto", broadcast_threshold=64
    )._jdf.queryExecution().executedPlan().toString()
    p_big = pq.pq_adc_topk(
        codes, books, big, k=5, tables="auto", broadcast_threshold=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in p_small
    assert "BroadcastHashJoin" in p_big


# ---------------------------------------------------------------------------
# Persisted IVF+PQ index: write codes partitioned by bucket + model
# sidecar; probe prunes partitions and must equal brute force at full
# probe + corpus shortlist (both encodings).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("residual", [False, True])
def test_ivfpq_index_full_probe_equals_brute_force(
    spark, emb, tmp_path, residual
):
    path = str(tmp_path / ("idx_res" if residual else "idx_raw"))
    meta = pq.write_ivfpq_index(
        emb, path, coarse_k=4, m=16, ksub=16, residual=residual
    )
    assert set(meta) == {"residual", "centroids", "codebooks"}
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    got = pq.ivfpq_topk_from_index(
        spark, path, queries, emb, k=5, nprobe=4, shortlist=n
    )
    exact = brute_force_topk(emb, queries, k=5)
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_ivfpq_index_probe_prunes_partitions(spark, emb, tmp_path):
    """nprobe=1: the code-table scan must carry a PartitionFilter on
    centroid_id (only probed buckets' files are opened) and read the
    codes, never the vectors."""
    path = str(tmp_path / "idx_prune")
    pq.write_ivfpq_index(emb, path, coarse_k=4, m=16, ksub=16)
    queries = emb.filter(F.col("vec_id") < 3)
    plan = (
        pq.ivfpq_topk_from_index(
            spark, path, queries, emb, k=5, nprobe=1, shortlist=20
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [centroid_id" in plan.replace("#", " #").replace(
        "centroid_id #", "centroid_id#"
    ) or "centroid_id IN" in plan
    assert "BroadcastHashJoin" in plan


def test_tables_strategy_validated(spark, emb, books):
    codes = pq.pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="expected 'auto'"):
        pq.pq_adc_topk(codes, books, queries, tables="broadcsat")
