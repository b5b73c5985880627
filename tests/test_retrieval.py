"""BM25 retrieval: closed-form score check on a tiny corpus, plus the
plan properties that keep the probe cheap at corpus scale."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
    bm25_doc_stats,
    bm25_topk,
)
from aws_cdk_pipelines_datalake_etl_spark.plans import registry as R
from aws_cdk_pipelines_datalake_etl_spark.plans.explain import formatted_plan

from tests.conftest import SF_DIR_SMOKE

DOCS = [
    (1, "spark shuffle join join"),
    (2, "spark broadcast"),
    (3, "python pandas arrow arrow arrow"),
]


def _bm25_reference(term_hits, dls, n_docs, k1=1.2, b=0.75):
    """Closed-form reference: term_hits = {(doc, term): tf},
    dls = {doc: dl}."""
    avgdl = sum(dls.values()) / n_docs
    dfreq: dict[str, int] = {}
    for (_, t) in term_hits:
        dfreq[t] = dfreq.get(t, 0) + 1
    out: dict[tuple[int, str], float] = {}
    for (d, t), tf in term_hits.items():
        idf = math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
        part = idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * (dls[d] / avgdl))
        )
        out[(d, t)] = math.floor(part * 1_000_000 + 0.5)
    return out


def test_bm25_matches_closed_form(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [("q1", "join"), ("q1", "spark"), ("q2", "arrow")],
        "query_id string, term string",
    )
    got = {
        (r.query_id, r.doc_id): (r.bm25, r.rank)
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    hits = {
        (1, "join"): 2,
        (1, "spark"): 1,
        (2, "spark"): 1,
        (3, "arrow"): 3,
    }
    ref = _bm25_reference(hits, {1: 4, 2: 2, 3: 5}, 3)
    q1_doc1 = (ref[(1, "join")] + ref[(1, "spark")]) / 1e6
    q1_doc2 = ref[(2, "spark")] / 1e6
    q2_doc3 = ref[(3, "arrow")] / 1e6
    assert got[("q1", 1)] == (q1_doc1, 1)
    assert got[("q1", 2)] == (q1_doc2, 2)
    assert got[("q2", 3)] == (q2_doc3, 1)
    assert len(got) == 3  # doc 3 never matches q1, docs 1/2 never q2


def test_bm25_rank_ties_break_on_doc_id(spark):
    docs = spark.createDataFrame(
        [(10, "x y"), (7, "x y"), (9, "x y")], "doc_id long, text string"
    )
    queries = spark.createDataFrame([("q", "x")], "query_id string, term string")
    rows = bm25_topk(docs, queries, k=2).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [7, 9]  # identical scores -> id order


def test_bm25_doc_stats_counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docterm, docstats = bm25_doc_stats(docs)
    assert docterm.filter(
        (F.col("doc") == 3) & (F.col("term") == "arrow")
    ).head().tf == 3
    assert {r.doc: r.dl for r in docstats.collect()} == {1: 4, 2: 2, 3: 5}


def test_bm25_probe_broadcasts_query_side(spark):
    """The corpus-sized index must never reshuffle to meet the query
    terms: every join against the query-term table is a broadcast."""
    df = R.retrieval_bm25_topk(spark, SF_DIR_SMOKE)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # One corpus token explode feeds tf/dl/df: the docterm aggregation
    # exchange must be planned once and REUSED for the df(term) stat.
    # Exchange reuse is an AQE-time decision, so materialize first and
    # read the final plan.
    df.collect()
    final = formatted_plan(df)
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final


def test_rrf_fuse_hand_computed(spark):
    """Cormack-style RRF in exact nano-units: two 3-deep lists, a
    fused tie broken on doc id, singletons contributing one partial."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
        rrf_fuse,
    )

    sys_a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    sys_b = spark.createDataFrame(
        [("q", 2, 1), ("q", 1, 2), ("q", 4, 3)],
        "query_id string, doc_id long, rank int",
    )
    rows = {r.doc_id: r for r in rrf_fuse([sys_a, sys_b]).collect()}
    nano = 1_000_000_000
    both = nano // 61 + nano // 62
    assert rows[1].rrf_nano == both and rows[1].n_systems == 2
    assert rows[2].rrf_nano == both and rows[2].n_systems == 2
    assert rows[3].rrf_nano == nano // 63 and rows[3].n_systems == 1
    assert rows[4].rrf_nano == nano // 63
    # d1 == d2 on score -> doc id ascending breaks the tie
    assert (rows[1].rank, rows[2].rank, rows[3].rank, rows[4].rank) == (
        1, 2, 3, 4,
    )


def test_rrf_fuse_k_cutoff_and_validation(spark):
    import pytest as _pt

    from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
        rrf_fuse,
    )

    ranked = spark.createDataFrame(
        [("q", d, d) for d in range(1, 8)],
        "query_id string, doc_id long, rank int",
    )
    out = rrf_fuse([ranked], k=3).collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3]
    with _pt.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_retrieval_metrics_hand_computed(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
        retrieval_metrics,
    )

    results = spark.createDataFrame(
        # q1: relevant doc 2 at rank 2 of 3; q2: nothing relevant
        # retrieved; q_rank11: its only relevant doc sits below k.
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3),
         ("q2", 4, 1), ("q2", 5, 2),
         ("q_rank11", 6, 11)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        # q3 judged but never retrieved; q_norel has rows in results
        # only via q2's absence (i.e. zero-relevant queries excluded).
        [("q1", 2), ("q1", 9), ("q2", 7), ("q3", 1), ("q_rank11", 6)],
        "query_id string, doc_id long",
    )
    micro = 1_000_000
    rows = {
        r.query_id: r
        for r in retrieval_metrics(results, qrels, k=10).collect()
    }
    assert set(rows) == {"q1", "q2", "q3", "q_rank11"}
    q1 = rows["q1"]
    assert (q1.hits_at_k, q1.n_relevant) == (1, 2)
    assert q1.recall_at_k_micro == micro // 2
    assert q1.mrr_micro == micro // 2  # first relevant at rank 2
    for missq in ("q2", "q3", "q_rank11"):
        r = rows[missq]
        assert (r.hits_at_k, r.recall_at_k_micro, r.mrr_micro) == (0, 0, 0)


def test_retrieval_metrics_broadcasts_qrels(spark):
    """The judgment table rides a broadcast — the results side never
    shuffles for the relevance join."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
        retrieval_metrics,
    )

    results = spark.createDataFrame(
        [("q1", 1, 1)], "query_id string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q1", 1)], "query_id string, doc_id long"
    )
    plan = formatted_plan(retrieval_metrics(results, qrels))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_explicit_qrels(spark):
    """DPR mining with explicit positives: the qrels docs vanish, the
    survivors keep BM25 order, neg_rank is dense from 1."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
        bm25_hard_negatives,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),
            (2, "spark spark other"),
            (3, "spark other other"),
            (4, "other other other"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "spark")], "query_id string, term string"
    )
    qrels = spark.createDataFrame(
        [("q1", 1)], "query_id string, doc_id long"
    )
    out = bm25_hard_negatives(
        docs, queries, positives=qrels, k_neg=2, depth=10
    ).collect()
    # doc 1 (the positive) is gone; docs 2, 3 are the best negatives
    assert [(r["doc_id"], r["neg_rank"]) for r in out] == [(2, 1), (3, 2)]
    # original BM25 ranks are preserved alongside (doc 1 held rank 1)
    assert [r["rank"] for r in out] == [2, 3]


def test_hard_negatives_match_all_rule(spark):
    """positives=None: a doc matching EVERY query term is presumed
    positive; the mined negatives are exactly the partial matchers,
    best BM25 first."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
        bm25_hard_negatives,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta noise"),        # full match -> positive
            (2, "alpha alpha alpha alpha"),  # hard negative (no beta)
            (3, "beta beta beta"),           # hard negative (no alpha)
            (4, "noise noise noise"),        # no match at all -> absent
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "alpha"), ("q1", "beta")], "query_id string, term string"
    )
    out = bm25_hard_negatives(docs, queries, k_neg=5, depth=10).collect()
    got = {r["doc_id"] for r in out}
    assert got == {2, 3}
    assert all(r["n_matched_terms"] == 1 for r in out)
    assert [r["neg_rank"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1,
        2,
    ]


def test_hard_negatives_plan_shape(spark):
    """Qrels exclusion is a broadcast anti join; no Python, no
    cartesian product anywhere in the mining plan."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.retrieval import (
        bm25_hard_negatives,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [("q1", "spark")], "query_id string, term string"
    )
    qrels = spark.createDataFrame(
        [("q1", 2)], "query_id string, doc_id long"
    )
    plan = formatted_plan(
        bm25_hard_negatives(docs, queries, positives=qrels, k_neg=2)
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
