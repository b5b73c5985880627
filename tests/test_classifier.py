"""Distributed logistic-regression quality classifier: held-out
agreement, exact partition invariance (integer sums), weak-supervision
composition with gopher_rules, plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.classifier import (
    hashed_features,
    score_quality,
    train_quality_classifier,
)

GOOD = "the quick brown fox jumps over lazy dog garden house tree river".split()
BAD = "buy cheap now click free winner prize casino pills offer".split()


def _corpus(spark, n=200):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            text = " ".join(GOOD[(i + j) % len(GOOD)] for j in range(12))
            rows.append((i, text, True))
        else:
            text = " ".join(BAD[(i + j) % len(BAD)] for j in range(8)) + " the of"
            rows.append((i, text, False))
    return rows


def test_separable_corpus_held_out_accuracy(spark):
    rows = _corpus(spark)
    train = spark.createDataFrame(
        rows[:160], "doc_id long, text string, label boolean"
    )
    held = spark.createDataFrame(
        rows[160:], "doc_id long, text string, label boolean"
    )
    w = train_quality_classifier(train, "label", dim=512, iterations=25, lr=1.0)
    scored = {r.doc_id: r for r in score_quality(held, w, dim=512).collect()}
    acc = sum(1 for i, _, y in rows[160:] if scored[i].pred == y) / 40
    assert acc == 1.0
    # probs are calibrated to the right side of 0.5 and consistent
    for i, _, y in rows[160:]:
        r = scored[i]
        assert (r.prob >= 0.5) == bool(r.pred)
        assert r.pred == (r.logit_micro >= 0)


def test_training_is_partition_layout_invariant_exact(spark):
    """The integer-sum design makes the learned weights BIT-identical
    across partitionings, not merely close."""
    rows = _corpus(spark, n=80)
    a = spark.createDataFrame(
        rows, "doc_id long, text string, label boolean"
    ).coalesce(1)
    b = spark.createDataFrame(
        rows, "doc_id long, text string, label boolean"
    ).repartition(13)
    wa = train_quality_classifier(a, "label", dim=256, iterations=8, lr=1.0)
    wb = train_quality_classifier(b, "label", dim=256, iterations=8, lr=1.0)
    assert np.array_equal(wa, wb)


def test_weak_supervision_from_gopher_rules(spark):
    """The production composition: rule labels -> classifier.  Docs
    built so the rules fire on length; the classifier must recover the
    rule decision on held-out docs from the word distribution alone."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        gopher_rules,
    )

    rows = []
    for i in range(120):
        if i % 2 == 0:  # long, stopword-rich: keep
            text = ("the data and that point be to of have with value " * 6).strip()
        else:  # too short: drop
            text = "tiny fragment only"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labeled = docs.join(
        gopher_rules(docs).select("doc_id", "keep"), "doc_id"
    )
    train = labeled.filter(F.col("doc_id") < 100)
    held = labeled.filter(F.col("doc_id") >= 100)
    w = train_quality_classifier(train, "keep", dim=256, iterations=10, lr=1.0)
    got = {r.doc_id: r.pred for r in score_quality(held, w, dim=256).collect()}
    want = {r.doc_id: r.keep for r in held.select("doc_id", "keep").collect()}
    assert got == want


def test_feature_and_scoring_plan_shape(spark):
    rows = _corpus(spark, n=20)
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    w = np.zeros(257)
    w[0] = 0.5
    w[256] = -0.1
    plan = (
        score_quality(df, w, dim=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # weights broadcast
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure Catalyst
    # bias row exists for every doc
    feats = hashed_features(df, dim=256)
    n_bias = feats.filter(F.col("slot") == -1).count()
    assert n_bias == 20


def test_one_step_micro_matches_local_reference(spark):
    """train_one_step_micro's weight table equals a driver-side
    replica of the same math (portable hash, integer residual at w=0,
    floor(-lr*g/n + 0.5)) on a small fixture — and is EXACTLY
    partition-layout invariant."""
    import hashlib

    from aws_cdk_pipelines_datalake_etl_spark.operators.classifier import (
        train_one_step_micro,
    )

    rows = [
        (1, "alpha beta beta gamma", True),
        (2, "beta gamma gamma delta", False),
        (3, "alpha alpha epsilon", True),
        (4, "delta delta delta", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    dim = 64

    def h48(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % dim

    g: dict[int, int] = {}
    for _, text, y in rows:
        r = 500_000 - 1_000_000 * int(y)
        slots: dict[int, int] = {-1: 1}
        for tok in text.lower().split(" "):
            if tok:
                slots[h48(tok)] = slots.get(h48(tok), 0) + 1
        for s, k in slots.items():
            g[s] = g.get(s, 0) + k * r
    import math

    want = {
        s: int(math.floor(-1.0 * gm / len(rows) + 0.5))
        for s, gm in g.items()
    }
    want = {s: w for s, w in want.items() if w != 0}
    got = {
        r.slot: r.w_micro
        for r in train_one_step_micro(df, "label", dim=dim).collect()
    }
    assert got == want
    got7 = {
        r.slot: r.w_micro
        for r in train_one_step_micro(
            df.repartition(7), "label", dim=dim
        ).collect()
    }
    assert got7 == want


def test_score_quality_micro_sign_and_plan(spark):
    """score_quality_micro: pred == (logit_micro >= 0) for every doc,
    docs with no matching slots score exactly 0, and the plan
    broadcasts the weight table with no Python anywhere."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.classifier import (
        score_quality_micro,
        train_one_step_micro,
    )

    train = spark.createDataFrame(
        [(i, "good text with signal" if i % 2 else "bad noise", i % 2 == 1)
         for i in range(20)],
        "doc_id long, text string, label boolean",
    )
    w = train_one_step_micro(train, "label", dim=128)
    held = spark.createDataFrame(
        [(100, "good text with signal"), (101, "bad noise"),
         (102, "zzz qqq www")],  # no trained slot except bias
        "doc_id long, text string",
    )
    out = score_quality_micro(held, w, dim=128)
    got = {r.doc_id: r for r in out.collect()}
    for r in got.values():
        assert r.pred == (r.logit_micro >= 0)
    assert got[100].logit_micro > got[101].logit_micro
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_train_one_step_micro_plan_no_doc_join(spark):
    """r12: the gradient folds the residual onto the exploded token
    row — no per-doc feature/residual join survives in the plan (the
    only joins are the broadcast bias/n cross joins)."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.classifier import (
        train_one_step_micro,
    )
    from aws_cdk_pipelines_datalake_etl_spark.plans.explain import (
        formatted_plan,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 else "delta", i % 2 == 1)
         for i in range(10)],
        "doc_id long, text string, label boolean",
    )
    plan = formatted_plan(train_one_step_micro(df, "label", dim=64))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BatchEvalPython" not in plan
