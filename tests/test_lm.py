"""Bigram LM with stupid backoff: closed-form probabilities on a
hand corpus (seen, backoff-with-known-unigram, and full-OOV paths),
and the CCNet bucket split."""

from __future__ import annotations

import math

from aws_cdk_pipelines_datalake_etl_spark.operators.lm import (
    bigram_logprob,
    perplexity_buckets,
    train_bigram_lm,
)

MICRO = 1_000_000


def _micro_ln(p: float) -> int:
    return math.floor(math.log(p) * MICRO + 0.5)


def test_train_counts(spark):
    train = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    bigrams, unigrams, totals = train_bigram_lm(train)
    assert {(r.w1, r.w2): r.c2 for r in bigrams.collect()} == {
        ("a", "b"): 2,
        ("b", "a"): 1,
        ("b", "c"): 1,
    }
    assert {r.w: r.c1 for r in unigrams.collect()} == {"a": 2, "b": 2, "c": 1}
    t = totals.head()
    assert (t.t_tokens, t.v_vocab) == (5, 3)


def test_score_seen_backoff_and_oov_paths(spark):
    # Train: T=5 tokens, V=3 vocab; C(a)=2, C(b)=2, C(c)=1
    train = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    # Score "a b c z": bigrams (a,b) seen; (b,c) seen; (c,z) unseen
    # with z fully OOV.
    score = spark.createDataFrame([(9, "a b c z")], "doc_id long, text string")
    row = bigram_logprob(train, score).head()
    expect_micro = (
        _micro_ln(2 / 2)           # p(b|a) = C(ab)/C(a)
        + _micro_ln(1 / 2)         # p(c|b) = C(bc)/C(b)
        + _micro_ln(0.4 * (0 + 1) / (5 + 3))  # backoff, z OOV
    )
    assert row.n_bigrams == 3
    assert row.n_backoff == 1
    assert row.avg_logprob == expect_micro / (3 * 1e6)


def test_short_docs_produce_no_rows(spark):
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame([(2, "a")], "doc_id long, text string")
    assert bigram_logprob(train, score).count() == 0


def test_perplexity_buckets_equal_depth_deterministic(spark):
    scored = spark.createDataFrame(
        [(i, -1.0 - i * 0.1) for i in range(9)],
        "doc_id long, avg_logprob double",
    )
    rows = perplexity_buckets(scored).collect()
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r.ppl_bucket, []).append(r.doc_id)
    # Best scores (least negative = ids 0-2) land in bucket 1.
    assert sorted(by_bucket[1]) == [0, 1, 2]
    assert sorted(by_bucket[3]) == [6, 7, 8]
    assert all(len(v) == 3 for v in by_bucket.values())
