from __future__ import annotations

import pytest

from aws_cdk_pipelines_datalake_etl_spark.operators import text as tx


@pytest.fixture()
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the hat"),
            (2, "abc123 xyz"),
            (3, "el que la de y"),
        ],
        ["doc_id", "text"],
    )


def test_text_metrics_values(spark, tiny):
    m = {r.doc_id: r for r in tx.text_metrics(tiny).collect()}
    r1 = m[1]
    assert r1.n_tokens == 5
    assert r1.n_uniq_tokens == 4  # 'the' twice
    assert r1.n_chars == 19
    assert r1.avg_token_len == pytest.approx(15 / 5)
    assert r1.stopword_ratio == pytest.approx(3 / 5)  # the, and, the
    r2 = m[2]
    assert r2.digit_ratio == pytest.approx(3 / 10)


def test_langid(spark, tiny):
    p = {r.doc_id: r.pred_lang for r in tx.predict_language(tiny).collect()}
    assert p[1] == "en"
    assert p[3] == "es"
    assert p[2] == "und"  # no stopwords at all


def test_token_count(spark, tiny):
    t = {r.doc_id: r for r in tx.token_count_bpe_ish(tiny).collect()}
    assert t[1].n_whitespace_tokens == 5
    # ceil(3/4)*3 ('the','cat','and') + ceil(3/4) ('hat') + ceil(3/4) ('the')
    assert t[1].n_bpe_ish_tokens == 5
    assert t[2].n_bpe_ish_tokens == 2 + 1  # ceil(6/4)=2, ceil(3/4)=1
