"""Char-trigram NB language ID: held-out accuracy per language,
'und' fallback, determinism, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.langid import (
    LANGID_SAMPLES,
    language_id_nb,
    train_langid_model,
)

HELD_OUT = [
    (1, "the weather is nice and the children play in the garden", "en"),
    (2, "los ninos juegan en el jardin y la casa es muy bonita", "es"),
    (3, "die kinder spielen im garten und das wetter ist heute schoen", "de"),
    (4, "les enfants jouent dans le jardin et la maison est tres belle", "fr"),
    (5, "i bambini giocano nel giardino e la casa e molto bella", "it"),
    (6, "as criancas brincam no jardim e a casa e muito bonita", "pt"),
    (7, "de kinderen spelen in de tuin en het weer is vandaag mooi", "nl"),
]


def test_held_out_sentences_classify_correctly(spark):
    """One original held-out sentence per trained language — none of
    them appears in LANGID_SAMPLES — must classify correctly."""
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in language_id_nb(df).collect()}
    for i, _, want in HELD_OUT:
        assert got[i].lang == want, (i, got[i].lang, want)
        assert got[i].score_micro < 0
        assert got[i].n_trigrams > 0


def test_und_for_empty_and_symbol_only(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "12345 !!! ###"), (3, "a")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in language_id_nb(df).collect()}
    for i in (1, 2):
        assert got[i].lang == "und"
        assert got[i].score_micro == 0
        assert got[i].n_trigrams == 0
    # 'a' normalizes to ' a ' -> exactly one trigram: classified
    assert got[3].n_trigrams == 1
    assert got[3].lang != "und"


def test_training_sample_self_classification(spark):
    """Each training sample classifies as its own language (the
    weakest sanity bar for any supervised classifier)."""
    rows = [(i, text) for i, (_, text) in enumerate(sorted(LANGID_SAMPLES.items()))]
    langs = [lang for lang, _ in sorted(LANGID_SAMPLES.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang for r in language_id_nb(df).collect()}
    for i, want in enumerate(langs):
        assert got[i] == want, (i, got[i], want)


def test_model_shapes_and_partition_invariance(spark):
    model, consts = train_langid_model(spark)
    n_langs = len(LANGID_SAMPLES)
    assert consts.count() == n_langs
    m = model.groupBy("lang").count().collect()
    assert len(m) == n_langs
    assert all(r["count"] > 100 for r in m)  # real trigram coverage
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT], "doc_id long, text string"
    )
    a = sorted(map(tuple, language_id_nb(df.coalesce(1)).collect()))
    b = sorted(map(tuple, language_id_nb(df.repartition(5)).collect()))
    assert a == b


def test_plan_broadcasts_model_no_python(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    plan = (
        language_id_nb(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure Catalyst, no UDF at all
