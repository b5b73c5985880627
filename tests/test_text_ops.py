from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_chunking_covers_every_token_with_overlap(spark):
    """Every token index must land in >= 1 chunk; consecutive chunks
    overlap by chunk_tokens - stride; rebuilding the doc from
    stride-aligned prefixes reproduces the original token stream."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.chunking import (
        chunk_documents,
    )

    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = sorted(
        chunk_documents(df, chunk_tokens=64, stride=48).collect(),
        key=lambda r: r.chunk_idx,
    )
    covered = []
    for i, r in enumerate(chunks):
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_chunk_tokens
        start = i * 48
        assert toks == [f"w{j}" for j in range(start, min(start + 64, 150))]
        covered.extend(range(start, start + len(toks)))
    assert set(covered) == set(range(150))


def test_packing_bins_respect_budget_shape(spark):
    """Within a shard, cumulative tokens of all docs in bins < b must
    not exceed (b) * budget; bin ids are non-decreasing in doc order."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.chunking import (
        pack_greedy_bins,
    )
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

    from .conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    out = pack_greedy_bins(docs, budget_tokens=512).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        prev_bin = 0
        for r in rows:
            cum += r.n_tokens
            assert r.bin_id == (cum - 1) // 512
            assert r.bin_id >= prev_bin
            prev_bin = r.bin_id


def test_contamination_finds_planted_leak(spark):
    """A corpus doc that quotes an eval doc's text must surface with
    the right shared-shingle count."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import contamination

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated words about spark and parquet files"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got = contamination(corpus, eval_docs, k=3, min_shared=2).collect()
    assert len(got) == 1
    row = got[0]
    # eval doc has 6 distinct trigrams, all present in doc 1
    assert (row["doc_id"], row["eval_id"], row["n_shared"]) == (1, 100, 6)


def test_redact_pii_scrubs_emails_and_phones(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@corp.example.org today"),
            (2, "call 555-867-5309 or 020 7946 0958 ok"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["redacted"] for r in redact_pii(df).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2].startswith("call <PHONE> or")
    assert got[3] == "nothing sensitive here"


def test_gopher_rules_each_rule_fires(spark):
    """One hand-crafted doc per Gopher rule, each failing exactly that
    rule (other rules passing), plus one clean doc that passes all."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        gopher_rules,
    )

    base = ("the data and that point be to of have with value " * 6).strip()
    docs = [
        (0, base),  # clean: 66 words, sane lengths, stopwords present
        (1, "the be to of and"),  # too few words
        (2, ("a b c d " * 20).strip() + " the be"),  # mean word len < 3
        (3, base + " " + "#tag " * 12),  # symbol ratio > 0.1
        (4, "\n".join(["- item"] * 30 + [base])),  # 30/31 > 90% bullet lines
        (5, "\n".join(["so..."] * 2 + [base, base])),  # >30% ellipsis? 2/4=50%
        (6, base + " " + "123 456 789 000 111 222 333 444 555 666 777 888 999 101 202 303 404 "
            * 2),  # <80% alphabetic words
        (7, ("apple banana cherry durian elder fig grape " * 10).strip()),  # <2 stopwords
        # list-heavy but LEGITIMATE docs (changelog/FAQ shape) that the
        # published rule keeps — removal needs >90% bullet lines:
        (8, "\n".join(["- item"] * 5 + [base])),  # 5/6 ~ 83% bullets: keep
        (9, "\n".join(["- item"] * 9 + [base])),  # 9/10 = 90% exactly: keep
    ]
    out = {r["doc_id"]: r for r in gopher_rules(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).collect()}
    assert out[0].keep
    assert out[8].keep and out[8].r_bullet_lines
    assert out[9].keep and out[9].r_bullet_lines  # 10*9 <= 9*10 boundary
    expected_fail = {
        1: "r_word_count",
        2: "r_mean_word_len",
        3: "r_symbol_ratio",
        4: "r_bullet_lines",
        5: "r_ellipsis_lines",
        6: "r_alpha_words",
        7: "r_stopwords",
    }
    for doc, rule in expected_fail.items():
        r = out[doc]
        assert not r.keep, doc
        assert not r[rule], (doc, rule)


def test_gopher_rules_integer_boundaries(spark):
    """Thresholds sit exactly ON the boundary: 10 words with exactly
    one #-word (ratio exactly 0.1) must PASS (<=); mean word length
    exactly 3.0 and exactly 10.0 must PASS."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        gopher_rules,
    )

    # exactly 0.1 symbol ratio: 50 words, 5 with '#'
    w50 = ("the be to of and that have with " + "word " * 37).strip()
    assert len(w50.split()) == 45
    doc_a = w50 + " " + "#x #x #x #x #x"  # 50 words, 5 symbolish
    out = {r["doc_id"]: r for r in gopher_rules(
        spark.createDataFrame([(1, doc_a)], "doc_id long, text string")
    ).collect()}
    assert out[1].r_symbol_ratio  # 10*5 <= 50 boundary holds


def test_compression_ratio_orders_repetition_below_diversity(spark):
    """The signal the filter relies on: heavily repeated text
    compresses far better (lower ratio) than diverse text; empty docs
    emit NULL; the integer ratio is deterministic across runs."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        compression_ratio,
    )

    rows = [
        (1, "spam " * 200),
        (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["ratio_micro"] < got[2]["ratio_micro"]
    assert got[3]["ratio_micro"] is None and got[3]["n_bytes"] == 0
    assert got[1]["n_bytes"] == len("spam " * 200)
    again = {
        r["doc_id"]: r["ratio_micro"]
        for r in compression_ratio(df.repartition(3)).collect()
    }
    assert again == {k: v["ratio_micro"] for k, v in got.items()}


def test_compression_ratio_plan_arrow_no_shuffle(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        compression_ratio,
    )

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = (
        compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_compression_ratio_null_text_is_empty(spark):
    """ADVICE r9: NULL text must behave exactly like an empty doc
    (ratio NULL), not become the 4-byte literal 'None'."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        compression_ratio,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abcabcabcabc")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    for i in (1, 2):
        assert got[i].n_bytes == 0
        assert got[i].n_compressed == 0
        assert got[i].ratio_micro is None
    assert got[3].n_bytes == 12 and got[3].ratio_micro is not None


def test_group_zscore_exact_and_degenerate(spark):
    """group_zscore (round 10): hand-computed z on a 2-group frame,
    exact NULL for the constant group, layout determinism."""
    import math

    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        group_zscore,
    )

    rows = [
        (1, "a", 10), (2, "a", 20), (3, "a", 30),
        (4, "b", 5), (5, "b", 5), (6, "b", 5),    # constant group
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, x long")
    got = {r.doc_id: r for r in group_zscore(df, "x").collect()}
    mean, var = 20.0, (100 + 400 + 900) / 3 - 400.0
    for i, x in ((1, 10), (2, 20), (3, 30)):
        want = math.floor((x - mean) / math.sqrt(var) * 1_000_000 + 0.5)
        assert got[i].z_micro == want, (i, got[i].z_micro, want)
    for i in (4, 5, 6):
        assert got[i].z_micro is None
    again = {
        r.doc_id: r.z_micro
        for r in group_zscore(df.repartition(5), "x").collect()
    }
    assert again == {k: v.z_micro for k, v in got.items()}


def test_group_zscore_huge_values_no_overflow(spark):
    """ADVICE r10: |x| > ~3.03e9 squares past int64 — the sum of
    squares must go through decimal BEFORE the multiply.  5e9-scale
    micro-quantized signals are exactly this repo's convention."""
    import math

    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        group_zscore,
    )

    xs = [5_000_000_000, 6_000_000_000, 7_000_000_000]
    rows = [(i + 1, "a", x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, x long")
    got = {r.doc_id: r.z_micro for r in group_zscore(df, "x").collect()}
    n = len(xs)
    mean = float(sum(xs)) / n
    var = float(sum(x * x for x in xs)) / n - mean * mean
    for i, x in enumerate(xs):
        want = math.floor((float(x) - mean) / math.sqrt(var) * 1e6 + 0.5)
        assert got[i + 1] == want, (i, got[i + 1], want)


def test_version_drift_hand_computed(spark):
    """version_drift (round 11): KL and churn on a tiny two-version
    frame, checked against the exact quantized formula; identical
    versions give ~zero drift."""
    import math

    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        version_drift,
    )

    rows = [
        (0, "a", 0, "x x y"),
        (1, "a", 1, "x z z"),     # z new, y lost
        (2, "b", 0, "w w"),
        (3, "b", 1, "w w"),       # unchanged distribution
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, version int, text string"
    )
    got = {r.source: r for r in version_drift(df, "version").collect()}
    a = got["a"]
    assert (a.n_tokens_v0, a.n_tokens_v1) == (3, 3)
    assert (a.n_new_terms, a.n_lost_terms) == (1, 1)
    # hand formula: union vocab {x,y,z} V=3, t0=3, t1=3
    def lr(c1, c0):
        return math.floor(
            math.log((c1 * 1.0 / 3) / ((c0 + 1) * 1.0 / (3 + 3))) * 1e6 + 0.5
        )
    want = 1 * lr(1, 2) + 2 * lr(2, 0)  # x then z; y has c1=0
    q = want // 3 if want >= 0 else -((-want) // 3)  # div truncates
    assert a.kl_micro == q
    b = got["b"]
    assert (b.n_new_terms, b.n_lost_terms) == (0, 0)
    # identical distributions: lr(2,2) quantizes to exactly 0
    assert b.kl_micro == 0


def test_repetition_metrics_matches_exploded_reference(spark):
    """r12 optimization guard: the row-local sorted-run form must equal
    the exploded (doc, gram)->doc double-aggregation reference (the
    pre-r12 implementation, inlined here) value-for-value — including
    short docs (< n tokens) and single-gram docs."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.rounding import pround
    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        tokens,
        word_shingles,
    )
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        repetition_metrics,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # heavy bigram repetition
            (2, "one two three four"),   # all distinct
            (3, "x"),                    # shorter than n
            (4, "x y"),                  # exactly one gram
            (5, "a a a a"),              # one gram repeated
            (6, "p q p q r p q"),        # mixed runs
        ],
        "doc_id long, text string",
    )

    def reference(df, id_col="doc_id", text_col="text", n=2):
        d = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
        base = d.select(
            "id",
            F.size("toks").alias("n_tokens"),
            F.greatest(F.size("toks") - (n - 1), F.lit(0)).alias("n_ngrams"),
        )
        g = d.select("id", F.explode(word_shingles("toks", n)).alias("gram"))
        per_gram = g.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
        per_doc = per_gram.groupBy("id").agg(
            F.max("cnt").alias("top_cnt"),
            F.sum(
                F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))
            ).alias("dup_cnt"),
        )
        denom = F.greatest(F.col("n_ngrams"), F.lit(1)).cast("double")
        return base.join(per_doc, "id", "left").select(
            F.col("id").alias(id_col),
            "n_tokens",
            "n_ngrams",
            pround(F.coalesce(F.col("top_cnt"), F.lit(0)) / denom, 6).alias(
                "top_ngram_frac"
            ),
            pround(F.coalesce(F.col("dup_cnt"), F.lit(0)) / denom, 6).alias(
                "dup_ngram_frac"
            ),
        )

    got = sorted(map(tuple, repetition_metrics(docs).collect()))
    ref = sorted(map(tuple, reference(docs).collect()))
    assert got == ref


def test_repetition_metrics_plan_has_no_exchange(spark):
    """r12: per-doc metrics are row-local — the plan must not shuffle."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        repetition_metrics,
    )
    from aws_cdk_pipelines_datalake_etl_spark.plans.explain import (
        formatted_plan,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    assert "Exchange" not in formatted_plan(repetition_metrics(docs))
