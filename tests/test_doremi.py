"""DoReMi controller, repeat-value accounting, fertility report
(round 11)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.doremi import (
    doremi_sql_ctes,
    doremi_weights,
    source_excess_loss,
)


@pytest.fixture(scope="module")
def docs3(spark):
    # src_a: common tokens (low loss); src_c: rare tokens (high loss)
    rows = (
        [(i, "a", "x x y x y x") for i in range(10)]
        + [(10 + i, "b", "x y z w x y") for i in range(10)]
        + [(20 + i, "c", f"r{i} s{i} t{i} u{i}") for i in range(10)]
    )
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_source_excess_loss_ordering(spark, docs3):
    out = {r.source: r for r in source_excess_loss(docs3).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"].excess_micro == 0  # most predictable source
    assert out["c"].excess_micro > out["b"].excess_micro > 0
    # loss is (-sum of per-token micro logps) div n_tokens: integers
    for r in out.values():
        assert isinstance(r.loss_micro, int) and r.loss_micro > 0


def test_source_excess_loss_preagg_matches_per_occurrence(spark, docs3):
    """VERDICT r11 #2: the (source, term, count) pre-aggregation is
    VALUE-identical to the naive per-occurrence join+sum — every
    occurrence of a term carries the same quantized logp, so
    c * micro_logp distributes exactly over the occurrence sum."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        tokens,
    )

    toks = docs3.select(
        F.col("source"), F.explode(tokens("text")).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    micro = F.floor(
        F.log(F.col("n_term") / F.col("n_total")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    naive = {
        r.source: (r.n_tokens, r.loss_micro)
        for r in (
            toks.join(freq, "term")
            .crossJoin(F.broadcast(total))
            .withColumn("micro_logp", micro)
            .groupBy("source")
            .agg(
                F.sum("micro_logp").alias("_s"),
                F.count(F.lit(1)).alias("n_tokens"),
            )
            .withColumn(
                "loss_micro", F.expr("(-_s) div n_tokens").cast("long")
            )
            .collect()
        )
    }
    got = {
        r.source: (r.n_tokens, r.loss_micro)
        for r in source_excess_loss(docs3).collect()
    }
    assert got == naive


def test_doremi_weights_moves_toward_hard_domains(spark, docs3):
    excess = source_excess_loss(docs3)
    out = {r.source: r.alpha_micro for r in doremi_weights(excess).collect()}
    # weights sum to ~1e6 (per-row rounding only)
    assert abs(sum(out.values()) - 1_000_000) <= 3
    # multiplicative weights favor the highest-excess domain
    assert out["c"] > out["b"] > out["a"] > 0
    # steps=0 keeps the uniform start
    flat = {
        r.source: r.alpha_micro
        for r in doremi_weights(excess, steps=0).collect()
    }
    assert set(flat.values()) == {math.floor(1_000_000 / 3 + 0.5)}
    with pytest.raises(ValueError):
        doremi_weights(excess, steps=-1)


def test_doremi_python_loop_equals_sql_ctes(spark, docs3):
    """The drift gate: the driver-side Python loop and the generated
    DuckDB CTE text must produce IDENTICAL alphas from the same
    excess table — every float op replicated op-for-op."""
    excess_rows = sorted(
        source_excess_loss(docs3).collect(), key=lambda r: r.source
    )
    got = {
        r.source: r.alpha_micro
        for r in doremi_weights(
            spark.createDataFrame(
                excess_rows,
                "source string, n_tokens bigint, loss_micro bigint,"
                " excess_micro bigint",
            ),
            eta_micro=250_000,
            smooth_micro=50_000,
            steps=4,
        ).collect()
    }
    values = ", ".join(
        f"('{r.source}', {r.n_tokens}, {r.loss_micro}, {r.excess_micro})"
        for r in excess_rows
    )
    sql = (
        "WITH excess0(source, n_tokens, loss_micro, excess_micro) AS "
        f"(VALUES {values}),\n"
        + doremi_sql_ctes(eta_micro=250_000, smooth_micro=50_000, steps=4)
        + "\nSELECT source, alpha FROM t4 ORDER BY source"
    )
    want = dict(duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_repeat_value_saturates(spark):
    """repeat_value (round 11): R=0 keeps D_eff = U; growing repeats
    add value sub-linearly and saturate below U * (1 + R*)."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.sampling import (
        repeat_value,
    )

    plan = spark.createDataFrame(
        [
            ("one_pass", 1_000_000, 1_000_000, 1_000_000),
            ("four_epochs", 1_000_000, 4_000_000, 4_000_000),
            ("forty_epochs", 1_000_000, 40_000_000, 40_000_000),
            ("no_budget", 1_000_000, 0, 0),
        ],
        "source string, n_tokens bigint, budget_i bigint,"
        " n_epochs_micro bigint",
    )
    out = {r.source: r for r in repeat_value(plan).collect()}
    rs = 15.39
    assert out["one_pass"].effective_tokens == 1_000_000
    assert out["one_pass"].value_ratio_micro == 1_000_000
    want4 = 1_000_000 + math.floor(
        1_000_000 * rs * (1 - math.exp(-(3.0 / rs))) + 0.5
    )
    assert out["four_epochs"].effective_tokens == want4
    assert out["four_epochs"].value_ratio_micro == want4 * 1_000_000 // 4_000_000
    e40 = out["forty_epochs"].effective_tokens
    assert want4 < e40 < 1_000_000 * (1 + rs) + 1
    # marginal value of later epochs decays
    assert e40 - want4 < (want4 - 1_000_000) * 37 / 3
    assert out["no_budget"].value_ratio_micro is None


def test_fertility_report_exact(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.text import (
        fertility_report,
    )

    df = spark.createDataFrame(
        [
            (1, "a", "one two three"),
            (2, "a", "four five"),
            (3, "b", "café"),  # 4 chars, 5 utf-8 bytes
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in fertility_report(df).collect()}
    a = out["a"]
    assert (a.n_docs, a.n_tokens, a.n_chars) == (2, 5, 22)
    assert a.chars_per_token_micro == 22 * 1_000_000 // 5
    assert a.tokens_per_doc_micro == 5 * 1_000_000 // 2
    b = out["b"]
    assert (b.n_tokens, b.n_chars, b.n_bytes) == (1, 4, 5)
    assert b.bytes_per_token_micro == 5_000_000


def test_corpus_training_set_v4_composition(spark):
    """The round-11 capstone holds its stage invariants at smoke
    scale: every output doc survived block dedup, respects its
    source's DoReMi budget, and carries a valid UL2 paradigm tag."""
    from aws_cdk_pipelines_datalake_etl_spark.plans.registry import (
        corpus_training_set_v4,
    )
    from tests.conftest import SF_DIR_SMOKE

    rows = corpus_training_set_v4(spark, SF_DIR_SMOKE).collect()
    assert rows, "capstone produced no rows"
    tags = {"R": 900, "X": 901, "S": 902}
    per_source = {}
    for r in rows:
        assert r.denoiser in tags
        assert r.inputs_joined.split(" ")[0] == str(tags[r.denoiser])
        per_source[r.source] = per_source.get(r.source, 0) + 1
    # budgets: sum of per-source keeps is <= the 200-doc target and
    # no source exceeds alpha*200//1e6 (alphas sum to ~1e6)
    assert sum(per_source.values()) <= 200
    assert len(per_source) >= 2, "mixture should span sources"


def test_grouped_hash_rank_equals_window(spark):
    """The distributed composite-bucket rank == the single-window
    per-group row_number, rank for rank."""
    from pyspark.sql import Window

    from aws_cdk_pipelines_datalake_etl_spark.operators.sampling import (
        grouped_hash_rank,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(200)], "doc_id long, source string"
    )
    got = {
        (r.source, r.doc_id): r.rank
        for r in grouped_hash_rank(df, "source").collect()
    }
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = {
        (r.source, r.doc_id): r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == {k: v for k, v in want.items()}
    # layout determinism
    again = {
        (r.source, r.doc_id): r.rank
        for r in grouped_hash_rank(df.repartition(11), "source").collect()
    }
    assert again == got


def test_unimax_budget_water_fills(spark):
    """unimax_budget (round 12 — Chung et al. 2023): ascending-
    capacity greedy water-filling with an epoch cap.  Checked against
    a brute replay of the published loop; invariants: budget_i <=
    capacity, sum(budget_i) <= budget (deficit < n_sources from
    truncating division), small sources cap, big sources share the
    slack equally (max spread 1 token)."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.sampling import (
        unimax_budget,
    )

    rows = (
        [(i, "tiny", "t " * 3) for i in range(2)]          # 8 tok
        + [(10 + i, "small", "s " * 9) for i in range(4)]  # 40 tok
        + [(20 + i, "mid", "m " * 49) for i in range(6)]   # 300 tok
        + [(30 + i, "big", "b " * 99) for i in range(10)]  # 1000 tok
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budget, cap = 900, 2_500_000
    out = {r.source: r for r in unimax_budget(df, budget, cap).collect()}
    assert set(out) == {"tiny", "small", "mid", "big"}
    # brute replay of the loop
    caps = sorted(
        (r.capacity_tokens, s) for s, r in out.items()
    )
    remaining, n_left, want = budget, len(caps), {}
    for c, s in caps:
        b = min(c, remaining // n_left)
        remaining -= b
        n_left -= 1
        want[s] = b
    for s, r in out.items():
        assert r.budget_i == want[s], (s, r.budget_i, want[s])
        assert r.budget_i <= r.capacity_tokens
        assert r.capacity_tokens == r.n_tokens * cap // 1_000_000
        assert r.n_epochs_micro == r.budget_i * 1_000_000 // r.n_tokens
    assert sum(r.budget_i for r in out.values()) <= budget
    # tiny and small are capped; mid/big get the equal slack share
    assert out["tiny"].budget_i == out["tiny"].capacity_tokens == 20
    assert out["small"].budget_i == out["small"].capacity_tokens == 100
    uncapped = [out["mid"].budget_i, out["big"].budget_i]
    assert max(uncapped) - min(uncapped) <= 1
    # zero budget / zero cap degenerate cleanly
    z = {r.source: r.budget_i for r in unimax_budget(df, 0, cap).collect()}
    assert set(z.values()) == {0}
    z2 = {r.source: r.budget_i for r in unimax_budget(df, budget, 0).collect()}
    assert set(z2.values()) == {0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        unimax_budget(df, -1, cap)


def test_corpus_training_set_v5_composition(spark):
    """The round-12 capstone: md5-key dedup -> UniMax budgets ->
    budgeted sample -> WEIGHTED UL2.  Invariants at smoke scale:
    valid paradigm tags, per-source doc counts within the UniMax
    doc budgets, S-denoiser share reflects the 25/25/50 routing."""
    from aws_cdk_pipelines_datalake_etl_spark.plans.registry import (
        corpus_training_set_v5,
    )
    from tests.conftest import SF_DIR_SMOKE

    rows = corpus_training_set_v5(spark, SF_DIR_SMOKE).collect()
    assert rows, "capstone produced no rows"
    tags = {"R": 900, "X": 901, "S": 902}
    n_s = 0
    for r in rows:
        assert r.denoiser in tags
        assert r.inputs_joined.split(" ")[0] == str(tags[r.denoiser])
        n_s += r.denoiser == "S"
    # 50% S routing should dominate the R/X branches at any
    # reasonable sample size (binomial p<1e-4 guard: at least a third)
    assert n_s >= len(rows) // 3
    assert len({r.source for r in rows}) >= 2, "mixture spans sources"
