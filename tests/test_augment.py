"""FIM and T5 span corruption (operators/augment.py): invertibility
golden properties, rate behavior, determinism, plan shape (both are
single narrow projections — NO exchange anywhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.augment import (
    fim_transform,
    span_corruption,
)
from aws_cdk_pipelines_datalake_etl_spark.plans.explain import formatted_plan

PRE, SUF, MID = 1000, 1001, 1002


def _ids(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, token_ids array<int>")


def _undo_fim(out: list[int]) -> list[int]:
    """Reconstruct the original from a PSM sequence: the inverse the
    training objective implies."""
    assert out[0] == PRE
    suf_at = out.index(SUF)
    mid_at = out.index(MID)
    prefix = out[1:suf_at]
    suffix = out[suf_at + 1 : mid_at]
    middle = out[mid_at + 1 :]
    return prefix + middle + suffix


def test_fim_is_invertible_and_adds_three(spark):
    rows = [(i, list(range(i * 20, i * 20 + (i % 11)))) for i in range(1, 30)]
    out = fim_transform(_ids(spark, rows), rate_micro=1_000_000).collect()
    orig = dict(rows)
    for r in out:
        if not orig[r["doc_id"]]:
            assert not r["fim_applied"]  # empty docs pass through
            continue
        assert r["fim_applied"]
        assert r["n_tokens"] == len(orig[r["doc_id"]]) + 3
        assert _undo_fim(list(r["token_ids"])) == orig[r["doc_id"]]


def test_fim_rate_zero_is_identity(spark):
    rows = [(i, list(range(5))) for i in range(10)]
    out = fim_transform(_ids(spark, rows), rate_micro=0).collect()
    assert all(not r["fim_applied"] for r in out)
    assert all(list(r["token_ids"]) == list(range(5)) for r in out)


def test_fim_rate_is_hash_deterministic(spark):
    """Same ids, same decisions — and a mid rate actually splits the
    population both ways."""
    rows = [(i, list(range(8))) for i in range(200)]
    a = {
        r["doc_id"]: r["fim_applied"]
        for r in fim_transform(_ids(spark, rows), rate_micro=500_000).collect()
    }
    b = {
        r["doc_id"]: r["fim_applied"]
        for r in fim_transform(_ids(spark, rows), rate_micro=500_000).collect()
    }
    assert a == b
    applied = sum(a.values())
    assert 0 < applied < 200


def _undo_span(inputs: list[int], targets: list[int], base=1000) -> list[int]:
    """Splice each sentinel's target span back into the input stream."""
    spans: dict[int, list[int]] = {}
    cur = None
    for t in targets:
        if t >= base:
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    out: list[int] = []
    for x in inputs:
        if x >= base:
            out.extend(spans[x])
        else:
            out.append(x)
    return out


def test_span_corruption_is_invertible(spark):
    rows = [(i, [x % 700 for x in range(i * 3, i * 3 + 5 * i)]) for i in range(1, 25)]
    out = span_corruption(_ids(spark, rows), window=10, span_len=3).collect()
    orig = dict(rows)
    for r in out:
        assert _undo_span(list(r["inputs"]), list(r["targets"])) == orig[
            r["doc_id"]
        ]
        assert r["n_spans"] == len(orig[r["doc_id"]]) // 10
        # exactly span_len tokens dropped per full window, sentinel added
        assert len(r["inputs"]) == r["n_tokens"] - r["n_spans"] * 3 + r["n_spans"]
        assert len(r["targets"]) == r["n_spans"] * 4


def test_span_corruption_partial_window_untouched(spark):
    """A 25-token doc with window 10: positions 20..24 are the partial
    tail — always intact in the inputs."""
    rows = [(1, list(range(25)))]
    r = span_corruption(_ids(spark, rows), window=10, span_len=3).collect()[0]
    assert r["n_spans"] == 2
    tail = [x for x in r["inputs"] if 20 <= x < 25]
    assert tail == [20, 21, 22, 23, 24]


def test_span_corruption_rejects_bad_span(spark):
    import pytest

    with pytest.raises(ValueError):
        span_corruption(_ids(spark, [(1, [1])]), window=3, span_len=4)


def test_augment_plans_are_narrow(spark):
    """Both transforms must compile to a single stage: no Exchange, no
    Generate, no Python anywhere — the row-local 100 TB contract."""
    rows = [(1, list(range(30)))]
    for op in (
        lambda d: fim_transform(d),
        lambda d: span_corruption(d, window=10, span_len=3),
    ):
        plan = formatted_plan(op(_ids(spark, rows)))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "Generate" not in plan


def test_fim_null_token_ids_passthrough(spark):
    """ADVICE r9: a NULL token_ids row passes through with
    fim_applied=false and NULL n_tokens — never the size-of-null -1
    sentinel."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.augment import (
        fim_transform,
    )

    df = spark.createDataFrame(
        [(1, [5, 6, 7]), (2, None), (3, [])],
        "doc_id long, token_ids array<int>",
    )
    got = {r.doc_id: r for r in fim_transform(df, rate_micro=1_000_000).collect()}
    assert got[2].fim_applied is False
    assert got[2].n_tokens is None
    assert got[2].token_ids is None
    assert got[3].fim_applied is False  # empty passes through too
    assert got[3].n_tokens == 0
    assert got[1].fim_applied is True and got[1].n_tokens == 6


def test_ul2_mixture_routes_and_transforms(spark):
    """ul2_mixture (round 11): every doc lands in exactly one
    denoiser branch; R/X rows equal span_corruption at the branch's
    params plus the paradigm tag; S rows are the hash-cut prefix-LM
    split; layout-deterministic."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import hash48
    from aws_cdk_pipelines_datalake_etl_spark.operators.augment import (
        span_corruption,
        ul2_mixture,
    )

    docs = spark.createDataFrame(
        [(i, list(range(100 + i))) for i in range(30)],
        "doc_id long, token_ids array<int>",
    )
    out = ul2_mixture(docs).collect()
    assert len(out) == 30
    by_id = {r.doc_id: r for r in out}
    picks = {
        r.doc_id: r.pick
        for r in docs.select(
            "doc_id",
            F.pmod(
                hash48(F.concat(F.col("doc_id").cast("string"), F.lit(":ul2"))),
                F.lit(3),
            ).alias("pick"),
        ).collect()
    }
    assert {0, 1, 2} == set(picks.values()), "fixture must hit all 3 routes"
    for i, r in by_id.items():
        assert r.denoiser == {0: "R", 1: "X", 2: "S"}[picks[i]]
        assert r.inputs[0] == {"R": 900, "X": 901, "S": 902}[r.denoiser]
    # R branch == span_corruption(20, 3) + tag
    r_ids = [i for i, p in picks.items() if p == 0]
    sc = {
        r.doc_id: r
        for r in span_corruption(
            docs.filter(F.col("doc_id").isin(r_ids)), window=20, span_len=3
        ).collect()
    }
    for i in r_ids:
        assert by_id[i].inputs == [900] + sc[i].inputs
        assert by_id[i].targets == sc[i].targets
    # X branch corrupts half of every full window (span 8 of 16)
    x_ids = [i for i, p in picks.items() if p == 1]
    for i in x_ids:
        n = 100 + i
        n_win = n // 16
        assert len(by_id[i].inputs) == 1 + n - n_win * 8 + n_win
    # S branch: prefix + suffix partition the doc at the hash cut
    s_ids = [i for i, p in picks.items() if p == 2]
    for i in s_ids:
        r = by_id[i]
        assert r.inputs[1:] + r.targets == list(range(100 + i))
    again = ul2_mixture(docs.repartition(5)).collect()
    assert {(r.doc_id, tuple(r.inputs), tuple(r.targets)) for r in again} == {
        (r.doc_id, tuple(r.inputs), tuple(r.targets)) for r in out
    }


def test_ul2_mixture_weights_seam(spark):
    """VERDICT r11 #7: explicit micro-weight bucketing on
    hash mod 1e6 expresses the paper's tuned R/X/S rates; weights=None
    keeps the mod-3 route BIT-identical to the pre-seam output; bad
    weights raise."""
    import pytest as _pytest

    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import hash48
    from aws_cdk_pipelines_datalake_etl_spark.operators.augment import (
        ul2_mixture,
    )

    docs = spark.createDataFrame(
        [(i, list(range(100 + i))) for i in range(30)],
        "doc_id long, token_ids array<int>",
    )

    def key(rows):
        return {
            (r.doc_id, r.denoiser, tuple(r.inputs), tuple(r.targets))
            for r in rows
        }

    # default is output-identical to the historical mod-3 route
    assert key(ul2_mixture(docs).collect()) == key(
        ul2_mixture(docs, weights=None).collect()
    )
    # degenerate weights route EVERY doc to one denoiser
    all_r = ul2_mixture(docs, weights=(1_000_000, 0, 0)).collect()
    assert len(all_r) == 30 and {r.denoiser for r in all_r} == {"R"}
    all_s = ul2_mixture(docs, weights=(0, 0, 1_000_000)).collect()
    assert {r.denoiser for r in all_s} == {"S"}
    # mixed weights follow the cumulative-bucket rule on draw mod 1e6
    w = (250_000, 250_000, 500_000)
    draws = {
        r.doc_id: r.d
        for r in docs.select(
            "doc_id",
            F.pmod(
                hash48(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":ul2"))
                ),
                F.lit(1_000_000),
            ).alias("d"),
        ).collect()
    }
    got = {
        r.doc_id: r.denoiser for r in ul2_mixture(docs, weights=w).collect()
    }
    for i, d in draws.items():
        want = "R" if d < w[0] else ("X" if d < w[0] + w[1] else "S")
        assert got[i] == want, (i, d, got[i], want)
    assert len({*got.values()}) == 3, "mixed fixture must hit all routes"
    with _pytest.raises(ValueError, match="sum"):
        ul2_mixture(docs, weights=(500_000, 500_000, 1))
    with _pytest.raises(ValueError, match="non-negative"):
        ul2_mixture(docs, weights=(1_500_000, -500_000, 0))
