"""DSIR importance resampling (operators/dsir.py) — semantics,
engine-exactness safeguards, and plan shape.

The oracle-replay contract rests on the same two devices as langid:
the portable hash48 feature slots (DuckDB replays md5 verbatim) and
integer micro-nat quantization of ``ln(integer)``.  The model-table
agreement test here is the ADVICE-r8 ln-boundary safeguard applied to
the new operator: if a libm divergence ever flipped a floor boundary,
it fails HERE with the offending slot, not as a spurious driver
hash-red."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.dsir import (
    _hashed_gram_counts,
    _micro_ln,
    dsir_topk,
    dsir_weights,
    train_dsir_model,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def _weights(spark, rows, dim=64):
    df = _docs(spark, rows)
    return dsir_weights(df, F.col("tgt"), dim=dim)


def test_target_marker_scores_higher(spark):
    """Docs sharing the target domain's marker token outrank docs of
    the same length that don't — the core DSIR selection property."""
    rows = [
        (1, "alpha beta gamma", True),
        (2, "alpha beta gamma", True),
        (3, "alpha beta gamma", False),   # looks like the target
        (4, "delta epsilon zeta", False),  # looks like the raw pool
        (5, "delta epsilon zeta", False),
        (6, "delta epsilon zeta", False),
    ]
    got = {
        r["doc_id"]: r["weight_micro"]
        for r in _weights(spark, rows).collect()
    }
    assert got[3] > got[4] == got[5] == got[6]
    top = dsir_topk(_weights(spark, rows), k=1).collect()
    assert [r["doc_id"] for r in top] == [3]
    # target docs never appear in the default selection pool
    all_sel = dsir_topk(_weights(spark, rows), k=10).collect()
    assert {r["doc_id"] for r in all_sel} == {3, 4, 5, 6}


def test_weight_formula_matches_hand_computation(spark):
    """Tiny corpus, tiny dim: recompute the published formula by hand
    (hash-free path: collide-everything dim=1 makes every gram one
    bucket, so the weight reduces to K_d * [ln(ct+1)-ln(cr+1) -
    ln(Ct+1)+ln(Cr+1)] exactly)."""
    rows = [
        (1, "a b", True),    # 3 grams: a, b, 'a b'
        (2, "c d e", False),  # 5 grams
    ]
    got = {
        r["doc_id"]: r
        for r in _weights(spark, rows, dim=1).collect()
    }
    lam = _micro_ln(3 + 1) - _micro_ln(5 + 1)
    const = _micro_ln(3 + 1) - _micro_ln(5 + 1)
    assert got[1]["n_grams"] == 3
    assert got[2]["n_grams"] == 5
    assert got[1]["weight_micro"] == 3 * lam - 3 * const == 0
    assert got[2]["weight_micro"] == 5 * lam - 5 * const == 0


def test_zero_token_doc_survives_with_zero_weight(spark):
    rows = [
        (1, "alpha beta", True),
        (2, "", False),
        (3, "   ", False),
        (4, "gamma delta", False),
    ]
    got = {r["doc_id"]: r for r in _weights(spark, rows).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2]["weight_micro"] == 0 and got[2]["n_grams"] == 0
    assert got[3]["weight_micro"] == 0 and got[3]["n_grams"] == 0


def test_partition_invariance(spark):
    """Integer micro-nat sums are exact under any layout: 1-partition
    and 7-partition runs produce identical weights."""
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(1 + i % 9)), i % 5 == 0)
        for i in range(60)
    ]
    df = _docs(spark, rows)
    a = {
        (r["doc_id"], r["weight_micro"], r["n_grams"])
        for r in dsir_weights(df.repartition(1), F.col("tgt"), dim=32).collect()
    }
    b = {
        (r["doc_id"], r["weight_micro"], r["n_grams"])
        for r in dsir_weights(df.repartition(7), F.col("tgt"), dim=32).collect()
    }
    assert a == b


def test_model_table_matches_duckdb_retraining(spark):
    """ln-boundary safeguard (the langid ADVICE-r8 device): the
    driver-built lambda table and smoothing constant must equal the
    DuckDB-retrained ones value-for-value."""
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (i, " ".join(f"t{(i * 3 + j) % 11}" for j in range(4 + i % 5)), i % 4 == 0)
        for i in range(40)
    ]
    dim = 16
    df = _docs(spark, rows)
    base = df.select(
        F.col("doc_id").alias("_id"),
        F.col("tgt").alias("_tgt"),
        F.col("text").alias("_text"),
    )
    feats = _hashed_gram_counts(base, "_id", "_text", "_tgt", dim)
    lam_rows, const_micro = train_dsir_model(feats, dim)

    con = duckdb.connect()
    con.register(
        "docs",
        df.toPandas(),
    )
    got = con.sql(f"""
        WITH b AS (
          SELECT doc_id, tgt,
                 list_filter(string_split(lower(text), ' '), w -> w != '') AS w
          FROM docs
        ),
        nz AS (SELECT doc_id, tgt, w, len(w) AS n FROM b WHERE len(w) >= 1),
        occ AS (
          SELECT doc_id, tgt,
                 CASE WHEN i <= n THEN w[i]
                      ELSE w[i - n] || ' ' || w[i - n + 1] END AS gram
          FROM nz, LATERAL (SELECT unnest(generate_series(1, 2 * n - 1)) AS i)
        ),
        f AS (
          SELECT doc_id, tgt,
                 ('0x' || substr(md5(gram), 1, 12))::BIGINT % {dim} AS slot,
                 count(*) AS k
          FROM occ GROUP BY doc_id, tgt, slot
        ),
        m AS (
          SELECT slot,
                 sum(CASE WHEN tgt THEN k ELSE 0 END) AS ct,
                 sum(CASE WHEN NOT tgt THEN k ELSE 0 END) AS cr
          FROM f GROUP BY slot
        )
        SELECT slot,
               CAST(floor(ln(ct + 1) * 1000000 + 0.5) AS BIGINT)
               - CAST(floor(ln(cr + 1) * 1000000 + 0.5) AS BIGINT) AS lam,
               (SELECT CAST(floor(ln(sum(ct) + {dim}) * 1000000 + 0.5) AS BIGINT)
                       - CAST(floor(ln(sum(cr) + {dim}) * 1000000 + 0.5) AS BIGINT)
                FROM m) AS c
        FROM m WHERE ct != cr ORDER BY slot
    """).fetchall()
    assert [(s, l) for s, l, _ in got] == lam_rows
    if got:
        assert got[0][2] == const_micro


def test_plan_shape(spark):
    """No Python in the distributed path, model join broadcast, topk
    compiles to TakeOrderedAndProject (per-partition heads, not a
    global sort)."""
    rows = [(i, f"w{i % 5} w{i % 3}", i % 4 == 0) for i in range(20)]
    w = _weights(spark, rows, dim=16)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    top_plan = (
        dsir_topk(w, 5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in top_plan


def test_gumbel_topk_matches_python_and_differs_from_argmax(spark):
    """The perturbed key equals the hand formula (hash-uniform ->
    double-ln Gumbel, micro-quantized, added to the weight), the
    sample is layout-deterministic, and with near-equal weights the
    noise actually reorders relative to the noise-free argmax."""
    import hashlib
    import math

    from aws_cdk_pipelines_datalake_etl_spark.operators.dsir import (
        dsir_gumbel_topk,
    )

    rows = [
        (i, " ".join(f"w{(i + j) % 5}" for j in range(6)), False)
        for i in range(1, 60)
    ] + [(0, "w0 w1 w2", True)]
    df = _docs(spark, rows)
    w = dsir_weights(df, F.col("tgt"), dim=32)
    got = dsir_gumbel_topk(w, k=10).collect()
    assert len(got) == 10 and all(not r["is_target"] for r in got)

    def py_gumbel(doc_id: int) -> int:
        h = int(hashlib.md5(f"{doc_id}:g".encode()).hexdigest()[:12], 16)
        u = (h + 1.0) / 281474976710657.0
        return math.floor(-math.log(-math.log(u)) * 1_000_000 + 0.5)

    for r in got:
        assert r["gumbel_micro"] == py_gumbel(r["doc_id"])
        assert r["key_micro"] == r["weight_micro"] + r["gumbel_micro"]

    again = dsir_gumbel_topk(
        dsir_weights(df.repartition(7), F.col("tgt"), dim=32), k=10
    ).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in got]

    plain = {r["doc_id"] for r in dsir_topk(w, k=10).collect()}
    assert {r["doc_id"] for r in got} != plain  # the noise resamples


def test_staging_seam_identical_weights(spark):
    """The r9-judge feature-staging seam: stage=True (eager
    localCheckpoint) and feats= (pre-staged dsir_feature_counts
    table — the 100 TB parquet path) both produce weights
    bit-identical to the recompute-twice default."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dsir import (
        dsir_feature_counts,
    )

    rows = [
        (i, " ".join(f"s{(i * 7 + j) % 12}" for j in range(2 + i % 7)), i % 5 == 0)
        for i in range(50)
    ] + [(100, "", False), (101, "   ", True)]
    df = _docs(spark, rows)
    base = {
        (r["doc_id"], r["weight_micro"], r["n_grams"], r["is_target"])
        for r in dsir_weights(df, F.col("tgt"), dim=32).collect()
    }
    staged = {
        (r["doc_id"], r["weight_micro"], r["n_grams"], r["is_target"])
        for r in dsir_weights(df, F.col("tgt"), dim=32, stage=True).collect()
    }
    assert staged == base
    feats = dsir_feature_counts(df, F.col("tgt"), dim=32)
    prestaged = {
        (r["doc_id"], r["weight_micro"], r["n_grams"], r["is_target"])
        for r in dsir_weights(df, F.col("tgt"), dim=32, feats=feats).collect()
    }
    assert prestaged == base


def test_counts_dim_mismatch_raises(spark):
    """ADVICE r9: a counts= table trained with a larger dim must be
    rejected, not silently skew every weight."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dsir import (
        dsir_batch_counts,
    )

    rows = [(i, f"x{i % 20} y{i % 17} z{i % 13}", i % 4 == 0) for i in range(30)]
    df = _docs(spark, rows)
    counts_big = dsir_batch_counts(df, F.col("tgt"), dim=256)
    assert counts_big.filter(F.col("slot") >= 16).count() > 0  # mismatch is real
    with pytest.raises(ValueError, match="different dim"):
        dsir_weights(df, F.col("tgt"), dim=16, counts=counts_big).collect()


def test_incremental_counts_equal_direct_any_split(spark):
    """Bucket counts are additive: 3-way batch split (one batch
    empty-ish) merged == direct weights, bit for bit."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dsir import (
        dsir_batch_counts,
        merge_bucket_counts,
    )

    rows = [
        (i, " ".join(f"m{(i * 5 + j) % 9}" for j in range(3 + i % 6)), i % 4 == 0)
        for i in range(45)
    ]
    df = _docs(spark, rows)
    direct = {
        (r["doc_id"], r["weight_micro"])
        for r in dsir_weights(df, F.col("tgt"), dim=32).collect()
    }
    batches = [
        dsir_batch_counts(df.filter(F.col("doc_id") % 3 == m), F.col("tgt"), dim=32)
        for m in range(3)
    ]
    merged = merge_bucket_counts(batches)
    incr = {
        (r["doc_id"], r["weight_micro"])
        for r in dsir_weights(
            df, F.col("tgt"), dim=32, counts=merged
        ).collect()
    }
    assert incr == direct


def test_gumbel_stratified_preserves_mixture(spark):
    """Per-source Gumbel top-k (round 10): exact per-source budgets,
    dict form zeroes unlisted sources, int form budgets every source,
    the draw is the SAME hash-Gumbel key as the global sampler, and
    ranking is layout-deterministic."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dsir import (
        dsir_gumbel_topk,
        dsir_gumbel_topk_stratified,
    )

    rows = [
        (
            i,
            " ".join(f"w{(i + j) % 7}" for j in range(5)),
            i % 10 == 0,
            f"s{i % 3}",
        )
        for i in range(1, 91)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, tgt boolean, source string"
    )
    w = dsir_weights(df, F.col("tgt"), dim=32).join(
        df.select("doc_id", "source"), "doc_id"
    )
    got = dsir_gumbel_topk_stratified(w, {"s0": 4, "s2": 7}).collect()
    by_src: dict[str, list] = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    assert {s: len(v) for s, v in by_src.items()} == {"s0": 4, "s2": 7}
    assert all(not r["is_target"] for r in got)
    # same Gumbel key as the global sampler for the same docs
    global_keys = {
        r["doc_id"]: (r["gumbel_micro"], r["key_micro"])
        for r in dsir_gumbel_topk(
            w.drop("source"), k=100
        ).collect()
    }
    for r in got:
        assert (r["gumbel_micro"], r["key_micro"]) == global_keys[r["doc_id"]]
    # ranks are 1..budget and descend by key within each source
    for s, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["sel_rank"])
        assert [r["sel_rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(r["key_micro"], -r["doc_id"]) for r in rs]
        assert keys == sorted(keys, reverse=True)
    # int form: every source gets the same budget
    got_int = dsir_gumbel_topk_stratified(w, 2).collect()
    cnt = {}
    for r in got_int:
        cnt[r["source"]] = cnt.get(r["source"], 0) + 1
    assert cnt == {"s0": 2, "s1": 2, "s2": 2}
    # layout determinism
    again = {
        (r["doc_id"], r["sel_rank"])
        for r in dsir_gumbel_topk_stratified(
            w.repartition(7), {"s0": 4, "s2": 7}
        ).collect()
    }
    assert again == {(r["doc_id"], r["sel_rank"]) for r in got}
