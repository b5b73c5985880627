"""Streaming CDC upsert (streaming/cdc_upsert.py): bucket-partitioned
foreachBatch merge — replay idempotency, partition pruning of the
state read/write, and version-over-arrival-order resolution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.streaming.cdc_upsert import (
    BUCKET_COL,
    make_cdc_merge_batch,
    read_state,
    stream_cdc_upsert,
    with_key_bucket,
)

pytestmark = pytest.mark.streaming

COLS = ["k", "ver", "payload"]


def _merge(state_dir, n_buckets=8):
    return make_cdc_merge_batch(
        state_dir, ["k"], "ver", "payload", n_buckets=n_buckets
    )


def test_merge_batches_resolve_by_version_not_arrival(spark, tmp_path):
    state = str(tmp_path / "state")
    merge = _merge(state)
    # batch 0 carries the NEWER version of k=a; batch 1 the older one
    merge(spark.createDataFrame([("a", 5, "new"), ("b", 1, "b1")], COLS), 0)
    merge(spark.createDataFrame([("a", 2, "old"), ("c", 1, "c1")], COLS), 1)
    got = {
        (r.k, r.ver, r.payload)
        for r in read_state(spark, state).select(*COLS).collect()
    }
    assert got == {("a", 5, "new"), ("b", 1, "b1"), ("c", 1, "c1")}


def test_merge_replay_is_idempotent(spark, tmp_path):
    """Replaying an already-folded batch (the at-least-once crash
    case) leaves the state byte-identical."""
    state = str(tmp_path / "state")
    merge = _merge(state)
    b0 = spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")], COLS)
    b1 = spark.createDataFrame([("a", 3, "z")], COLS)
    merge(b0, 0)
    merge(b1, 1)
    before = {
        (r.k, r.ver, r.payload)
        for r in read_state(spark, state).select(*COLS).collect()
    }
    merge(b1, 1)  # crash-replay of the last batch
    after = {
        (r.k, r.ver, r.payload)
        for r in read_state(spark, state).select(*COLS).collect()
    }
    assert after == before == {("a", 3, "z"), ("b", 2, "y")}


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """A batch whose keys all land in one bucket must leave every
    other bucket's files physically untouched (dynamic partition
    overwrite + pruned state read)."""
    state = str(tmp_path / "state")
    n_buckets = 8
    merge = _merge(state, n_buckets=n_buckets)
    seed = spark.createDataFrame(
        [(f"k{i}", 1, f"p{i}") for i in range(40)], COLS
    )
    merge(seed, 0)
    # pick one existing key; its bucket is the only one batch 1 touches
    probe_key = "k7"
    bucket = with_key_bucket(
        spark.createDataFrame([(probe_key, 0, "")], COLS), ["k"], n_buckets
    ).head()[BUCKET_COL]

    def snapshot():
        out = {}
        for d in os.listdir(state):
            if d.startswith(f"{BUCKET_COL}="):
                p = os.path.join(state, d)
                out[d] = {
                    (f, os.stat(os.path.join(p, f)).st_mtime_ns)
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                }
        return out

    before = snapshot()
    merge(spark.createDataFrame([(probe_key, 9, "updated")], COLS), 1)
    after = snapshot()
    touched = f"{BUCKET_COL}={bucket}"
    assert touched in before and after[touched] != before[touched]
    for d, files in before.items():
        if d != touched:
            assert after[d] == files, f"untouched bucket {d} was rewritten"
    got = {
        (r.k, r.ver, r.payload)
        for r in read_state(spark, state)
        .filter(F.col("k") == probe_key)
        .select(*COLS)
        .collect()
    }
    assert got == {(probe_key, 9, "updated")}


def test_stream_cdc_upsert_equals_batch_collapse(spark, tmp_path):
    """Driven end-to-end as a file stream (1 file per micro-batch),
    the final state equals latest_snapshot over all changes."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.cdc import latest_snapshot

    changes = spark.createDataFrame(
        [
            ("a", 1, "a1"),
            ("a", 3, "a3"),
            ("b", 2, "b2"),
            ("c", 1, "c1"),
            ("b", 1, "b1"),
            ("c", 4, "c4"),
        ],
        COLS,
    )
    changes_dir = str(tmp_path / "changes")
    changes.repartition(3).write.parquet(changes_dir)
    final = stream_cdc_upsert(
        spark,
        changes_dir,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        key_cols=["k"],
        version_col="ver",
        tiebreak_col="payload",
        n_buckets=4,
        max_files_per_trigger=1,
    )
    got = {(r.k, r.ver, r.payload) for r in final.select(*COLS).collect()}
    want = {
        (r.k, r.ver, r.payload)
        for r in latest_snapshot(changes, ["k"], "ver", "payload").collect()
    }
    assert got == want == {("a", 3, "a3"), ("b", 2, "b2"), ("c", 4, "c4")}
