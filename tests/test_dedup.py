from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators import dedup as dd
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR_SMOKE, "documents").cache()


def test_minhash_lsh_equals_exact(spark, docs):
    """At the default parameters the LSH path must find exactly the
    pairs the exact n-gram path finds (miss prob ~5e-8/pair)."""
    exact = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "test data should contain planted near-duplicates"
    assert lsh == exact


def test_exact_dedup_deterministic_representative(spark):
    df = spark.createDataFrame(
        [(5, "a"), (2, "a"), (9, "b")], ["doc_id", "text"]
    )
    out = {r.text: (r.doc_id, r.n_copies) for r in
           dd.exact_dedup(df, ["text"], "doc_id").collect()}
    assert out == {"a": (2, 2), "b": (9, 1)}


def test_fingerprint_dedup_normalizes(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "completely different"),
        ],
        ["doc_id", "text"],
    )
    out = dd.fingerprint_dedup(df).collect()
    by_id = {r.doc_id: r.n_copies for r in out}
    assert by_id == {1: 2, 3: 1}  # 1 and 2 collapse; min id kept


def test_simhash_close_for_near_dups(spark, docs):
    """Near-duplicate docs (jaccard >= 0.8) should have close simhashes
    (small hamming distance), and unrelated docs should not all do."""
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.9).limit(5).collect()
    sigs = {r.id: r.simhash for r in dd.simhash_signatures(docs).collect()}

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    for p in pairs:
        assert hamming(sigs[p.id1], sigs[p.id2]) <= 6, p
    # background pairs: median hamming across a sample must be large
    ids = sorted(sigs)[:20]
    background = [hamming(sigs[ids[i]], sigs[ids[i + 1]]) for i in range(0, 18, 2)]
    assert sorted(background)[len(background) // 2] > 6


def test_shingle_guard_short_docs(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], ["doc_id", "text"])
    sh = dd.shingle_set(df).groupBy("id").agg(F.count("*").alias("n")).collect()
    by_id = {r.id: r.n for r in sh}
    assert 1 not in by_id  # < 3 tokens -> no shingles (no phantom rows)
    assert by_id[2] == 2


def test_connected_components_known_graph(spark):
    """Chain, triangle, and isolated pair must collapse to min-id
    representatives; singletons (no edges) are not emitted."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.clusters import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id1", "id2"],
    )
    out = {r.node: r.cluster_rep for r in connected_components(pairs).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }
