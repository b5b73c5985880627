"""Integer-exact PageRank: parity with a pure-Python replica of the
recurrence, layout independence, and the reliable-checkpoint path."""

from __future__ import annotations

import os
import tempfile

from aws_cdk_pipelines_datalake_etl_spark.operators.graph import SCALE, pagerank

EDGES = [
    # 0 is a hub: everyone links to it; it links out to 1 and 2.
    (1, 0), (2, 0), (3, 0), (4, 0),
    (0, 1), (0, 2),
    (1, 2), (2, 3), (3, 4), (4, 1),
]


def _reference(edges, iterations):
    nodes = sorted({n for e in edges for n in e})
    out: dict[int, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {n: SCALE for n in nodes}
    base = (15 * SCALE) // 100
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // out[s]
        rank = {n: base + (85 * incoming[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_integer_reference(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_micro for r in pagerank(edges, iterations=5).collect()}
    assert got == _reference(EDGES, 5)
    # The hub out-ranks every spoke.
    assert got[0] == max(got.values())


def test_pagerank_zero_iterations_is_uniform(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_micro for r in pagerank(edges, iterations=0).collect()}
    assert got == {n: SCALE for n in range(5)}


def test_pagerank_layout_independent(spark):
    """Bit-identical ranks whatever the input partitioning — the
    point of the integer formulation."""
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r.node: r.rank_micro
         for r in pagerank(edges.repartition(1), iterations=4).collect()}
    b = {r.node: r.rank_micro
         for r in pagerank(edges.repartition(7, "dst"), iterations=4).collect()}
    assert a == b


def test_pagerank_reliable_checkpoint_path(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    with tempfile.TemporaryDirectory() as ckpt:
        got = {
            r.node: r.rank_micro
            for r in pagerank(
                edges, iterations=4, checkpoint_dir=ckpt, checkpoint_every=2
            ).collect()
        }
        assert got == _reference(EDGES, 4)
        # The reliable checkpoint actually wrote RDD state.
        assert any(os.scandir(ckpt))
