"""Link-graph analytics: PageRank in exact integer arithmetic.

Web-corpus curation weights pages by link authority (OpenWebText's
karma threshold, Common Crawl's harmonic-centrality lists), so the
crawl front end in ``operators/web.py`` needs a rank pass over the
(src, dst) edge table it extracts.

Power iteration is expressed in INTEGER micro-rank units so the
result is bit-identical on any engine and any partitioning:

    contrib(s)  = rank(s) DIV outdeg(s)              (integer div)
    rank'(d)    = (15 * SCALE) DIV 100
                + (85 * sum(contrib over in-edges)) DIV 100

Float PageRank sums per-node contributions in whatever order the
shuffle delivers them — non-associative double addition makes the
fixed point layout-dependent.  Bigint sums are exact, so the
truncating divisions above are the ONLY rounding, and they are
deterministic.  (The per-iteration truncation loses < 1 micro-unit
per term vs the float recurrence — irrelevant for ranking, essential
for reproducibility.)

Scale posture: each iteration is one join of the rank table against
the edge table on ``src`` (both shuffle-partitioned by the same key,
so AQE reuses the layout) and one aggregation by ``dst`` — the
standard 2-shuffle PageRank round.  Ranks are node-sized, edges
dominate; nothing collects to the driver.  For deep iteration counts
pass ``checkpoint_dir`` to truncate lineage with RELIABLE
checkpoints every ``checkpoint_every`` rounds (same contract as
``dedup_clusters``, operators/clusters.py).

No reference-parity citation: the reference has no graph surface;
Tier-E web-corpus toolkit (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Integer-exact PageRank over ``edges``; returns
    (node, rank_micro) with ranks in micro-units (SCALE = initial
    mass per node).

    Nodes are the union of sources and destinations; dangling nodes
    (no out-edges) simply stop propagating their mass — the damping
    term keeps every node's rank positive, and determinism is
    unaffected.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = nodes.withColumn("rank_micro", F.lit(SCALE).cast("long"))
    base = (15 * SCALE) // 100
    for i in range(iterations):
        # ``div`` is Spark's INTEGER division on longs — never route
        # micro-rank arithmetic through double ``/``: a quotient that
        # lands within half an ulp of an integer would round across
        # the boundary and break bit-parity with the oracle.
        contribs = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"])
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div outdeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("incoming"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .withColumn("incoming", F.coalesce(F.col("incoming"), F.lit(0)))
            .select(
                "node",
                (F.lit(base) + F.expr("(85 * incoming) div 100")).alias(
                    "rank_micro"
                ),
            )
        )
        if checkpoint_dir is not None and (i + 1) % checkpoint_every == 0:
            ranks = ranks.checkpoint(eager=True)
    return ranks
