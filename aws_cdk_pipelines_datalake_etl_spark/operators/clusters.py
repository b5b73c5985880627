"""Connected components over near-duplicate pairs — the collapse step
of corpus dedup.

Pair-finders (:mod:`.dedup`, :mod:`.similarity`) emit edges; keeping
ONE document per duplicate *cluster* requires the transitive closure:
if A~B and B~C, then A,B,C are one cluster even when A~C was never
emitted.  The standard distributed formulation is iterative min-label
propagation (the simplified Connected Components of
Kiveris et al. / GraphFrames): every node starts labeled with itself;
each round replaces a node's label by the min over its neighbors'
labels (and its own); fixpoint after at most diameter rounds.

Spark-first shape: the loop is a *driver* loop, but each round is two
distributed hash shuffles (join labels->edges, groupBy min) — no data
ever collects to the driver; the only driver-side value per round is
the count of changed labels (the convergence test).  Diameter of
near-dup graphs is tiny in practice (clusters are near-cliques), so
rounds ~ 2-4.  At 100 TB the same loop runs with checkpointing every
few rounds to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Min-label connected components over an undirected edge list.

    Returns ``(node, cluster_rep)`` for every node appearing in at
    least one edge, where ``cluster_rep`` is the smallest node id in
    the component.  Raises if the fixpoint is not reached within
    ``max_iterations`` (= graph diameter bound).

    Lineage truncation per round uses ``localCheckpoint`` by default
    (fast, but blocks live in non-replicated executor storage — an
    executor loss aborts the job).  Pass ``checkpoint_dir`` to use
    RELIABLE ``checkpoint`` instead: label blocks are written to
    that (HDFS/S3-class) directory each round, so a 1000-executor
    run survives executor churn at the cost of one distributed write
    per round (VERDICT r5 #6).
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    edges = (
        pairs.select(F.col(id1).alias("a"), F.col(id2).alias("b"))
        .union(pairs.select(F.col(id2).alias("a"), F.col(id1).alias("b")))
        .distinct()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # convergence: one count action per round; the labels
        # themselves never leave the executors
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # checkpointing truncates the per-round lineage so the plan
        # doesn't grow exponentially with iterations; reliable when a
        # checkpoint_dir was given, executor-local otherwise
        if checkpoint_dir is not None:
            labels = new_labels.checkpoint(eager=True)
        else:
            labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    else:
        raise RuntimeError(f"did not converge in {max_iterations} rounds")
    return labels.select("node", F.col("label").alias("cluster_rep"))


def dedup_cluster_representatives(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """One row per clustered document: (doc, its cluster's min id).
    Docs in no pair are implicitly their own representative and are
    not emitted (keeps the output proportional to the duplicate set,
    not the corpus).  ``checkpoint_dir`` selects reliable
    checkpointing (see :func:`connected_components`)."""
    return connected_components(
        pairs, id1, id2, checkpoint_dir=checkpoint_dir
    ).select(F.col("node").alias("doc_id"), "cluster_rep")


def quality_canonicals(
    pairs: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    id1: str = "id1",
    id2: str = "id2",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """QUALITY-AWARE canonical selection (round 10): instead of the
    min-id convention, each near-dup cluster keeps its HIGHEST-quality
    member (ties broken by smaller id — total order, deterministic on
    any engine).  The standard curation refinement: when a crawl
    carries a truncated copy and a full copy of the same page, min-id
    keeps whichever was crawled first; quality-argmax keeps the
    better one.

    ``pairs`` is any near-dup pair list (minhash_lsh_pairs at scale);
    ``quality`` maps ``id_col`` to an INTEGER ``quality_col`` (token
    count, a gopher score, the distilled classifier logit — the
    caller's policy).  Coverage is NOT required: clustered docs with
    no quality row are kept (LEFT join) with a long-MIN sentinel, so
    they still emit a row and deterministically lose every argmax tie
    against a scored member (ADVICE r10 — an inner join silently
    dropped them AND could flip the canonical without signal).

    Output, one row per clustered doc: ``(doc_id, cluster_rep,
    canonical_id, keep boolean)`` — ``cluster_rep`` stays the min-id
    cluster KEY (stable identity), ``canonical_id`` the argmax member,
    ``keep = (doc_id == canonical_id)``.  Unclustered docs are
    implicitly their own canonical and are not emitted (output stays
    proportional to the duplicate set).

    Plan: the CC fixpoint (lineage-truncated), one broadcast-friendly
    join to attach quality, ONE struct-max agg per cluster (the
    contrastive-triplets argmax device — no window), one join back."""
    from pyspark.sql import types as T

    # ADVICE r11: quality_col is in the loop too — a non-numeric
    # quality (string scores) would otherwise cast("long") to NULL,
    # coalesce to the long-MIN sentinel, and silently degrade the
    # argmax to min-id with no error.
    for frame, col, what in (
        (quality, id_col, f"quality[{id_col!r}]"),
        (quality, quality_col, f"quality[{quality_col!r}]"),
        (pairs, id1, f"pairs[{id1!r}]"),
        (pairs, id2, f"pairs[{id2!r}]"),
    ):
        dt = frame.schema[col].dataType
        if not isinstance(dt, T.NumericType):
            raise TypeError(
                f"quality_canonicals requires a numeric {what} for the "
                f"(quality, -id) tie-break; got {dt.simpleString()}"
            )
    members = connected_components(
        pairs, id1, id2, checkpoint_dir=checkpoint_dir
    ).select(F.col("node").alias(id_col), "cluster_rep")
    q = quality.select(
        F.col(id_col), F.col(quality_col).cast("long").alias("_q")
    )
    # LEFT join + long-MIN sentinel: a clustered doc with no quality
    # row still emits (and loses ties deterministically) instead of
    # vanishing from both the output and the argmax candidate set.
    with_q = members.join(q, id_col, "left").withColumn(
        "_q", F.coalesce(F.col("_q"), F.lit(-(1 << 63)).cast("long"))
    )
    best = with_q.groupBy("cluster_rep").agg(
        F.max(
            F.struct(
                F.col("_q").alias("q"), (-F.col(id_col)).alias("neg_id")
            )
        ).alias("_b")
    )
    return (
        with_q.join(best, "cluster_rep")
        .select(
            id_col,
            "cluster_rep",
            (-F.col("_b.neg_id")).cast("long").alias("canonical_id"),
            (F.col(id_col) == -F.col("_b.neg_id")).alias("keep"),
        )
    )
