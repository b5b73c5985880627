"""Full-text retrieval: BM25 scoring over an inverted document-term
index built with plain aggregations.

The shape is the classic search-engine split, re-expressed as
DataFrames so Catalyst owns the physical plan:

- ``bm25_doc_stats`` scans the corpus ONCE (one token explode feeds
  both the per-(doc, term) term frequencies and the per-doc length);
  the result is the inverted index a real deployment would persist,
  partitioned by term.
- ``bm25_topk`` joins a (small) query-term table against that index
  on the term key.  The query side is explicitly broadcast — the
  probe touches only index rows whose term appears in some query,
  which at scale is a tiny fraction of the corpus, and the corpus
  never reshuffles.

Determinism contract (shared with the rest of the repo, see
``functions/rounding.py``): the only non-IEEE-portable primitive is
``ln``, so each per-term partial score is quantized to integer
micro-units BEFORE the per-document sum — bigint addition is
order-independent, while summing doubles is not — and the quotient
back to a double happens exactly once.

No reference-parity citation: the reference (aws-samples
aws-cdk-pipelines-datalake-etl) has no retrieval surface; this is
part of the Tier-E LLM-corpus toolkit (SURVEY.md §2.6/§6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import tokens

MICRO = 1_000_000

# RRF partials are exact integers: NANO div (K + rank).  No floats
# anywhere in the fusion, so the fused ordering is engine-exact.
NANO = 1_000_000_000
RRF_K = 60


def bm25_doc_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Build the BM25 index tables from one corpus scan.

    Returns ``(docterm, docstats)``:

    - ``docterm``: one row per (doc, term) with the term frequency
      ``tf`` — the inverted index.  In a persisted deployment this is
      the table you'd write bucketed by ``term``.
    - ``docstats``: one row per doc with its token count ``dl``.

    Both hang off the same exploded-token child, so Spark reuses the
    scan (and the explode is a narrow map — no shuffle until the two
    aggregations, each a single hash agg with map-side partials).
    """
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    )
    docterm = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    docstats = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    return docterm, docstats


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (Robertson idf).

    ``queries`` is a (query_id, term) table — many queries scored in
    one pass.  Per matched (query, doc, term):

        idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
        part = idf * (tf * (k1 + 1))
                   / (tf + k1 * (1 - b + b * (dl / avgdl)))

    and the document score is the sum of micro-quantized parts.
    Ranking ties break on ascending doc id, so the top-k set is
    deterministic on any cluster layout.

    Scale posture: the corpus-sized tables (``docterm``) are joined
    only against the BROADCAST query-term list, so the big side never
    reshuffles for the probe; ``df``(term) and the corpus constants
    (N, avgdl) are one-row/vocabulary-sized broadcasts.  The final
    per-query ranking partitions by query id — thousands of queries
    spread across the cluster, never a single global sort.
    """
    docterm, docstats = bm25_doc_stats(df, id_col, text_col)
    qterms = queries.select(
        F.col(query_id_col).alias("qid"), F.col(term_col).alias("term")
    ).distinct()

    # One probe of the index covers both needs: the matched postings
    # AND the document frequency of every query term (count of
    # distinct docs per term over the matched postings — ``docterm``
    # is unique per (doc, term), so this equals the corpus df).  The
    # corpus-sized side is scanned once, not once per statistic.
    hits = docterm.join(F.broadcast(qterms), "term")
    termdf = hits.groupBy("term").agg(
        F.count_distinct(F.col("doc")).alias("df")
    )
    corpus = docstats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    part = idf * (
        (tf * F.lit(k1 + 1.0))
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl / avgdl)))
    )
    part_micro = F.floor(part * MICRO + F.lit(0.5)).cast("long")

    scored = (
        hits.join(F.broadcast(termdf), "term")
        .join(docstats, "doc")
        .crossJoin(F.broadcast(corpus))
        .withColumn("part_micro", part_micro)
        .groupBy("qid", "doc")
        .agg(
            F.sum("part_micro").alias("score_micro"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score_micro").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("doc").alias(id_col),
            F.col("rank"),
            (F.col("score_micro") / F.lit(float(MICRO))).alias("bm25"),
            "n_matched_terms",
        )
    )


def rrf_fuse(
    ranked: list[DataFrame],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack et al. 2009):

        score(q, d) = sum over systems  1 / (rrf_k + rank_i(q, d))

    computed in EXACT integer nano-units — ``NANO div (rrf_k + rank)``
    — so the fused score is a bigint sum of integers: no float
    addition, no ordering sensitivity, bit-identical on any engine or
    partitioning.  Documents absent from a system's list simply
    contribute nothing (the standard RRF convention).

    Ties on the fused score break on ascending doc id.  Input frames
    need (query_id, doc_id, rank) columns; ranks are 1-based.

    Scale posture: the inputs are already top-k-per-query tables —
    tiny relative to the corpus — so the union + one hash aggregation
    by (query, doc) and one per-query window is all bounded by
    queries x k x n_systems rows.  Nothing touches the corpus again.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        df.select(
            F.col(query_id_col).alias("qid"),
            F.col(id_col).alias("doc"),
            F.expr(f"{NANO} div ({rrf_k} + {rank_col})").alias("part_nano"),
        )
        for df in ranked
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy("qid", "doc").agg(
        F.sum("part_nano").alias("rrf_nano"),
        F.count(F.lit(1)).alias("n_systems"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("rrf_nano").desc(), F.col("doc").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("doc").alias(id_col),
            "rank",
            "rrf_nano",
            "n_systems",
        )
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Per-query ranking metrics against a relevance-judgment table.

    ``qrels`` holds (query_id, doc_id) pairs judged relevant (binary).
    Output per query: ``hits_at_k``, ``recall_at_k_micro`` (micro-unit
    integer: hits * MICRO div n_relevant), ``mrr_micro`` (MICRO div
    first-relevant-rank, 0 if none) — every metric an exact integer,
    so cross-engine comparison is bit-level.

    Queries with zero judged-relevant docs are excluded (recall is
    undefined there), matching trec_eval.

    Scale posture: results are top-k tables and qrels are judgment
    lists — both tiny; one equi-join on (query, doc) plus one
    aggregation per side.  The qrels side is broadcast.
    """
    res = results.select(
        F.col(query_id_col).alias("qid"),
        F.col(id_col).alias("doc"),
        F.col(rank_col).alias("rank"),
    ).filter(F.col("rank") <= k)
    rel = qrels.select(
        F.col(query_id_col).alias("qid"), F.col(id_col).alias("doc")
    ).distinct()
    n_rel = rel.groupBy("qid").agg(F.count(F.lit(1)).alias("n_relevant"))

    matched = res.join(F.broadcast(rel), ["qid", "doc"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("hits_at_k"),
        F.min("rank").alias("first_rel_rank"),
    )
    return (
        n_rel.join(matched, "qid", "left")
        .select(
            F.col("qid").alias(query_id_col),
            F.coalesce(F.col("hits_at_k"), F.lit(0)).alias("hits_at_k"),
            "n_relevant",
            F.expr(
                f"coalesce(hits_at_k, 0) * {MICRO} div n_relevant"
            ).alias("recall_at_k_micro"),
            F.coalesce(
                F.expr(f"{MICRO} div first_rel_rank"), F.lit(0)
            ).cast("long").alias("mrr_micro"),
        )
    )


def bm25_hard_negatives(
    df: DataFrame,
    queries: DataFrame,
    positives: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    k_neg: int = 5,
    depth: int = 100,
) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR recipe,
    Karpukhin et al. 2020: "top passages returned by BM25 which don't
    contain the answer"): rank the corpus per query with BM25 to
    ``depth``, drop the positives, keep the ``k_neg`` best-scoring
    survivors — the near-miss documents a contrastive dual-encoder
    learns the most from.

    Two positive notions, mirroring practice:

    - explicit ``positives`` (query_id, doc_id) qrels — dropped with a
      broadcast LEFT ANTI join;
    - ``positives=None``: a document is presumed positive iff it
      matches EVERY query term (the exact-match relevance rule).  This
      costs nothing: ``bm25_topk`` already emits ``n_matched_terms``,
      so the filter is ``n_matched_terms < n_query_terms`` against a
      broadcast per-query term count — no second corpus scan.

    Output: one row per (query, negative) with the negative's rank
    among negatives (``neg_rank`` 1..k_neg), its original BM25 rank
    (``rank``), score and matched-term count.  Deterministic: BM25
    scores are integer-micro sums, ties break on doc id, and both
    re-rankings reuse that total order.

    Scale posture: everything after the ``bm25_topk`` probe operates
    on queries x depth rows — corpus-independent; the probe itself
    keeps the corpus shuffle-free (broadcast query terms).  At real
    depth (DPR mines from the top ~100 of a billion-passage index)
    the per-query volume is still tiny."""
    ranked = bm25_topk(
        df,
        queries,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        term_col=term_col,
        k1=k1,
        b=b,
        k=depth,
    )
    if positives is not None:
        rel = positives.select(
            F.col(query_id_col), F.col(id_col)
        ).distinct()
        cand = ranked.join(
            F.broadcast(rel), [query_id_col, id_col], "left_anti"
        )
    else:
        nq = queries.groupBy(F.col(query_id_col)).agg(
            F.count_distinct(F.col(term_col)).alias("_n_q_terms")
        )
        cand = ranked.join(F.broadcast(nq), query_id_col).filter(
            F.col("n_matched_terms") < F.col("_n_q_terms")
        )
    w = Window.partitionBy(query_id_col).orderBy(F.col("rank").asc())
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k_neg)
        .select(
            query_id_col,
            id_col,
            "neg_rank",
            "rank",
            "bm25",
            "n_matched_terms",
        )
    )
