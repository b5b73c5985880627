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
