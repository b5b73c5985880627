"""N-gram language-model training and scoring — the CCNet-style
quality signal of a pretraining-corpus pipeline.

A bigram model with *stupid backoff* (Brants et al. 2007, "Large
Language Models in Machine Translation"):

    p(w2 | w1) = C(w1 w2) / C(w1)                 if C(w1 w2) > 0
               = 0.4 * (C(w2) + 1) / (T + V)      otherwise

where C are counts over the TRAINING split, T the training token
total and V the training vocabulary size.  The add-one on the
backoff unigram keeps out-of-vocabulary tokens finite without a
separate OOV symbol, and every probability is a ratio of exact
integers — so the only non-portable primitive is the final ``ln``,
handled with the repo's integer micro-nat quantization
(sum bigints, divide once; see ``functions/rounding.py``).

Scale posture: training is two hash aggregations over one exploded
token stream (map-side partials; the bigram explode is row-local
``slice``+``arrays_zip``, no window).  Scoring joins the scored
stream against the model tables on the n-gram key — vocabulary-sized
sides that AQE broadcasts while they fit and shuffles by key once
they don't.  Nothing is collected to the driver.

The classic use downstream is CCNet's perplexity bucketing: rank the
corpus by model score and split into head/middle/tail terciles
(``perplexity_buckets``), which a curation pipeline samples at
different rates.

No reference-parity citation: the reference (aws-samples
aws-cdk-pipelines-datalake-etl) has no LM surface; Tier-E LLM-corpus
toolkit (SURVEY.md §2.6/§6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import tokens

MICRO = 1_000_000
BACKOFF = 0.4


def _bigrams(text_col: str) -> Column:
    """Row-local bigram structs of the whitespace token stream.

    ``slice`` + ``arrays_zip`` instead of a positional self-join or a
    lead() window: no shuffle, no per-doc window state — a document's
    bigrams never leave its row until the explode.
    """
    t = tokens(text_col)
    n = F.size(t)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(t, F.lit(1), n - 1).alias("w1"),
            F.slice(t, F.lit(2), n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def train_bigram_lm(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the bigram LM: ``(bigrams, unigrams, totals)``.

    - ``bigrams``: (w1, w2, c2)
    - ``unigrams``: (w, c1)
    - ``totals``: one row (t_tokens, v_vocab)

    One persisted-model deployment writes the first two bucketed by
    their join keys; here they stay DataFrames.
    """
    uni = df.select(F.explode(tokens(text_col)).alias("w"))
    unigrams = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    bigrams = (
        df.select(F.explode(_bigrams(text_col)).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    totals = unigrams.agg(
        F.sum("c1").alias("t_tokens"), F.count(F.lit(1)).alias("v_vocab")
    )
    return bigrams, unigrams, totals


def bigram_logprob(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean bigram log-probability of each ``score`` document under
    the model trained on ``train`` (stupid backoff, see module doc).

    Output per scored doc: ``avg_logprob`` (mean micro-quantized
    natural-log probability per bigram), ``n_bigrams``, and
    ``n_backoff`` (bigram occurrences that fell to the unigram
    backoff — the unseen-continuation rate, itself a useful novelty
    signal).  Docs with fewer than 2 tokens score NULL avg and 0
    counts are excluded (no bigrams to score).
    """
    bigrams, unigrams, totals = train_bigram_lm(train, text_col)

    stream = score.select(
        F.col(id_col).alias("id"), F.explode(_bigrams(text_col)).alias("bg")
    ).select(
        "id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )

    joined = (
        stream.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams.select(F.col("w").alias("w1"), "c1"), "w1", "left")
        .join(
            unigrams.select(
                F.col("w").alias("w2"), F.col("c1").alias("c1_w2")
            ),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    seen = F.col("c2").isNotNull() & F.col("c1").isNotNull()
    p = F.when(seen, F.col("c2") / F.col("c1")).otherwise(
        F.lit(BACKOFF)
        * (F.coalesce(F.col("c1_w2"), F.lit(0)) + F.lit(1))
        / (F.col("t_tokens") + F.col("v_vocab"))
    )
    micro_logp = F.floor(F.log(p) * MICRO + F.lit(0.5)).cast("long")
    return (
        joined.withColumn("micro_logp", micro_logp)
        .withColumn("is_backoff", (~seen).cast("int"))
        .groupBy("id")
        .agg(
            F.sum("micro_logp").alias("s"),
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("is_backoff").alias("n_backoff"),
        )
        .select(
            F.col("id").alias(id_col),
            (F.col("s") / (F.col("n_bigrams") * F.lit(float(MICRO)))).alias(
                "avg_logprob"
            ),
            "n_bigrams",
            "n_backoff",
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    logprob_col: str = "avg_logprob",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity terciles: rank docs by model score
    (best = highest mean log-probability = lowest perplexity) and
    label equal-depth buckets 1..n (1 = head, n = tail).

    ``ntile`` over a single global ordering is the textbook form and
    what the oracle states; at corpus scale the same labels come from
    an ``approxQuantile``/quantile-summary cutpoint broadcast instead
    of one global sort — the repo's equidepth-histogram entry
    (``q54``) demonstrates that pattern.  Ties break on doc id, so
    bucket membership is deterministic.
    """
    w = Window.orderBy(F.col(logprob_col).desc(), F.col(id_col).asc())
    return scored.select(
        id_col,
        logprob_col,
        F.ntile(n_buckets).over(w).alias("ppl_bucket"),
    )
