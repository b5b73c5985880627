"""DoReMi-style domain reweighting — the multiplicative-weights
mixture controller of Xie et al. 2023 ("DoReMi: Optimizing Data
Mixtures Speeds Up Language Model Pretraining").

The published algorithm trains a small proxy model with Group DRO:
at each step the domain weights move multiplicatively toward the
domains with the largest EXCESS loss (proxy loss minus a per-domain
reference-model loss), with a uniform smoothing term; the averaged
weights then re-mix the full pretraining corpus.  This module
implements the exact controller arithmetic on top of a pluggable
excess-loss signal:

- :func:`source_excess_loss` — the data-only default signal: each
  source's mean per-token negative log-probability under the
  corpus's OWN unigram LM, minus the best source's (a static stand-in
  for "how much harder is this domain than the easiest one"; a real
  deployment feeds per-step proxy/reference losses through the same
  column contract).
- :func:`doremi_weights` — ``steps`` rounds of the Group-DRO weight
  update over the bounded per-source table:

      g_i   = floor(alpha_i * exp(eta * excess_i) + 0.5)   (micro)
      alpha'_i = floor(((1-c) * g_i / Z + c / n) * 1e6 + 0.5)

  with Z = sum_i g_i.  Every cross-row reduction (Z, the reference
  minimum, token totals) is an INTEGER sum/min — exact and
  association-free — and every float op is a per-row expression
  replicated op-for-op by the DuckDB oracle (the repo's ln/exp
  precedent), with a floor re-quantization to integer micro after
  each step so divergence cannot accumulate.

Scale shape: the distributed work is one token explode feeding the
vocabulary agg and the per-source sums (map-side partials); the
controller loop runs over the collected per-source table — BOUNDED
CONTROL DATA (n_sources rows, like the DSIR model collect), never
corpus rows.

No reference-parity citation: the reference (aws-samples
aws-cdk-pipelines-datalake-etl) has no training-data surface; Tier-E
LLM-corpus toolkit (SURVEY.md §2.6/§6).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import tokens

MICRO = 1_000_000


def source_excess_loss(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source unigram-LM loss and excess over the best source.

    Output: ``(source, n_tokens, loss_micro, excess_micro)`` —
    ``loss_micro`` is the source's mean per-token NEGATIVE unigram
    log-probability in integer micro-nats (``(-sum) div n`` of the
    per-occurrence quantized logps, the :func:`~..operators.text.
    unigram_logprob` device grouped by source instead of doc),
    ``excess_micro = loss_micro - min(loss_micro)``.

    Scale shape (VERDICT r11 #2): the exploded occurrence stream is
    aggregated to ``(source, term, c)`` FIRST, so the join against
    the vocabulary frequencies is vocabulary-proportional on both
    sides — never the corpus-sized skewed-key shuffle the naive
    per-occurrence form pays (a hot term like "the" is bounded by
    n_sources rows after the pre-agg, not by its corpus count).
    Value-identical: every occurrence of a term in a source carries
    the SAME quantized logp, so ``sum over occurrences == c *
    micro_logp`` exactly (integer multiply distributes).  The
    per-source accumulation is decimal(38,0) BEFORE the divide
    (ADVICE r11: a large source's micro-logp sum reaches ~1e19-1e20
    at a 15T-token envelope — past int64), and the product casts c
    first so ``c * micro_logp`` cannot wrap either."""
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("term"),
    )
    src_term = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    # freq/total aggregate the occurrence stream DIRECTLY (map-side
    # combine collapses to vocab/1 row per task) rather than chaining
    # off src_term — chaining would put a (source, term) exchange
    # under each of them for no benefit (A/B-measured ~15% slower).
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    micro = F.floor(
        F.log(F.col("n_term") / F.col("n_total")) * MICRO + F.lit(0.5)
    ).cast("long")
    per_src = (
        src_term.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("micro_logp", micro)
        .groupBy("source")
        .agg(
            F.sum(
                F.col("c").cast("decimal(38,0)") * F.col("micro_logp")
            ).alias("_s"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "loss_micro", F.expr("(-_s) div n_tokens").cast("long")
        )
    )
    best = per_src.agg(F.min("loss_micro").alias("_lo"))
    return (
        per_src.crossJoin(F.broadcast(best))
        .select(
            "source",
            "n_tokens",
            "loss_micro",
            (F.col("loss_micro") - F.col("_lo")).alias("excess_micro"),
        )
    )


def doremi_weights(
    excess: DataFrame,
    spark: SparkSession | None = None,
    eta_micro: int = 100_000,
    smooth_micro: int = 100_000,
    steps: int = 5,
) -> DataFrame:
    """Group-DRO multiplicative-weights loop over the bounded
    per-source excess table (module doc for the update).

    ``excess`` is :func:`source_excess_loss`'s output (or any frame
    with ``source``, ``n_tokens``, ``loss_micro``, ``excess_micro`` —
    the per-step loss seam).  The loop runs DRIVER-side over the
    collected rows: sources are control data (tens, not corpus-sized)
    — the same boundedness argument as the DSIR model collect.

    Output per source: the input columns plus ``alpha_micro``, the
    final mixture weight in integer micro units (sums to ~1e6 up to
    per-row rounding)."""
    if steps < 0:
        raise ValueError("steps must be >= 0")
    rows = sorted(
        (
            (r["source"], int(r["n_tokens"]), int(r["loss_micro"]),
             int(r["excess_micro"]))
            for r in excess.collect()
        ),
        key=lambda t: t[0],
    )
    n = len(rows)
    if n == 0:
        raise ValueError("excess table is empty")
    spark = spark or excess.sparkSession
    eta = eta_micro / 1000000.0
    c = smooth_micro / 1000000.0
    alpha = [math.floor(MICRO / n + 0.5)] * n
    for _ in range(steps):
        g = [
            math.floor(
                alpha[i] * math.exp(eta * (rows[i][3] / 1000000.0)) + 0.5
            )
            for i in range(n)
        ]
        z = sum(g)  # integer: exact, association-free
        alpha = [
            math.floor(((1.0 - c) * (g[i] / z) + c / n) * MICRO + 0.5)
            for i in range(n)
        ]
    return spark.createDataFrame(
        [
            (src, nt, loss, exc, int(alpha[i]))
            for i, (src, nt, loss, exc) in enumerate(rows)
        ],
        "source string, n_tokens bigint, loss_micro bigint,"
        " excess_micro bigint, alpha_micro bigint",
    )


def doremi_sql_ctes(
    eta_micro: int = 100_000, smooth_micro: int = 100_000, steps: int = 5
) -> str:
    """The DuckDB CTE text that REPLAYS the controller loop — one
    source for the update expressions so the oracle can never drift
    from :func:`doremi_weights`.  Expects an ``excess0`` CTE with
    columns ``(source, n_tokens, loss_micro, excess_micro)``; defines
    ``ns`` (source count) and ``t{steps}`` (final alphas with column
    ``alpha``).  Every float expression is spelled exactly as the
    Python loop computes it."""
    parts = [
        "ns AS (SELECT count(*) AS n FROM excess0)",
        "t0 AS (SELECT e.*, CAST(floor(1000000.0 / ns.n + 0.5) AS BIGINT)"
        " AS alpha FROM excess0 e, ns)",
    ]
    for k in range(1, steps + 1):
        parts.append(
            f"g{k} AS (SELECT *, CAST(floor(alpha * exp({eta_micro}"
            f" / 1000000.0 * (excess_micro / 1000000.0)) + 0.5) AS BIGINT)"
            f" AS g FROM t{k - 1})"
        )
        parts.append(f"z{k} AS (SELECT sum(g) AS z FROM g{k})")
        parts.append(
            f"t{k} AS (SELECT source, n_tokens, loss_micro, excess_micro,"
            f" CAST(floor(((1.0 - {smooth_micro} / 1000000.0)"
            f" * (g / z{k}.z) + {smooth_micro} / 1000000.0 / ns.n)"
            f" * 1000000 + 0.5) AS BIGINT) AS alpha"
            f" FROM g{k}, z{k}, ns)"
        )
    return ",\n".join(parts)
