"""Deterministic corpus sampling (Tier E — training-data curation).

``df.sample()`` is seed-dependent *per partition layout*, so the same
call over the same data can select different rows after a repartition
or a cluster resize — useless for reproducible corpus splits.  The
standard large-scale fix is content-hash bucketing: a row is in the
sample iff a stable hash of its id falls in the accepted range.  The
choice is row-local (embarrassingly parallel, no shuffle), stable
across runs/engines, and composable (a 4/16 sample of a 8/16 sample
is a 2/16 sample of the original).

We bucket on the first hex digit of ``md5(id)`` — md5 is available
and bit-identical in Spark, DuckDB, and Python, which is what lets
the DuckDB oracle replay the *exact* row set.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = string.digits + "abcdef"


def hash_sample(df: DataFrame, id_col: str, sixteenths: int) -> DataFrame:
    """Keep rows whose ``md5(id)`` starts with one of the first
    ``sixteenths`` hex digits — a deterministic ~``sixteenths``/16
    sample.  The predicate is computed (md5) so it can't reach the
    parquet reader as a pushed filter, but it evaluates row-local
    inside the scan stage — no shuffle, no extra pass."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    accepted = list(HEX_DIGITS[:sixteenths])
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return df.filter(bucket.isin(accepted))


def hash_sample_predicate_sql(id_col: str, sixteenths: int) -> str:
    """The identical predicate in portable SQL (DuckDB oracle)."""
    accepted = ", ".join(f"'{d}'" for d in HEX_DIGITS[:sixteenths])
    return f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 1) IN ({accepted})"


def row_uniform(id_col: str) -> "F.Column":
    """Deterministic per-row uniform in [0, 1): the first 8 hex
    digits of ``md5(id)`` as a 32-bit integer over 2^32.  Portable —
    the DuckDB twin is ``('0x' || substr(md5(id), 1, 8))::BIGINT /
    4294967296.0`` — and row-local, so weighted keep decisions are
    reproducible anywhere."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def weighted_hash_sample(df: DataFrame, id_col: str, weight_col) -> DataFrame:
    """Keep each row with probability = its weight in [0, 1], decided
    by the deterministic row uniform — importance/quality-weighted
    corpus sampling with an exactly reproducible kept set (no RNG, no
    shuffle)."""
    return df.filter(row_uniform(id_col) < F.col(weight_col))


def train_val_test_split(
    df: DataFrame, id_col: str, val_sixteenths: int = 1, test_sixteenths: int = 1
) -> DataFrame:
    """Deterministic 3-way corpus split: the first hex digit of
    ``md5(id)`` routes each row to test (first ``test_sixteenths``
    digits), val (next ``val_sixteenths``), or train (the rest).

    Row-local (no shuffle, no RNG) and stable across runs, engines,
    and partitionings — the property a reproducible training corpus
    needs; and because bucket ranges nest, growing the corpus never
    moves an existing row between splits."""
    if val_sixteenths + test_sixteenths >= 16:
        raise ValueError("val+test must leave room for train")
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    test_digits = list(HEX_DIGITS[:test_sixteenths])
    val_digits = list(HEX_DIGITS[test_sixteenths : test_sixteenths + val_sixteenths])
    return df.withColumn(
        "split",
        F.when(bucket.isin(test_digits), "test")
        .when(bucket.isin(val_digits), "val")
        .otherwise("train"),
    )


def cap_per_class(
    df: DataFrame, id_col: str, class_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per class, chosen deterministically:
    rows rank by (md5(id), id) inside their class, so the kept set is
    a stable pseudo-random subsample per class — the standard
    majority-class down-capping pass for label balancing.  One
    shuffle (the per-class window)."""
    from pyspark.sql import Window

    w = Window.partitionBy(class_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, sixteenths_by_stratum: dict[str, int]
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    ~n/16 hash fraction (rare classes can keep 16/16 = everything,
    dominant classes 1/16) — the standard class-rebalancing pass for
    training-corpus curation.  Strata not listed are dropped.

    Same scale posture as :func:`hash_sample`: the keep decision is
    row-local (md5 of the id), so no shuffle, stable under
    repartitioning, and identical across engines.  Unlike
    ``df.sampleBy()``, which is seeded per-partition-layout, the
    selected row *set* is reproducible bit-for-bit.
    """
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    pred = F.lit(False)
    for stratum, n in sixteenths_by_stratum.items():
        if not 0 < n <= 16:
            raise ValueError("sixteenths must be in 1..16")
        pred = pred | (
            (F.col(stratum_col) == stratum) & bucket.isin(list(HEX_DIGITS[:n]))
        )
    return df.filter(pred)


def stratified_predicate_sql(
    id_col: str, stratum_col: str, sixteenths_by_stratum: dict[str, int]
) -> str:
    """The identical stratified predicate in portable SQL."""
    clauses = []
    for stratum, n in sixteenths_by_stratum.items():
        accepted = ", ".join(f"'{d}'" for d in HEX_DIGITS[:n])
        clauses.append(
            f"({stratum_col} = '{stratum}' AND "
            f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 1) IN ({accepted}))"
        )
    return " OR ".join(clauses)


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str = "source",
    tau: float = 2.0,
    target_fraction: float = 0.5,
) -> DataFrame:
    """Temperature-based data-mixture sampling — the standard
    multi-source LM recipe (e.g. multilingual-pretraining sampling,
    public literature): source ``i``'s share of the output is
    proportional to ``n_i^(1/tau)`` (``tau > 1`` flattens the mixture
    toward uniform, ``tau = 1`` keeps natural proportions), scaled so
    the expected output is ``target_fraction`` of the corpus; each
    source's keep fraction is capped at 1.

    Per-row decisions use the deterministic :func:`row_uniform`
    (exactly reproducible; SQL twin in the registry oracle), so the
    only non-row-local work is one tiny per-source count aggregate
    broadcast against the corpus scan.

    Engine-portability of the thresholds, at ANY ``tau``: the
    per-source weight ``n^(1/tau)`` is quantized to integer
    micro-units (``wq = floor(w * 1e6 + 0.5)`` as a long) and ALL
    downstream arithmetic — the normalizer sum, the keep-threshold —
    runs on those integers with an identical expression tree on both
    engines, so the only libm-dependent value is ``w`` itself.  For
    ``tau == 2`` the weight comes from ``sqrt`` (correctly rounded by
    IEEE 754 on every engine), making ``wq`` *fully* exact.  For
    other ``tau`` a cross-engine ``pow`` discrepancy (<= 1 ulp,
    ~1e-16 relative) flips ``wq`` only if ``w * 1e6`` lands within
    one ulp of a half-integer boundary — a ~1e-10 per-source event,
    nine orders of magnitude of margin versus comparing raw ``pow``
    outputs.  This is the same micro-unit device the registry's
    other hash-matched float predicates use; driver-verified at
    tau=2 and tau=3."""
    pw = (
        F.sqrt(F.col("_n").cast("double"))
        if tau == 2.0
        else F.pow(F.col("_n").cast("double"), 1.0 / tau)
    )
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_wq", F.floor(pw * 1000000 + F.lit(0.5)).cast("long"))
    )
    tot = counts.agg(
        F.sum("_n").alias("_total"), F.sum("_wq").alias("_zq")
    )
    frac = F.least(
        F.lit(1.0),
        F.lit(target_fraction)
        * F.col("_total")
        * F.col("_wq")
        / (F.col("_zq").cast("double") * F.col("_n")),
    )
    return (
        df.join(F.broadcast(counts), source_col)
        .join(F.broadcast(tot))
        .filter(row_uniform(id_col) < frac)
        .drop("_n", "_wq", "_total", "_zq")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    out_col: str = "shuffle_rank",
    bucket_bits: int = 10,
) -> DataFrame:
    """Deterministic global shuffle order for training epochs: rank
    rows by ``hash48(epoch || ':' || id)`` (id as final tiebreak).

    A training data loader needs every epoch to visit the corpus in a
    different-but-reproducible order.  Engine-native ``rand(seed)`` is
    seeded per partition layout, so the order changes whenever the
    file split changes; hashing the (epoch, id) pair is row-local and
    layout-independent — the same epoch yields the same permutation on
    any cluster, any partitioning, any engine.

    Scale — a global ``row_number`` window would funnel everything
    into ONE partition, so the total order is assembled distributed
    instead: the top ``bucket_bits`` of the hash key split the
    keyspace into ordered buckets (a key prefix, so bucket order ==
    key order), per-bucket counts (tiny agg) prefix-sum into bucket
    offsets (window over <= 2^bucket_bits rows), and the final rank is
    ``offset[bucket] + row_number within bucket`` — one data shuffle
    on the bucket, one broadcast join of the offset table.  Hash
    buckets are uniform by construction, so no bucket skews.
    """
    from pyspark.sql import Window

    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import hash48

    key = hash48(
        F.concat(F.lit(str(epoch)), F.lit(":"), F.col(id_col).cast("string"))
    )
    keyed = df.withColumn("_ek", key).withColumn(
        "_bucket", F.shiftright(F.col("_ek"), 48 - bucket_bits)
    )
    offsets = (
        keyed.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_n")
    )
    local = Window.partitionBy("_bucket").orderBy("_ek", F.col(id_col))
    return (
        keyed.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col, (F.col("_offset") + F.row_number().over(local)).cast("long")
        )
        .drop("_ek", "_bucket", "_offset")
    )


def mixture_plan(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    tau: float = 2.0,
    target_fraction: float = 0.5,
) -> DataFrame:
    """The data-mixing PLAN table — the per-source summary every
    multi-source training run publishes before sampling (the
    row-level sampler is :func:`temperature_mix`; this is its
    planning/reporting face, weighted by TOKENS as the multilingual
    recipe does, not documents):

    - ``n_docs``, ``n_tokens`` — natural sizes;
    - ``weight_micro`` — ``floor(n_tokens^(1/tau) * 1e6 + 0.5)``
      (IEEE-exact at tau=2 via sqrt, the temperature_mix device);
    - ``share_micro`` — the source's share of the tempered mixture,
      ``weight_micro * 1e6 div sum(weight_micro)`` (pure bigint);
    - ``keep_frac_micro`` — the per-source keep probability that
      realizes ``target_fraction`` of total tokens, capped at 1
      (identical expression tree to temperature_mix's threshold);
    - ``expected_tokens`` — ``n_tokens * keep_frac_micro div 1e6``.

    One source-cardinality aggregate + one one-row total — nothing
    corpus-sized moves; fully oracle-replayable."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        token_count,
    )

    pw = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if tau == 2.0
        else F.pow(F.col("n_tokens").cast("double"), 1.0 / tau)
    )
    counts = (
        df.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col)).cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "weight_micro", F.floor(pw * 1000000 + F.lit(0.5)).cast("long")
        )
    )
    tot = counts.agg(
        F.sum("n_tokens").alias("_t"), F.sum("weight_micro").alias("_zq")
    )
    frac = F.least(
        F.lit(1.0),
        F.lit(target_fraction)
        * F.col("_t")
        * F.col("weight_micro")
        / (F.col("_zq").cast("double") * F.col("n_tokens")),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "share_micro",
            # decimal, not int64: weight_micro = round(sqrt(n)*1e6)
            # overflows the long multiply once one source exceeds
            # ~8.5e13 tokens (ADVICE r10) — inside the 15T-token
            # envelope.  Same decimal device as budget_i below.
            F.expr(
                "cast(weight_micro as decimal(38,0)) * 1000000 div _zq"
            ).cast("bigint"),
        )
        .withColumn(
            "keep_frac_micro",
            F.floor(frac * 1000000 + F.lit(0.5)).cast("long"),
        )
        .withColumn(
            "expected_tokens",
            F.expr("n_tokens * keep_frac_micro div 1000000").cast("bigint"),
        )
        .drop("_t", "_zq")
    )


def epoch_plan(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    tau: float = 2.0,
) -> DataFrame:
    """Per-source EPOCH plan (round 10) — the LLaMA-style mixture
    table where small high-quality sources run MORE THAN ONE epoch:
    given a total training token ``budget_tokens`` and the tempered
    share each source should contribute (``n_tokens^(1/tau)``
    weights, the :func:`mixture_plan` device), how many full passes
    over each source does the budget buy, and how many tokens of a
    final partial pass remain?

    Output per source: ``(source, n_docs, n_tokens, share_micro,
    budget_i, n_full_epochs, remainder_tokens, n_epochs_micro)`` —
    all integer arithmetic after the one floor-quantized sqrt weight
    (IEEE-exact at tau=2, the temperature_mix precedent):
    ``budget_i = budget * share_micro div 1e6``, ``n_full_epochs =
    budget_i div n_tokens``, ``remainder = budget_i mod n_tokens``,
    ``n_epochs_micro = budget_i * 1e6 div n_tokens`` (>1e6 means the
    source repeats).

    One source-cardinality aggregate + a one-row total — nothing
    corpus-sized moves."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        token_count,
    )

    pw = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if tau == 2.0
        else F.pow(F.col("n_tokens").cast("double"), 1.0 / tau)
    )
    counts = (
        df.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col)).cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "weight_micro", F.floor(pw * 1000000 + F.lit(0.5)).cast("long")
        )
    )
    tot = counts.agg(F.sum("weight_micro").alias("_zq"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "share_micro",
            # decimal, not int64: weight_micro = round(sqrt(n)*1e6)
            # overflows the long multiply once one source exceeds
            # ~8.5e13 tokens (ADVICE r10) — inside the 15T-token
            # envelope.  Same decimal device as budget_i below.
            F.expr(
                "cast(weight_micro as decimal(38,0)) * 1000000 div _zq"
            ).cast("bigint"),
        )
        .withColumn(
            "budget_i",
            # decimal(38,0) multiply: a 15T-token budget x a 1e6 share
            # overflows int64; div on decimal is exact and yields bigint
            F.expr(
                f"cast(share_micro as decimal(38,0)) * {budget_tokens}"
                " div 1000000"
            ).cast("bigint"),
        )
        .withColumn(
            "n_full_epochs", F.expr("budget_i div n_tokens").cast("bigint")
        )
        .withColumn(
            "remainder_tokens",
            F.expr("budget_i % n_tokens").cast("bigint"),
        )
        .withColumn(
            "n_epochs_micro",
            F.expr(
                "cast(budget_i as decimal(38,0)) * 1000000 div n_tokens"
            ).cast("bigint"),
        )
        .drop("_zq", "weight_micro")
    )


def materialize_epochs(
    df: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Realize an :func:`epoch_plan` as the actual repeated training
    stream (round 10): every document of a source appears once per
    FULL epoch, plus the deterministic greedy prefix of the source's
    md5-ordered docs whose cumulative tokens fit ``remainder_tokens``
    (token-accurate to one document) as the final PARTIAL epoch.

    Output: ``(id_col, source_col, epoch)`` — epoch is 1-based;
    partial-epoch rows carry ``n_full_epochs + 1``.  Deterministic on
    any engine/partitioning: the partial-epoch membership is a
    running sum over the md5(doc_id) total order (the cap_per_class
    window device).

    Scale shape: one broadcast join against the tiny plan; the full
    epochs are a row-local ``explode(sequence(...))`` (output-
    proportional — repeating data costs exactly the repeated rows).
    The partial-epoch running sum is BUCKETED (the epoch_shuffle
    distributed-rank device): a window partitioned only by source
    would put an entire multi-TB source in ONE task, so docs bucket
    by their md5 PREFIX (md5 total order == (bucket, md5) order),
    per-(source, bucket) token totals prefix-sum into offsets over
    the tiny 256-rows-per-source frame, and the corpus-sized window
    runs per (source, bucket) — any single task holds ~1/256 of a
    source.  Result identical to the global window (property-tested
    equal)."""
    from pyspark.sql import Window

    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        token_count,
    )

    p = plan.select(
        source_col, "n_full_epochs", "remainder_tokens"
    )
    d = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(text_col).cast("long").alias("_nt"),
    ).join(F.broadcast(p), source_col)
    full = d.filter(F.col("n_full_epochs") >= 1).select(
        id_col,
        source_col,
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.col("n_full_epochs"))
        ).alias("epoch"),
    )
    md5c = F.md5(F.col(id_col).cast("string"))
    db = d.withColumn("_b", F.substring(md5c, 1, 2))
    btot = db.groupBy(source_col, "_b").agg(
        F.sum("_nt").cast("long").alias("_bt")
    )
    woff = (
        Window.partitionBy(source_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = btot.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(woff), F.lit(0)).cast("long")
    ).select(source_col, "_b", "_off")
    wb = (
        Window.partitionBy(source_col, "_b")
        .orderBy(md5c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        db.join(offs, [source_col, "_b"])
        .withColumn("_run", F.col("_off") + F.sum("_nt").over(wb))
        .filter(F.col("_run") <= F.col("remainder_tokens"))
        .select(
            id_col,
            source_col,
            (F.col("n_full_epochs") + 1).cast("bigint").alias("epoch"),
        )
    )
    return full.unionByName(partial)


def curriculum_order(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "doc_id",
    epoch: int = 0,
    ascending: bool = True,
    bucket_bits: int = 8,
    out_col: str = "curriculum_rank",
) -> DataFrame:
    """Curriculum training order (round 10 — the Bengio et al. 2009
    easy-to-hard schedule applied to corpus serving): a TOTAL global
    rank that visits difficulty buckets in order (``ascending=True``
    = easiest first) and hash-shuffles WITHIN each bucket with the
    :func:`epoch_shuffle` epoch-keyed permutation, so every epoch
    reshuffles within buckets but never across the curriculum.

    ``bucket_col`` is the caller's integer difficulty bucket (a
    perplexity bucket, a z-score band, a length tier — the policy
    stays composable).  Output adds ``out_col``: 1-based, dense,
    layout/engine/retry-deterministic.

    Scale: the epoch_shuffle device extended to a composite key — a
    global ``row_number`` would funnel the corpus into one task, so
    ranks assemble distributed: per (difficulty bucket x hash-prefix
    bucket) counts (tiny), prefix-summed offsets over that tiny frame
    in curriculum order, then ``offset + row_number`` inside each
    composite bucket.  One data shuffle, one broadcast join."""
    from pyspark.sql import Window

    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        hash48,
    )

    key = hash48(
        F.concat(F.lit(str(epoch)), F.lit(":"), F.col(id_col).cast("string"))
    )
    keyed = df.withColumn("_ek", key).withColumn(
        "_hb", F.shiftright(F.col("_ek"), 48 - bucket_bits)
    )
    border = (
        F.col(bucket_col).asc() if ascending else F.col(bucket_col).desc()
    )
    offsets = (
        keyed.groupBy(bucket_col, "_hb")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy(border, F.col("_hb").asc()).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_n")
    )
    local = Window.partitionBy(bucket_col, "_hb").orderBy(
        "_ek", F.col(id_col)
    )
    return (
        keyed.join(F.broadcast(offsets), [bucket_col, "_hb"])
        .withColumn(
            out_col,
            (F.col("_offset") + F.row_number().over(local)).cast("long"),
        )
        .drop("_ek", "_hb", "_offset")
    )


def repeat_value(
    plan: DataFrame,
    r_star_micro: int = 15_390_000,
) -> DataFrame:
    """Value-adjusted token accounting for repeated epochs — the
    data-constrained scaling law of Muennighoff et al. 2023 ("Scaling
    Data-Constrained Language Models"): tokens seen again are worth
    less than fresh tokens, with the value of the r-th repetition
    decaying exponentially at rate ``R*`` (the paper fits
    R* ~ 15.39 epochs).  The effective-data formula:

        D_eff = U + U * R* * (1 - exp(-R / R*))

    where U is the source's unique tokens and R its repeat epochs
    beyond the first (fractional allowed).  At R=0 (single pass)
    D_eff = U; as R grows, the repeated mass saturates at U * R*.

    ``plan`` is :func:`epoch_plan`'s output (``n_tokens``,
    ``budget_i``, ``n_epochs_micro`` per source).  Output adds:

    - ``effective_tokens``: U + floor(decayed repeat value + 0.5);
    - ``value_ratio_micro``: effective / budget_i in integer micro —
      how much of what the budget PAYS for the source actually
      delivers (1e6 = every bought token worth a fresh one; NULL when
      the source got no budget).

    Pure per-source row-local arithmetic over the bounded plan table:
    the one exp is a per-row expression replicated op-for-op by the
    oracle, floor-quantized once (the repo's ln/exp precedent); the
    ratio uses the decimal-div device (no int64 overflow at 15T
    tokens)."""
    rs = int(r_star_micro)
    eff = F.expr(
        f"n_tokens + cast(floor("
        f"cast(n_tokens as double) * ({rs} / 1000000.0)"
        f" * (1.0 - exp(-((greatest(0, n_epochs_micro - 1000000)"
        f" / 1000000.0) / ({rs} / 1000000.0))))"
        f" + 0.5) as bigint)"
    )
    return plan.withColumn("effective_tokens", eff).withColumn(
        "value_ratio_micro",
        F.when(
            F.col("budget_i") > 0,
            F.expr(
                "cast(effective_tokens as decimal(38,0)) * 1000000"
                " div budget_i"
            ).cast("bigint"),
        ),
    )


def unimax_budget(
    df: DataFrame,
    budget_tokens: int,
    epoch_cap_micro: int = 4_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): instead of a temperature exponent, each source
    gets an EPOCH CAP (``epoch_cap_micro`` passes over its data, in
    integer micro so fractional caps are expressible) and the token
    budget water-fills: iterate sources in ASCENDING capacity order
    and give each ``min(capacity, remaining div n_left)`` — an equal
    share of what remains, unless the cap binds first.  Low-resource
    sources are never oversampled past their cap, high-resource
    sources absorb the slack.

    All arithmetic is integer (min / truncating div / subtraction) —
    no float anywhere — so the DuckDB oracle replays the exact loop
    as a recursive CTE with zero drift; ties in capacity order break
    by source name (total order).  Up to ``n_sources - 1`` tokens of
    the budget stay unallocated to truncation (documented, exact).

    Output per source: ``(source, n_docs, n_tokens, capacity_tokens,
    budget_i, n_epochs_micro)`` — ``capacity_tokens = n_tokens *
    epoch_cap_micro div 1e6`` (decimal device: no int64 wrap at the
    15T-token envelope), ``n_epochs_micro = budget_i * 1e6 div
    n_tokens``.

    Scale shape: one source-cardinality aggregate is the only
    distributed work; the water-fill runs driver-side over BOUNDED
    CONTROL DATA (n_sources rows — the doremi_weights precedent)."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        token_count,
    )

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    if epoch_cap_micro < 0:
        raise ValueError("epoch_cap_micro must be >= 0")
    counts = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col)).cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "capacity_tokens",
            F.expr(
                f"cast(n_tokens as decimal(38,0)) * {int(epoch_cap_micro)}"
                " div 1000000"
            ).cast("bigint"),
        )
    )
    rows = sorted(
        (
            (r["source"], int(r["n_docs"]), int(r["n_tokens"]),
             int(r["capacity_tokens"]))
            for r in counts.collect()
        ),
        key=lambda t: (t[3], t[0]),
    )
    spark = df.sparkSession
    out = []
    remaining = int(budget_tokens)
    n_left = len(rows)
    for src, nd, nt, cap in rows:
        b = min(cap, remaining // n_left) if n_left else 0
        remaining -= b
        n_left -= 1
        epochs = (b * 1_000_000) // nt if nt > 0 else 0
        out.append((src, nd, nt, cap, b, epochs))
    return spark.createDataFrame(
        out,
        "source string, n_docs bigint, n_tokens bigint,"
        " capacity_tokens bigint, budget_i bigint, n_epochs_micro bigint",
    )


def grouped_hash_rank(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    out_col: str = "rank",
    prefix_chars: int = 2,
) -> DataFrame:
    """Deterministic 1-based md5 rank WITHIN each group — the
    per-source budget-sampling primitive (rank <= k keeps a stable
    pseudo-random k-subset per source).  Assembled DISTRIBUTED: a
    per-group global ``row_number`` window would put a whole
    multi-TB source in one task (the materialize_epochs lesson), so
    ranks come from the :func:`curriculum_order` composite-bucket
    device with the group as the outer key: per (group, md5-prefix)
    counts (a tiny frame: groups x 16^prefix_chars rows), per-group
    prefix-summed offsets over that frame, then ``offset +
    row_number`` inside each composite bucket.  The bucket key is a
    PREFIX of the sort key, so per-bucket order concatenated in
    bucket order IS the per-group (md5, id) order — rank-exact vs the
    single-window form (property-tested).  One data shuffle, one
    broadcast join."""
    m = F.md5(F.col(id_col).cast("string"))
    keyed = df.withColumn("_mk", m).withColumn(
        "_pfx", F.substring("_mk", 1, prefix_chars)
    )
    from pyspark.sql import Window as W

    offsets = (
        keyed.groupBy(group_col, "_pfx")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    W.partitionBy(group_col)
                    .orderBy(F.col("_pfx").asc())
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_n")
    )
    local = W.partitionBy(group_col, "_pfx").orderBy("_mk", F.col(id_col))
    return (
        keyed.join(F.broadcast(offsets), [group_col, "_pfx"])
        .withColumn(
            out_col,
            (F.col("_offset") + F.row_number().over(local)).cast("long"),
        )
        .drop("_mk", "_pfx", "_offset")
    )
