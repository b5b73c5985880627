"""Training-sequence augmentation transforms: fill-in-the-middle and
T5-style span corruption — the last-mile rewrites a pretraining
pipeline applies to token-id sequences before batching.

Both operators take documents as ``(id, array<int> token_ids)`` rows
(the output surface of ``bpe_encode_ids`` or any tokenizer) and are
fully deterministic: every "random" choice is derived from the
portable 48-bit md5 hash of (doc id, purpose tag), so results are
engine- and partition-exact and a DuckDB oracle replays them bit for
bit.  Production pipelines that want true randomness swap the hash
for a seeded RNG column — a one-line seam that changes selection
only, never the transform math.

- :func:`fim_transform` — "Efficient Training of Language Models to
  Fill in the Middle" (Bavarian et al. 2022, OpenAI): split a
  document at two cuts into (prefix, middle, suffix) and emit the PSM
  reordering ``[PRE] prefix [SUF] suffix [MID] middle`` for a
  configurable fraction of documents, reserved sentinel ids supplied
  by the caller.

- :func:`span_corruption` — the T5 denoising objective (Raffel et
  al. 2020): mask contiguous spans, replacing each with a sentinel in
  the encoder input and emitting ``sentinel + original tokens`` pairs
  as the decoder target.  This implementation uses a BLOCKED variant
  (one fixed-length span at a hash-derived offset inside each full
  window of ``window`` tokens): the corruption rate is exactly
  ``span_len / window`` and span placement needs no sequential
  conflict resolution, so the operator is one row-local array
  expression per document — embarrassingly parallel at 100 TB, unlike
  the paper's sequential span sampler.  Deviation documented here and
  in the tests.

Everything is Catalyst array algebra (slice / concat / transform /
filter / sequence) — no explode, no shuffle, no Python: the whole
transform is a narrow map over documents.

No reference-parity citation: the reference (aws-samples
aws-cdk-pipelines-datalake-etl) has no training-data surface; Tier-E
LLM-corpus toolkit (SURVEY.md §2.6/§6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import hash48

MICRO = 1_000_000


def _hash_pick(id_col: Column, tag: str, modulus: Column) -> Column:
    """Deterministic draw in [0, modulus): hash48 of the id string
    plus a purpose tag, reduced mod ``modulus``.  Distinct tags give
    independent-looking draws from one id."""
    return F.pmod(
        hash48(F.concat(id_col.cast("string"), F.lit(":" + tag))), modulus
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    pre_id: int = 1000,
    suf_id: int = 1001,
    mid_id: int = 1002,
    rate_micro: int = 900_000,
) -> DataFrame:
    """Fill-in-the-middle (PSM mode): for ``rate_micro`` / 1e6 of the
    documents, pick two hash-derived cut points 0 <= lo <= hi <= n and
    emit

        [pre_id] ids[:lo] [suf_id] ids[hi:] [mid_id] ids[lo:hi]

    so the model learns to produce the middle conditioned on both
    sides.  The remaining documents pass through unchanged (the
    published recipe trains on a mixture; 0.9 is the paper's rate).
    Empty documents pass through.

    Deterministic cuts: lo/hi are min/max of two independent draws in
    [0, n] from :func:`_hash_pick` (tags ``u1``/``u2``), and the
    apply/skip decision is a third draw — so any engine, any
    partitioning, any retry produces the identical corpus.

    Output: ``(id, fim_applied boolean, n_tokens int,
    token_ids array<int>)``; transformed docs are exactly 3 ids longer
    than their input.  A NULL ``ids_col`` row passes through with
    ``fim_applied=false`` and NULL ``n_tokens`` (ADVICE r9: never the
    size-of-null ``-1`` sentinel).  One narrow projection — no
    shuffle."""
    n = F.size(F.coalesce(F.col(ids_col), F.array().cast("array<int>")))
    u1 = _hash_pick(F.col(id_col), "u1", n + 1)
    u2 = _hash_pick(F.col(id_col), "u2", n + 1)
    lo = F.least(u1, u2)
    hi = F.greatest(u1, u2)
    apply = (
        _hash_pick(F.col(id_col), "apply", F.lit(MICRO)) < F.lit(rate_micro)
    ) & (n >= 1)

    prefix = F.slice(F.col(ids_col), F.lit(1), lo)
    middle = F.slice(F.col(ids_col), lo + 1, hi - lo)
    suffix = F.slice(F.col(ids_col), hi + 1, n - hi)
    psm = F.concat(
        F.array(F.lit(pre_id)),
        prefix,
        F.array(F.lit(suf_id)),
        suffix,
        F.array(F.lit(mid_id)),
        middle,
    ).cast("array<int>")
    out = F.when(apply, psm).otherwise(F.col(ids_col).cast("array<int>"))
    return df.select(
        F.col(id_col),
        apply.alias("fim_applied"),
        F.when(F.col(ids_col).isNull(), F.lit(None))
        .otherwise(F.size(out))
        .cast("int")
        .alias("n_tokens"),
        out.alias(ids_col),
    )


def _span_inputs(
    ids: Column,
    n: Column,
    n_win: Column,
    starts: Column,
    window: int,
    span_len: int,
    sentinel_base: int,
) -> Column:
    """The corrupted-input stream built WINDOW-BY-WINDOW with native
    ``slice``/``concat``: per full window, the tokens before the span
    start, the window's sentinel, the tokens after the span end — then
    the uncorrupted tail.  Value-identical to the per-position walk it
    replaced (r12, guide §1.2 step 2 / §4.1): higher-order-function
    lambdas evaluate INTERPRETED per invocation, so walking every
    position cost n lambda calls per row; this form pays n/window
    calls whose bodies are native array copies (~5x less interpreted
    work at window=20)."""
    win = F.when(
        n_win >= 1,
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                lambda k: F.concat(
                    F.slice(
                        ids,
                        k * window + 1,
                        F.element_at(starts, k + 1) - k * window,
                    ),
                    F.array((F.lit(sentinel_base) + k).cast("int")),
                    F.slice(
                        ids,
                        F.element_at(starts, k + 1) + span_len + 1,
                        (k + 1) * window
                        - F.element_at(starts, k + 1)
                        - span_len,
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<int>"))
    tail = F.when(
        n > n_win * window,
        F.slice(ids, n_win * window + 1, n - n_win * window),
    ).otherwise(F.array().cast("array<int>"))
    return F.concat(win, tail).cast("array<int>")


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    window: int = 20,
    span_len: int = 3,
    sentinel_base: int = 1000,
) -> DataFrame:
    """T5 denoising pairs, blocked variant (module doc): every FULL
    window of ``window`` tokens gets one corrupted span of
    ``span_len`` tokens at a hash-derived offset (tag ``w<k>`` per
    window index k); the trailing partial window is never corrupted.

    - ``inputs``: the token stream with each span replaced by its
      window's sentinel ``sentinel_base + k`` (k = 0-based window
      index — both engines agree on it by construction);
    - ``targets``: for each corrupted window in order, its sentinel
      followed by the original span tokens (the decoder target).

    Corruption rate is exactly ``span_len / window`` of every full
    window.  Requires ``span_len <= window``.

    Implementation is pure row-local array algebra: positions are a
    ``sequence`` + ``transform``/``filter`` over the ids array — no
    explode, no shuffle, no per-token rows ever leave the document's
    row.  Output: ``(id, n_tokens, n_spans, inputs array<int>,
    targets array<int>)``."""
    if span_len > window:
        raise ValueError("span_len must be <= window")

    # Stage 1 projection: materialize the per-window span starts ONCE
    # (one md5 per WINDOW).  The position walk below only does array
    # lookups into this column — the first implementation recomputed
    # the hash inside the per-position lambda (~window× more md5
    # calls; 16.4 s -> see SCALE.md round-9 session-2 table).  The
    # multi-reference guard in CollapseProject keeps this projection
    # from being inlined back into the lambdas.
    ids0 = F.col(ids_col)
    n0 = F.size(ids0)
    n_win0 = F.floor(n0 / F.lit(window)).cast("int")
    starts0 = F.when(
        n_win0 >= 1,
        F.transform(
            F.sequence(F.lit(0), n_win0 - 1),
            lambda k: (
                k * window
                + F.pmod(
                    hash48(
                        F.concat(
                            F.col(id_col).cast("string"),
                            F.lit(":w"),
                            k.cast("string"),
                        )
                    ),
                    F.lit(window - span_len + 1),
                )
            ).cast("int"),
        ),
    ).otherwise(F.array().cast("array<int>"))
    staged = df.select(
        F.col(id_col),
        ids0.alias("_ids"),
        n0.cast("int").alias("_n"),
        n_win0.alias("_nw"),
        starts0.alias("_starts"),
    )

    ids = F.col("_ids")
    n = F.col("_n")
    n_win = F.col("_nw")
    starts = F.col("_starts")

    # inputs: window-by-window native slices (see _span_inputs — the
    # r12 replacement for the per-position interpreted lambda walk)
    inputs = _span_inputs(
        ids, n, n_win, starts, window, span_len, sentinel_base
    )

    # targets: per window in order, sentinel + the span's tokens
    targets = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda k: F.concat(
                F.array(F.lit(sentinel_base) + k),
                F.slice(ids, F.element_at(starts, k + 1) + 1, F.lit(span_len)),
            ),
        )
    ).cast("array<int>")
    targets = F.when(n_win >= 1, targets).otherwise(
        F.array().cast("array<int>")
    )

    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_win.alias("n_spans"),
        inputs.alias("inputs"),
        targets.alias("targets"),
    )


def ul2_mixture(
    df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    r_window: int = 20,
    r_span: int = 3,
    x_window: int = 16,
    x_span: int = 8,
    sentinel_base: int = 1000,
    tag_r: int = 900,
    tag_x: int = 901,
    tag_s: int = 902,
    weights: tuple[int, int, int] | None = None,
) -> DataFrame:
    """UL2 mixture-of-denoisers (Tay et al. 2022, "UL2: Unifying
    Language Learning Paradigms"): every document is routed by a
    deterministic hash draw to ONE of three training objectives, with
    the paradigm tag token prepended to the encoder input so the
    model learns which mode it is in:

    - **R-denoiser** (regular): the T5 objective — short spans, low
      corruption (:func:`span_corruption` at ``r_window``/``r_span``,
      default 15%);
    - **X-denoiser** (extreme): long spans / aggressive corruption
      (``x_window``/``x_span``, default 50%) — the "hard" denoising
      mode the paper credits for infilling ability;
    - **S-denoiser** (sequential): PrefixLM — a hash-drawn cut point
      splits the document; inputs = the prefix, targets = the suffix
      (causal continuation, no sentinels).

    The route is ``hash48(id + ':ul2') mod 3`` when ``weights`` is
    None (R/X/S equally), and CUMULATIVE MICRO-WEIGHT BUCKETING on
    ``hash48(id + ':ul2') mod 1e6`` when the paper's tuned R/X/S
    mixture rates are supplied (VERDICT r11 #7): ``weights`` is a
    3-tuple of integer micro rates summing to exactly 1_000_000, and
    a doc routes to the first denoiser whose cumulative bucket holds
    its draw — deterministic, engine-portable, and expressible in the
    oracle as two comparisons.  The default deliberately stays the
    ``mod 3`` form (not uniform buckets) so existing outputs are
    bit-identical.  The S cut is
    ``hash48(id + ':s-cut') mod (n + 1)`` — fully deterministic, so a
    DuckDB oracle replays routes, cuts, spans and sentinels exactly.

    Output: ``(id_col, denoiser string, n_tokens, inputs, targets)``.
    Plan shape (r12, guide §2.4): ONE scan, one row-local projection —
    the route, the (window, span) pair, the span walk and the S cut
    are all pick-conditional CASE expressions, so each row evaluates
    exactly its own denoiser's branch.  The pre-r12 form unioned three
    FILTERED branches of the same scan, which re-ran the upstream
    tokenize/hash chain three times and read the corpus three times at
    scale.  Row set and values are identical (the union merely
    concatenated the disjoint pick partitions; A/B-asserted and
    oracle-checked)."""
    if weights is None:
        pick0 = _hash_pick(F.col(id_col), "ul2", F.lit(3))
    else:
        if len(weights) != 3 or any(w < 0 for w in weights):
            raise ValueError("weights must be three non-negative micro rates")
        if sum(weights) != 1_000_000:
            raise ValueError(
                f"weights must sum to exactly 1_000_000, got {sum(weights)}"
            )
        draw = _hash_pick(F.col(id_col), "ul2", F.lit(1_000_000))
        pick0 = (
            F.when(draw < F.lit(weights[0]), F.lit(0))
            .when(draw < F.lit(weights[0] + weights[1]), F.lit(1))
            .otherwise(F.lit(2))
        )

    # Stage 1 projection (the span_corruption staging device): pick,
    # the per-window span starts for the row's OWN denoiser (R/X rows
    # only — S rows pay no window hashing, as before) and the S cut
    # are materialized ONCE per row.  The R and X walks below keep
    # their (window, span) as LITERALS — a pick-conditional window
    # column inside the per-position lambda measured ~1.7x slower than
    # two literal walks selected by a lazy CASE.
    idc = F.col(id_col)
    ids0 = F.col(ids_col)
    n0 = F.size(ids0)

    def _starts_for(window: int, span_len: int) -> Column:
        n_win0 = F.floor(n0 / F.lit(window)).cast("int")
        return F.when(
            n_win0 >= 1,
            F.transform(
                F.sequence(F.lit(0), n_win0 - 1),
                lambda k: (
                    k * window
                    + F.pmod(
                        hash48(
                            F.concat(
                                idc.cast("string"),
                                F.lit(":w"),
                                k.cast("string"),
                            )
                        ),
                        F.lit(window - span_len + 1),
                    )
                ).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>"))

    nw0 = (
        F.when(pick0 == 0, F.floor(n0 / F.lit(r_window)))
        .when(pick0 == 1, F.floor(n0 / F.lit(x_window)))
        .otherwise(F.lit(0))
        .cast("int")
    )
    starts0 = (
        F.when(pick0 == 0, _starts_for(r_window, r_span))
        .when(pick0 == 1, _starts_for(x_window, x_span))
        .otherwise(F.array().cast("array<int>"))
    )
    cut0 = F.when(pick0 == 2, _hash_pick(idc, "s-cut", n0 + 1))
    staged = df.select(
        idc,
        pick0.alias("_pick"),
        ids0.alias("_ids"),
        n0.cast("int").alias("_n"),
        nw0.alias("_nw"),
        starts0.alias("_starts"),
        cut0.alias("_cut"),
    )

    pick = F.col("_pick")
    ids = F.col("_ids")
    n = F.col("_n")
    n_win = F.col("_nw")
    starts = F.col("_starts")
    cut = F.col("_cut")

    def _walk(window: int, span_len: int) -> tuple[Column, Column]:
        # span_corruption's window walk over the staged columns (r12:
        # native window slices via _span_inputs, not a per-position
        # interpreted lambda)
        inp = _span_inputs(
            ids, n, n_win, starts, window, span_len, sentinel_base
        )
        tgt = F.when(
            n_win >= 1,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), n_win - 1),
                    lambda k: F.concat(
                        F.array(F.lit(sentinel_base) + k),
                        F.slice(
                            ids,
                            F.element_at(starts, k + 1) + 1,
                            F.lit(span_len),
                        ),
                    ),
                )
            ).cast("array<int>"),
        ).otherwise(F.array().cast("array<int>"))
        return inp, tgt

    r_in, r_tg = _walk(r_window, r_span)
    x_in, x_tg = _walk(x_window, x_span)
    tag_col = (
        F.when(pick == 0, F.lit(tag_r))
        .when(pick == 1, F.lit(tag_x))
        .otherwise(F.lit(tag_s))
    )
    body = (
        F.when(pick == 2, F.slice(ids, F.lit(1), cut))
        .when(pick == 0, r_in)
        .otherwise(x_in)
    )
    inputs = F.concat(F.array(tag_col), body).cast("array<int>")
    targets = (
        F.when(pick == 2, F.slice(ids, cut + 1, n - cut).cast("array<int>"))
        .when(pick == 0, r_tg)
        .otherwise(x_tg)
    )
    denoiser = (
        F.when(pick == 0, F.lit("R"))
        .when(pick == 1, F.lit("X"))
        .otherwise(F.lit("S"))
    )
    return staged.select(
        F.col(id_col),
        denoiser.alias("denoiser"),
        n.alias("n_tokens"),
        inputs.alias("inputs"),
        targets.alias("targets"),
    )
