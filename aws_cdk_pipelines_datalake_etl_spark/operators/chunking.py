"""Training-window preparation: document chunking and sequence
packing — the two ops between a curated corpus and a tokenizer at
100 TB.

Both are pure Catalyst expressions (sequence/slice/explode plus one
window), so they run entirely in whole-stage codegen: chunking is a
row-local fan-out (no shuffle at all); packing is one shuffle on the
shard key.  Nothing here needs a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
    token_count,
    tokens,
)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token windows: a chunk
    starts every ``stride`` tokens and spans ``chunk_tokens`` (the
    final chunks are shorter).  Every token lands in >= 1 chunk and
    consecutive chunks overlap by ``chunk_tokens - stride`` — the
    standard context-window slicing for LLM pretraining data.

    Row-local: the starts are a ``sequence`` over the token count and
    the chunk text a ``slice`` of the token array, so the fan-out
    happens inside the scan stage with no shuffle; output rows are
    (doc, chunk_idx, n_chunk_tokens, chunk_text).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    d = df.select(F.col(id_col), tokens(text_col).alias("toks"))
    starts = F.expr(f"sequence(1, greatest(1, size(toks)), {stride})")
    return (
        d.select(F.col(id_col), "toks", F.posexplode(starts).alias("pos", "start"))
        .select(
            F.col(id_col),
            (F.col("pos") + 1).alias("chunk_idx"),
            F.expr(f"slice(toks, start, {chunk_tokens})").alias("chunk_toks"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.size("chunk_toks").alias("n_chunk_tokens"),
            F.array_join("chunk_toks", " ").alias("chunk_text"),
        )
    )


def pack_greedy_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 2048,
) -> DataFrame:
    """Assign whole documents to fixed-token-budget training bins by
    deterministic running-sum packing.

    A single global greedy pack is inherently sequential, so the
    scalable formulation shards first (first md5 hex digit of the id,
    16 shards — same deterministic bucketing as :mod:`.sampling`;
    widen the prefix for more parallelism), then packs within
    each shard by id order: cumulative token count, bin =
    floor((cumsum - 1) / budget).  One shuffle (the per-shard window);
    shards pack in parallel, and the layout is stable across runs,
    partitionings, and engines.  Documents longer than the budget get
    a bin to themselves plus spill into the next — downstream chunking
    (:func:`chunk_documents`) handles intra-document splitting.

    Output: (shard, doc_id, n_tokens, bin_id).
    """
    d = df.select(
        F.col(id_col),
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).alias("shard"),
        token_count(text_col).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "shard",
        F.col(id_col),
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - 1) / budget_tokens)
        .cast("long")
        .alias("bin_id"),
    )


def pack_token_sequences(
    encoded: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    budget_tokens: int = 2048,
    shard_chars: int = 1,
    eod_id: int | None = None,
    emit_doc_spans: bool = False,
) -> DataFrame:
    """Materialize FIXED-LENGTH token-id training sequences from
    per-document id arrays — the terminal artifact of an LLM data
    pipeline (tokenize -> pack): documents concatenate in id order
    within a shard and the stream is cut every ``budget_tokens`` ids,
    docs spilling across cuts (GPT-style packing, no padding except
    the final partial sequence per shard).

    Input: ``(id_col, ids_col array<int>, ...)`` — e.g. the output of
    :func:`..bpe.bpe_encode_ids`.  Output:
    ``(shard, seq_id, n_tokens, token_ids)`` where ``n_tokens ==
    budget_tokens`` for every sequence except possibly the last of
    each shard.

    Scale shape: md5-prefix shard bucketing + per-shard running-sum
    window as :func:`pack_greedy_bins` to locate each doc's global
    offset, then a ROW-LOCAL fan-out of one row per (doc x overlapped
    sequence) carrying just the doc's ``slice`` of that sequence —
    never one row per token — and one hash agg reassembling each
    sequence from its pieces (`sort_array` on the in-sequence
    position, then `flatten`).  Two shuffles total (window + agg),
    both on keys with bounded fan-in; intermediate volume is
    O(total_tokens + n_docs) ids regardless of budget.

    ``shard_chars`` is the parallelism dial: ``16**shard_chars``
    shards, each packed independently (the per-shard window IS the
    sequential part).  The default 1 (16 shards) matches
    :func:`pack_greedy_bins`; at 100 TB set 3-4 (4k-64k shards) so a
    shard's token stream fits one task comfortably — sequences never
    cross shards, so widening only changes the layout, not the
    invariants.

    Document boundaries (VERDICT r8 #1 — what makes the artifact
    actually trainable):

    - ``eod_id``: when set, this reserved id is appended to every
      (non-empty) document's id array BEFORE packing — the GPT-style
      end-of-document sentinel.  Reserve the id in the vocabulary
      (:func:`..bpe.build_vocab` ``specials=``) so it cannot collide
      with a real token.  Appending is row-local, so the packing
      invariants (budget cuts, spill-across-cuts) are unchanged —
      only the stream is ``len+1`` ids per doc.
    - ``emit_doc_spans``: when True the output gains ``doc_spans
      array<struct<pos:int,len:int>>`` — one entry per document PIECE
      in the sequence, sorted by ``pos``; spans tile the sequence
      exactly (``pos`` cumulative, lens sum to ``n_tokens``).  A
      training loader derives the attention-mask reset points from
      them.  A doc spilling across a cut contributes its tail piece
      as span ``(0, ...)`` of the next sequence — sequences are
      trained independently, so the continuation is a fresh span by
      construction.  Derived from the same fan-out structs the
      reassembly already sorts; no extra shuffle.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if shard_chars < 1 or shard_chars > 8:
        raise ValueError("shard_chars must be in [1, 8]")
    ids_in = F.col(ids_col)
    if eod_id is not None:
        ids_in = F.concat(ids_in, F.array(F.lit(eod_id).cast("int")))
    d = encoded.filter(F.size(ids_col) > 0).select(
        F.col(id_col),
        F.substring(F.md5(F.col(id_col).cast("string")), 1, shard_chars).alias(
            "shard"
        ),
        ids_in.alias("_ids"),
        F.size(ids_in).alias("_n"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    B = budget_tokens
    d = d.select(
        "shard",
        "_ids",
        "_n",
        (F.sum("_n").over(w) - F.col("_n")).cast("long").alias("_start"),
    )
    # one row per (doc x sequence it overlaps): docs spill across cuts.
    # Integer `div`, NOT float `/`: float division is only exact while
    # offsets stay below 2^53 — a real 100 TB shard stream can exceed
    # that, so the bounds must be long arithmetic end to end.
    d = d.select(
        "shard",
        "_ids",
        "_n",
        "_start",
        F.explode(
            F.sequence(
                F.expr(f"_start div {B}"),
                F.expr(f"(_start + _n - 1) div {B}"),
            )
        ).alias("seq_id"),
    )
    seg_lo = F.greatest(F.col("seq_id") * B, F.col("_start"))
    seg_hi = F.least((F.col("seq_id") + 1) * B, F.col("_start") + F.col("_n"))
    piece = F.slice(
        "_ids",
        (seg_lo - F.col("_start") + 1).cast("int"),
        (seg_hi - seg_lo).cast("int"),
    )
    pos_in_seq = (seg_lo - F.col("seq_id") * B).cast("int")
    parts = d.select(
        "shard",
        "seq_id",
        F.struct(pos_in_seq.alias("pos"), piece.alias("piece")).alias("part"),
    )
    agged = parts.groupBy("shard", "seq_id").agg(
        F.sort_array(F.collect_list("part")).alias("_parts")
    )
    out_cols = [
        F.col("shard"),
        F.col("seq_id"),
        F.flatten(F.transform("_parts", lambda s: s["piece"])).alias(
            "token_ids"
        ),
    ]
    if emit_doc_spans:
        out_cols.append(
            F.transform(
                "_parts",
                lambda s: F.struct(
                    s["pos"].alias("pos"), F.size(s["piece"]).alias("len")
                ),
            ).alias("doc_spans")
        )
    final = ["shard", "seq_id", F.size("token_ids").alias("n_tokens"), "token_ids"]
    if emit_doc_spans:
        final.append("doc_spans")
    return agged.select(*out_cols).select(*final)


def pack_with_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 2048,
) -> DataFrame:
    """:func:`pack_greedy_bins` plus each document's 0-based GLOBAL
    token offset in its shard's stream — what a training data loader
    needs to materialize fixed-length sequences with correct
    attention-mask boundaries (a doc's slice of bin ``b`` is
    ``[start_global - b*budget, ...)``; negative means it began in the
    previous bin and spills in).  Same single per-shard window — the
    offset is the cumsum minus the doc's own length, no extra
    shuffle."""
    d = df.select(
        F.col(id_col),
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).alias("shard"),
        token_count(text_col).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumsum = F.sum("n_tokens").over(w)
    return d.select(
        "shard",
        F.col(id_col),
        "n_tokens",
        F.floor((cumsum - 1) / budget_tokens).cast("long").alias("bin_id"),
        (cumsum - F.col("n_tokens")).cast("long").alias("start_global"),
    )


def packing_efficiency(
    packed: DataFrame,
    budget_tokens: int,
    by: tuple[str, ...] = ("shard",),
) -> DataFrame:
    """Packing OBSERVABILITY (round 10): the per-shard efficiency
    report a training pipeline publishes next to the packed artifact —
    is the budget actually filled, how much padding does the loader
    burn, how fragmented are the documents?

    Input is :func:`pack_token_sequences` output.  Output, one row per
    ``by`` group::

        n_seqs           sequences produced
        n_full_seqs      sequences at exactly ``budget_tokens``
        n_tokens         real tokens packed
        n_pad            budget - n_tokens over partial sequences
                         (the pad the loader will add)
        fill_ratio_micro n_tokens * 1e6 div (n_seqs * budget) —
                         integer micro-ratio (the ``div`` contract:
                         exact at any magnitude)
        n_doc_pieces     total document pieces (doc_spans entries;
                         requires ``emit_doc_spans=True`` input)
        pieces_per_seq_micro  n_doc_pieces * 1e6 div n_seqs

    One hash agg over the packed frame — group count is bounded by the
    shard fan-out, so the report is a tiny relation at any corpus
    size."""
    has_spans = "doc_spans" in packed.columns
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.sum(
            F.when(F.col("n_tokens") == budget_tokens, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_full_seqs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.lit(budget_tokens) - F.col("n_tokens"))
        .cast("long")
        .alias("n_pad"),
    ]
    if has_spans:
        aggs.append(
            F.sum(F.size("doc_spans")).cast("long").alias("n_doc_pieces")
        )
    g = packed.groupBy(*[F.col(c) for c in by]).agg(*aggs)
    out = g.select(
        *by,
        "n_seqs",
        "n_full_seqs",
        "n_tokens",
        "n_pad",
        # decimal(38,0) multiply: a shard of >9.2e12 tokens (coarse
        # shard_chars at ~100 TB) would overflow int64 * 1e6
        F.expr(
            "cast(n_tokens as decimal(38,0)) * 1000000"
            f" div (n_seqs * {budget_tokens})"
        ).cast("long").alias("fill_ratio_micro"),
        *(
            [
                "n_doc_pieces",
                F.expr(
                    "cast(n_doc_pieces as decimal(38,0)) * 1000000"
                    " div n_seqs"
                ).cast("long").alias("pieces_per_seq_micro"),
            ]
            if has_spans
            else []
        ),
    )
    return out
