"""Unigram-LM subword tokenizer: distributed training and encoding —
the SentencePiece algorithm (Kudo 2018, "Subword Regularization:
Improving Neural Network Translation Models with Multiple Subword
Candidates"), the other tokenizer family next to BPE
(``operators/bpe.py``): T5, Llama and most multilingual vocabularies
are unigram-LM models.

Algorithm, simplified where documented:

1. **Seed**: every substring of length <= ``max_piece_len`` of the
   corpus word types, scored by occurrence-weighted frequency; all
   single characters are always kept (full coverage — no OOV within
   the training charset).  SentencePiece seeds from an ESA suffix
   array; frequency seeding is the standard reimplementation shortcut
   and changes only which rare pieces survive.
2. **EM + prune rounds**: hard-EM — the E-step assigns each word type
   its VITERBI segmentation under current piece scores (SentencePiece
   uses full forward-backward expectations; hard counts are the
   k-means-style simplification, documented deviation), the M-step
   re-scores pieces from the weighted counts, then pruning drops the
   lowest-count multi-char pieces (``shrink_per_round``) until the
   vocabulary fits ``vocab_size``.
3. **Scores are integer micro-nats**: ``score(p) = micro_ln(count_p)
   - micro_ln(total)`` (ln of integers only, the repo's langid
   quantization), so Viterbi compares exact bigint sums — training
   and encoding are bit-deterministic on any engine, partitioning or
   retry.  Ties prefer fewer pieces, then the lexicographically
   smaller segmentation (total order).

Scale shape — identical to BPE's production decomposition:

- **Training never iterates the corpus.**  One distributed scan
  aggregates the word-frequency table (one shuffle, map-side
  partials, ``top_words``-capped collect — bounded control data);
  seeding, EM and pruning run driver-side over that table only.
- **Encoding is embarrassingly parallel**: the scored piece table
  broadcasts and each document Viterbi-segments row-locally in an
  Arrow-batched pandas UDF (with a per-batch word cache — Zipf makes
  the hit rate high).  Zero shuffle; ``repartition`` dial for
  few-splits inputs, same as ``bpe_encode_ids``.

Words carry the SentencePiece word-boundary marker ``▁`` as a PREFIX
(BPE here uses an end-of-word suffix; the prefix form is the
SentencePiece convention and makes decode exact: concatenate pieces,
split on ``▁``).

Registry coverage is rows-only + pytest golden gates (the EM/prune
loop is not SQL-expressible; tests pin hand segmentations, coverage,
decode identity, and partition invariance).

No reference-parity citation: the reference (aws-samples
aws-cdk-pipelines-datalake-etl) has no tokenizer surface; Tier-E
LLM-corpus toolkit (SURVEY.md §2.6/§6).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.bpe import (
    UNK,
    _py_words,
    word_frequencies,
)

MICRO = 1_000_000

#: SentencePiece word-boundary marker (prefix form).
WB = "▁"


def _micro_ln(x: int) -> int:
    return int(math.floor(math.log(x) * MICRO + 0.5))


def _pieces_of(word: str, max_piece_len: int) -> list[str]:
    return [
        word[i:j]
        for i in range(len(word))
        for j in range(i + 1, min(i + max_piece_len, len(word)) + 1)
    ]


def _viterbi(
    word: str, scores: dict[str, int], max_piece_len: int
) -> list[str] | None:
    """Best segmentation of ``word`` into scored pieces: maximum
    integer score sum; ties prefer FEWER pieces, then the
    lexicographically smaller piece list.  None when some character
    has no piece (cannot happen for training-charset words)."""
    n = len(word)
    # best[i] = (score, -n_pieces, pieces tuple) ending at i
    best: list[tuple[int, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0, 0, ())
    for i in range(n):
        b = best[i]
        if b is None:
            continue
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            p = word[i:j]
            s = scores.get(p)
            if s is None:
                continue
            cand = (b[0] + s, b[1] - 1, b[2] + (p,))
            cur = best[j]
            if (
                cur is None
                or cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] > cur[1])
                or (
                    cand[0] == cur[0]
                    and cand[1] == cur[1]
                    and cand[2] < cur[2]
                )
            ):
                best[j] = cand
    out = best[n]
    return list(out[2]) if out is not None else None


def _expected_piece_counts(
    word: str, fscores: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Forward-backward expected piece counts for one word under the
    current piece log-probs (float nats) — the FULL-EM E-step of Kudo
    2018 §3.2: E[count(p in segmentation of w)] = sum over occurrences
    (i, j) of exp(alpha_i + s_p + beta_j - alpha_n).  Log-domain with
    max-shifted logsumexp; empty dict when the word is unreachable."""
    n = len(word)
    neg = float("-inf")

    def lse(acc: list[float]) -> float:
        m = max(acc)
        return m + math.log(sum(math.exp(a - m) for a in acc))

    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = []
        for i in range(max(0, j - max_piece_len), j):
            if alpha[i] == neg:
                continue
            s = fscores.get(word[i:j])
            if s is not None:
                acc.append(alpha[i] + s)
        if acc:
            alpha[j] = lse(acc)
    if alpha[n] == neg:
        return {}
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = []
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            if beta[j] == neg:
                continue
            s = fscores.get(word[i:j])
            if s is not None:
                acc.append(s + beta[j])
        if acc:
            beta[i] = lse(acc)
    out: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == neg:
            continue
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            if beta[j] == neg:
                continue
            s = fscores.get(word[i:j])
            if s is None:
                continue
            e = math.exp(alpha[i] + s + beta[j] - alpha[n])
            if e > 0.0:
                p = word[i:j]
                out[p] = out.get(p, 0.0) + e
    return out


def train_unigram(
    word_counts: dict[str, int],
    vocab_size: int = 512,
    max_piece_len: int = 4,
    em_rounds: int = 2,
    seed_size: int = 4096,
    shrink_per_round: float = 0.75,
    full_em: bool = False,
) -> dict[str, int]:
    """Driver-side unigram-LM training over the bounded word table
    (the BPE merge-loop precedent): returns the scored piece table
    ``{piece: score_micro}`` of at most ``max(vocab_size, n_chars)``
    pieces.  Every single character seen in training is ALWAYS kept
    (SentencePiece's required-character floor — dropping one would
    make some word unencodable), so when the training charset is
    larger than ``vocab_size`` the returned table exceeds
    ``vocab_size``; multi-char pieces are pruned to fit only the
    remaining budget (ADVICE r9: the floor is the contract, not a
    violation of it).  Fully deterministic: counts are integers,
    scores integer micro-nats, every selection sorts (-count, piece).

    Words are marked: each word type becomes ``WB + word`` before
    seeding, so pieces learn the boundary position exactly as
    SentencePiece does.

    ``full_em=True`` (round 10, VERDICT r9 #8) replaces the hard-EM
    E-step with Kudo 2018's forward-backward EXPECTED piece counts
    (:func:`_expected_piece_counts`, float nats driver-side, words
    visited in sorted order so float accumulation is deterministic),
    quantized back to integer counts (round-half-up, floor 1) before
    the M-step so scores stay integer micro-nats and the prune /
    scoring / encoding machinery is untouched — the distributed path
    never changes, and the Viterbi-optimality property gate holds for
    either trainer's scores."""
    marked = {WB + w: c for w, c in word_counts.items() if w}

    # ---- seed: occurrence-weighted substring counts
    sub_counts: dict[str, int] = {}
    for w, c in marked.items():
        for p in _pieces_of(w, max_piece_len):
            sub_counts[p] = sub_counts.get(p, 0) + c
    chars = {p for p in sub_counts if len(p) == 1}
    multi = sorted(
        ((c, p) for p, c in sub_counts.items() if len(p) > 1),
        key=lambda t: (-t[0], t[1]),
    )
    keep = {p for _, p in multi[: max(0, seed_size - len(chars))]} | chars
    counts = {p: sub_counts[p] for p in keep}

    # ---- hard-EM + prune rounds
    for _ in range(em_rounds):
        total = sum(counts.values())
        scores = {
            p: _micro_ln(c) - _micro_ln(total) for p, c in counts.items()
        }
        new: dict[str, int] = {}
        if full_em:
            fscores = {p: s / MICRO for p, s in scores.items()}
            newf: dict[str, float] = {}
            for w, c in sorted(marked.items()):
                for p, e in _expected_piece_counts(
                    w, fscores, max_piece_len
                ).items():
                    newf[p] = newf.get(p, 0.0) + c * e
            new = {
                p: max(1, int(math.floor(v + 0.5)))
                for p, v in newf.items()
            }
        else:
            for w, c in marked.items():
                seg = _viterbi(w, scores, max_piece_len)
                if seg is None:  # unreachable: chars always kept
                    continue
                for p in seg:
                    new[p] = new.get(p, 0) + c
        # chars must survive with at least a floor count for coverage
        for ch in chars:
            new.setdefault(ch, 1)
        # prune: drop lowest-count multi-char pieces
        target = max(
            vocab_size, int(len(new) * shrink_per_round)
        )
        multi_now = sorted(
            ((c, p) for p, c in new.items() if len(p) > 1),
            key=lambda t: (-t[0], t[1]),
        )
        kept = {p for _, p in multi_now[: max(0, target - len(chars))]}
        counts = {
            p: c for p, c in new.items() if len(p) == 1 or p in kept
        }

    # final prune to vocab_size and final scores
    multi_now = sorted(
        ((c, p) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[0], t[1]),
    )
    kept = {p for _, p in multi_now[: max(0, vocab_size - len(chars))]}
    counts = {p: c for p, c in counts.items() if len(p) == 1 or p in kept}
    total = sum(counts.values())
    return {p: _micro_ln(c) - _micro_ln(total) for p, c in counts.items()}


def build_unigram_vocab(scores: dict[str, int]) -> dict[str, int]:
    """Deterministic piece -> id table: UNK is id 0, then pieces by
    (-score, piece) — the best pieces get the smallest ids."""
    ordered = sorted(scores.items(), key=lambda t: (-t[1], t[0]))
    vocab = {UNK: 0}
    for p, _ in ordered:
        vocab[p] = len(vocab)
    return vocab


def train_unigram_from_corpus(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_piece_len: int = 4,
    em_rounds: int = 2,
    top_words: int = 1 << 16,
    full_em: bool = False,
) -> tuple[dict[str, int], dict[str, int]]:
    """One corpus scan -> bounded word table -> driver-side training.
    Returns ``(scores, vocab)``."""
    wf = (
        word_frequencies(df, text_col)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(top_words)
    )
    # bounded control collect: <= top_words (word, count) rows
    word_counts = {r["word"]: r["count"] for r in wf.collect()}
    scores = train_unigram(
        word_counts,
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        em_rounds=em_rounds,
        full_em=full_em,
    )
    return scores, build_unigram_vocab(scores)


def unigram_encode_ids(
    df: DataFrame,
    scores: dict[str, int],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
    repartition: int | None = None,
) -> DataFrame:
    """Row-local Viterbi encoding to token-id sequences — the unigram
    twin of ``bpe_encode_ids``, same output surface ``(id, token_ids
    array<int>, n_tokens, n_unk)`` so it feeds the same packing /
    FIM / span-corruption tail.  Characters outside the training
    charset make a word partially unsegmentable: its unreachable
    characters map to UNK one by one (SentencePiece's byte-fallback
    seam, documented, not implemented).  Broadcast model, Arrow
    batches, zero shuffle (``repartition`` dial as in BPE)."""
    if repartition:
        df = df.repartition(repartition)
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    b_scores = spark.sparkContext.broadcast(dict(scores))
    b_vocab = spark.sparkContext.broadcast(dict(vocab))
    out_schema = StructType(
        [
            StructField("token_ids", ArrayType(IntegerType())),
            StructField("n_tokens", IntegerType()),
            StructField("n_unk", IntegerType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def enc(texts: pd.Series) -> pd.DataFrame:
        sc = b_scores.value
        voc = b_vocab.value
        unk = voc[UNK]
        cache: dict[str, list[int]] = {}
        rows = []
        for t in texts:
            # ADVICE r9: a pandas null must not become the literal
            # word 'None' via str() — treat it as an empty doc.
            if t is None or (isinstance(t, float) and pd.isna(t)):
                t = ""
            ids: list[int] = []
            for w in _py_words(str(t)):
                got = cache.get(w)
                if got is None:
                    got = _encode_word_ids(
                        WB + w, sc, voc, unk, max_piece_len
                    )
                    cache[w] = got
                ids.extend(got)
            rows.append((ids, len(ids), sum(1 for i in ids if i == unk)))
        return pd.DataFrame(rows, columns=["token_ids", "n_tokens", "n_unk"])

    # Non-deterministic marking (guide §4.4, ADVICE r12): the declared
    # twin of bpe_encode_ids feeds the same packing tail, so the same
    # filter-pushdown bug applies — a downstream filter on token_ids
    # would duplicate the ArrowEvalPython node and Viterbi-encode every
    # doc twice.  The function is pure; the marking only stops the
    # optimizer re-evaluating it.  Trade-off: predicates (even on
    # deterministic columns like the doc id) no longer push below this
    # projection — filter the INPUT DataFrame, not the encoded output.
    enc_once = enc.asNondeterministic()

    return df.select(
        F.col(id_col), enc_once(F.col(text_col)).alias("u")
    ).select(id_col, "u.*")


def _encode_word_ids(
    marked: str,
    scores: dict[str, int],
    vocab: dict[str, int],
    unk: int,
    max_piece_len: int,
) -> list[int]:
    seg = _viterbi(marked, scores, max_piece_len)
    if seg is not None:
        return [vocab[p] for p in seg]
    # unknown character(s): segment the known runs, UNK the rest —
    # per character, deterministic
    out: list[int] = []
    run = ""
    for ch in marked:
        if ch in scores:
            run += ch
        else:
            if run:
                out.extend(
                    vocab[p] for p in _viterbi(run, scores, max_piece_len)
                )
                run = ""
            out.append(unk)
    if run:
        out.extend(vocab[p] for p in _viterbi(run, scores, max_piece_len))
    return out


def unigram_decode_pieces(pieces: list[str]) -> str:
    """Exact decode: concatenate and split on the boundary marker."""
    return "".join(pieces).replace(WB, " ").strip()
