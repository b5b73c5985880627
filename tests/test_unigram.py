"""Unigram-LM tokenizer (operators/unigram.py): hand-example pieces,
Viterbi determinism, decode identity, coverage, layout invariance,
and the zero-shuffle encode plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.unigram import (
    WB,
    _viterbi,
    build_unigram_vocab,
    train_unigram,
    train_unigram_from_corpus,
    unigram_decode_pieces,
    unigram_encode_ids,
)

WC = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 4, "wide": 2}


def test_trainer_learns_morphemes():
    """The classic Sennrich corpus: the unigram trainer must keep the
    morpheme pieces (word-initial ▁new/▁low/▁wid and the suffix est)
    and segment an UNSEEN composition with them."""
    scores = train_unigram(WC, vocab_size=40, max_piece_len=4, em_rounds=2)
    for p in ("▁new", "▁low", "est"):
        assert p in scores, p
    assert _viterbi(WB + "newest", scores, 4) == ["▁new", "est"]
    # 'lowest' never occurs in training — morpheme composition
    assert _viterbi(WB + "lowest", scores, 4) == ["▁low", "est"]


def test_viterbi_prefers_fewer_pieces_then_lexicographic():
    scores = {"a": -10, "b": -10, "ab": -20}
    # score("ab") == score("a")+score("b") == -20: tie -> fewer pieces
    assert _viterbi("ab", scores, 2) == ["ab"]
    scores2 = {"a": -10, "b": -10, "c": -10, "ab": -20, "bc": -20}
    # "abc": (ab,c) and (a,bc) tie on score AND count -> lexicographic
    assert _viterbi("abc", scores2, 2) == ["a", "bc"]


def test_decode_identity_and_coverage(spark):
    """Every training-charset word round-trips exactly, with zero UNK
    — single-char pieces are never pruned."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower newest", "widest new wide low", "newest newest"]
        )],
        "doc_id long, text string",
    )
    scores, vocab = train_unigram_from_corpus(docs, vocab_size=64)
    inv = {i: p for p, i in vocab.items()}
    out = unigram_encode_ids(docs, scores, vocab).collect()
    texts = {0: "low lower newest", 1: "widest new wide low", 2: "newest newest"}
    for r in out:
        assert r["n_unk"] == 0
        pieces = [inv[i] for i in r["token_ids"]]
        assert unigram_decode_pieces(pieces) == texts[r["doc_id"]]


def test_unknown_char_maps_to_unk(spark):
    docs = spark.createDataFrame(
        [(0, "low lower newest")], "doc_id long, text string"
    )
    scores, vocab = train_unigram_from_corpus(docs, vocab_size=64)
    held = spark.createDataFrame(
        [(1, "low qq low")], "doc_id long, text string"
    )
    r = unigram_encode_ids(held, scores, vocab).collect()[0]
    assert r["n_unk"] == 2  # the two q characters
    inv = {i: p for p, i in vocab.items()}
    pieces = [inv[i] for i in r["token_ids"]]
    assert pieces.count("<unk>") == 2


def test_training_is_layout_invariant(spark):
    rows = [
        (i, " ".join(["low", "newest", "wide", "lower"][: 1 + i % 4]))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s1, v1 = train_unigram_from_corpus(df.repartition(1), vocab_size=48)
    s7, v7 = train_unigram_from_corpus(df.repartition(7), vocab_size=48)
    assert s1 == s7 and v1 == v7


def test_encode_plan_zero_shuffle_arrow(spark):
    docs = spark.createDataFrame(
        [(0, "low lower newest")], "doc_id long, text string"
    )
    scores, vocab = train_unigram_from_corpus(docs, vocab_size=64)
    df = unigram_encode_ids(docs, scores, vocab)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_viterbi_is_optimal_by_brute_force():
    """Property: the DP segmentation attains the true maximum score
    over ALL possible segmentations (enumerated), with the documented
    tie order (fewer pieces, then lexicographic) — on every word up to
    length 8 over a 2-letter alphabet with adversarial random scores."""
    import itertools
    import random

    rng = random.Random(9)

    def all_segmentations(word, pieces, max_len):
        if not word:
            yield []
            return
        for j in range(1, min(max_len, len(word)) + 1):
            p = word[:j]
            if p in pieces:
                for rest in all_segmentations(word[j:], pieces, max_len):
                    yield [p] + rest

    for trial in range(40):
        alpha = "ab"
        max_len = 3
        pieces = {}
        for L in (1, 2, 3):
            for tup in itertools.product(alpha, repeat=L):
                p = "".join(tup)
                if L == 1 or rng.random() < 0.6:
                    pieces[p] = rng.randint(-3_000_000, -1)
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        got = _viterbi(word, pieces, max_len)
        best = max(
            all_segmentations(word, pieces, max_len),
            key=lambda seg: (
                sum(pieces[p] for p in seg),
                -len(seg),
                [-ord(c) for p in seg for c in p + "\x00"],
            ),
        )
        got_score = sum(pieces[p] for p in got)
        best_score = sum(pieces[p] for p in best)
        assert got_score == best_score, (word, got, best)
        # tie contract: same piece count, and not lexicographically
        # greater than the enumerated winner among score-ties
        ties = [
            seg
            for seg in all_segmentations(word, pieces, max_len)
            if sum(pieces[p] for p in seg) == best_score
        ]
        assert got == min(ties, key=lambda s: (len(s), s)), (word, got)


def test_encode_null_text_is_empty(spark):
    """ADVICE r9: NULL text encodes like an empty doc (no ids), not
    like the 4-char literal 'None'."""
    docs = spark.createDataFrame(
        [(0, "low lower"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    scores, vocab = train_unigram_from_corpus(
        docs.filter("text IS NOT NULL"), vocab_size=64
    )
    got = {r.doc_id: r for r in unigram_encode_ids(docs, scores, vocab).collect()}
    for i in (1, 2):
        assert got[i].token_ids == [] and got[i].n_tokens == 0
        assert got[i].n_unk == 0
    assert got[0].n_tokens > 0


def test_full_em_trainer_properties(spark):
    """full_em=True (round 10, VERDICT r9 #8 — Kudo 2018's
    forward-backward E-step): the trained table (a) keeps the
    single-character floor (full coverage), (b) emits integer
    micro-nat scores the SAME Viterbi-optimality machinery consumes
    (decode identity + zero UNK on training text), (c) is
    deterministic across runs, and (d) genuinely differs from the
    hard-EM counts path on an ambiguous corpus (expectations split
    mass across segmentations instead of winner-take-all)."""
    texts = [
        "low lower lowest slow slowly",
        "new newer newest renew renewal",
        "wide widely widen wider low new",
        "lowlow newnew widewide relow",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    scores_f, vocab_f = train_unigram_from_corpus(
        docs, vocab_size=48, full_em=True
    )
    scores_h, _ = train_unigram_from_corpus(docs, vocab_size=48)
    # (a) coverage floor: every training char survives as a piece
    chars = {c for t in texts for c in t if c != " "} | {WB}
    assert chars <= set(scores_f)
    # (b) all-int scores; encode round-trips with zero UNK
    assert all(isinstance(s, int) for s in scores_f.values())
    inv = {i: p for p, i in vocab_f.items()}
    out = unigram_encode_ids(docs, scores_f, vocab_f).collect()
    for r in out:
        assert r["n_unk"] == 0
        pieces = [inv[i] for i in r["token_ids"]]
        assert unigram_decode_pieces(pieces) == texts[r["doc_id"]]
    # (c) deterministic retrain
    scores_f2, _ = train_unigram_from_corpus(docs, vocab_size=48, full_em=True)
    assert scores_f == scores_f2
    # (d) expectations != hard counts on an ambiguous corpus
    assert scores_f != scores_h
