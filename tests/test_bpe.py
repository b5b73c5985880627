"""BPE tokenizer: golden hand example (Sennrich et al. 2016), merge
priority, encode/decode identity, partition-layout invariance, and the
Spark encode path's plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.bpe import (
    EOW,
    bpe_decode_tokens,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_merges,
    word_frequencies,
)


def test_sennrich_hand_example():
    """The dictionary from the BPE paper (§3.2, adapted to our
    trailing-EOW convention): {'low':5, 'lower':2, 'newest':6,
    'widest':3}.  Highest pair is ('e','s') with 9 (newest+widest),
    then ('es','t') 9, then ('est', EOW) 9, then ('l','o') 7 ..."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wc, n_merges=5)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")
    # 5th: 'lo'+'w' occurs in low(5)+lower(2) = 7
    assert merges[4] == ("lo", "w")
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert encode_word("lowest", ranks) == ["low", "est" + EOW]
    # unseen word: merges still apply where possible
    assert encode_word("west", ranks) == ["w", "est" + EOW]


def test_merge_ties_break_lexicographically():
    # 'aa' and 'bb' pairs both occur twice; ('a','a') must win the tie
    wc = [("aa", 2), ("bb", 2)]
    merges = train_bpe_merges(wc, n_merges=1)
    assert merges == [("a", "a")]


def test_merge_stops_when_no_pair_repeats():
    wc = [("abc", 1), ("xyz", 1)]
    assert train_bpe_merges(wc, n_merges=10) == []


def test_nonoverlapping_merge_semantics():
    """'aaa' with merge ('a','a'): left-to-right single pass gives
    ['aa','a'], never ['a','aa'] — and 'tthh' must NOT chain-merge the
    t..h that become string-adjacent after the first merge."""
    wc = [("aaaa", 3)]
    merges = train_bpe_merges(wc, n_merges=1)
    assert merges == [("a", "a")]
    ranks = {("a", "a"): 0}
    got = encode_word("aaa", ranks)
    # chars: a a a EOW -> merge (a,a) left-to-right once: [aa, a, EOW]
    assert got == ["aa", "a", EOW]
    got2 = encode_word("tthh", {("t", "h"): 0})
    assert got2 == ["t", "th", "h", EOW]


def test_encode_decode_identity(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the theme there then the"),
            (3, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    for _, text in docs.collect():
        toks: list[str] = []
        for w in text.lower().split():
            toks.extend(encode_word(w, ranks))
        assert bpe_decode_tokens(toks) == text.lower()


def test_training_is_partition_layout_invariant(spark):
    rows = [(i, f"doc {i % 7} repeats repeats tokens token {i % 3}") for i in range(60)]
    a = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    b = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
    assert train_bpe(a, n_merges=30) == train_bpe(b, n_merges=30)


def test_spark_encode_matches_local_and_plan(spark):
    docs = spark.createDataFrame(
        [(1, "the thick thistle"), (2, "sixth thin theme"), (3, "x")],
        "doc_id long, text string",
    ).repartition(3)
    merges = train_bpe(docs, n_merges=20)
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, text in [(1, "the thick thistle"), (2, "sixth thin theme"), (3, "x")]:
        toks: list[str] = []
        for w in text.lower().split():
            toks.extend(encode_word(w, ranks))
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_words == len(text.split())
        assert r.tokens_preview == " ".join(toks[:12])
        assert r.n_single_char_tokens == sum(
            1 for s in toks if len(s.replace(EOW, "")) <= 1
        )
    # plan: Arrow-batched, no shuffle ADDED by the encoder (the input
    # df above carries its own repartition, so assert on a fresh one),
    # no row-at-a-time python
    fresh = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = bpe_encode(fresh, merges)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_word_frequencies_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    wf = {r.word: r["count"] for r in word_frequencies(docs, min_count=2).collect()}
    assert wf == {"a": 3, "b": 2}


def test_single_char_and_empty_words():
    ranks: dict = {}
    assert encode_word("a", ranks) == ["a", EOW]
    assert bpe_decode_tokens(["a", EOW]) == "a"
    assert bpe_decode_tokens([]) == ""


def test_train_encode_tokenization_unified(spark):
    """ADVICE r7: training (JVM ws_tokens) and encoding (_py_words)
    must tokenize IDENTICALLY on newlines, tabs, and runs of spaces —
    'a\\nb' is two words on both sides, space runs emit no empty
    words, and no junk vocab rows appear."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.bpe import _py_words

    texts = [
        "alpha\nbeta  gamma\tdelta",
        "  leading and   trailing  \n",
        "one\r\ntwo\fthree\x0bfour",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    jvm_words = sorted(
        r.word for r in word_frequencies(docs).select("word").collect()
    )
    py_words = sorted({w for t in texts for w in _py_words(t)})
    assert jvm_words == py_words
    assert "" not in jvm_words
    assert "alpha" in jvm_words and "beta" in jvm_words

    # end-to-end: a merge table trained on multi-line text encodes the
    # same text to tokens that decode back to the whitespace-normalized
    # form — the r7 divergence made this fail on '\n'.
    merges = train_bpe(docs, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        toks: list[str] = []
        for w in _py_words(t):
            toks.extend(encode_word(w, ranks))
        assert bpe_decode_tokens(toks) == " ".join(_py_words(t))


def test_build_vocab_layout():
    from aws_cdk_pipelines_datalake_etl_spark.operators.bpe import (
        UNK,
        build_vocab,
    )

    wc = [("low", 5), ("newest", 6)]
    merges = train_bpe_merges(wc, n_merges=3)
    vocab = build_vocab(wc, merges)
    assert vocab[UNK] == 0
    base = sorted(set("lownewst") | {EOW})
    for i, s in enumerate(base):
        assert vocab[s] == 1 + i
    # merge outputs follow in merge order
    next_id = 1 + len(base)
    for a, b in merges:
        if a + b not in base:
            assert vocab[a + b] == next_id
            next_id += 1
    # ids are dense 0..len-1
    assert sorted(vocab.values()) == list(range(len(vocab)))


def test_bpe_encode_ids_roundtrip_and_unk(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.bpe import (
        UNK,
        bpe_encode_ids,
        train_bpe_with_vocab,
    )

    train = spark.createDataFrame(
        [(1, "the thick thistle sixth"), (2, "thin theme the the")],
        "doc_id long, text string",
    )
    merges, vocab = train_bpe_with_vocab(train, n_merges=20)
    inv = {i: t for t, i in vocab.items()}
    held = spark.createDataFrame(
        [(10, "the thin\nthistle"), (11, "zebra!")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bpe_encode_ids(held, merges, vocab).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    from aws_cdk_pipelines_datalake_etl_spark.operators.bpe import _py_words

    for doc_id, text in [(10, "the thin\nthistle"), (11, "zebra!")]:
        toks: list[str] = []
        for w in _py_words(text):
            toks.extend(encode_word(w, ranks))
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        want_ids = [vocab.get(t, 0) for t in toks]
        assert list(r.token_ids) == want_ids
        assert r.n_unk == sum(1 for i in want_ids if i == 0)
        # decode through the inverted vocab: non-UNK ids reproduce tokens
        got_toks = [inv[i] for i in r.token_ids]
        assert [t for t in got_toks if t != UNK] == [
            t for t, i in zip(toks, want_ids) if i != 0
        ]
    # 'z', 'b', 'r', '!' are unseen chars -> UNK tally nonzero
    assert out[11].n_unk > 0
    assert out[10].n_unk == 0


def test_incremental_trainer_equals_per_round_rescan():
    """r12 optimization guard: the heap/inverted-index trainer must
    emit the IDENTICAL merge list as the direct per-round rescan
    (the pre-r12 implementation, inlined here as the reference)."""
    import random

    from aws_cdk_pipelines_datalake_etl_spark.operators.bpe import (
        _apply_merge,
        _pair_counts,
    )

    def reference(word_counts, n_merges):
        vocab = {}
        for w, c in word_counts:
            syms = tuple(w) + (EOW,)
            vocab[syms] = vocab.get(syms, 0) + int(c)
        merges = []
        for _ in range(n_merges):
            counts = _pair_counts(vocab)
            if not counts:
                break
            pair, top = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if top < 2:
                break
            merges.append(pair)
            vocab = {_apply_merge(s, pair): c for s, c in vocab.items()}
        return merges

    rng = random.Random(13)
    for _ in range(25):
        n = rng.randrange(1, 250)
        agg = {}
        for _ in range(n):
            w = "".join(
                rng.choice("abcdef") for _ in range(rng.randrange(1, 9))
            )
            agg[w] = agg.get(w, 0) + rng.randrange(1, 40)
        wc = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        for m in (0, 1, 7, 60):
            assert train_bpe_merges(wc, m) == reference(wc, m)
