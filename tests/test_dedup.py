from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators import dedup as dd
from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import load_table

from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR_SMOKE, "documents").cache()


def test_minhash_lsh_equals_exact(spark, docs):
    """At the default parameters the LSH path must find exactly the
    pairs the exact n-gram path finds (miss prob ~5e-8/pair)."""
    exact = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "test data should contain planted near-duplicates"
    assert lsh == exact


def test_exact_dedup_deterministic_representative(spark):
    df = spark.createDataFrame(
        [(5, "a"), (2, "a"), (9, "b")], ["doc_id", "text"]
    )
    out = {r.text: (r.doc_id, r.n_copies) for r in
           dd.exact_dedup(df, ["text"], "doc_id").collect()}
    assert out == {"a": (2, 2), "b": (9, 1)}


def test_fingerprint_dedup_normalizes(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "completely different"),
        ],
        ["doc_id", "text"],
    )
    out = dd.fingerprint_dedup(df).collect()
    by_id = {r.doc_id: r.n_copies for r in out}
    assert by_id == {1: 2, 3: 1}  # 1 and 2 collapse; min id kept


def test_simhash_close_for_near_dups(spark, docs):
    """Near-duplicate docs (jaccard >= 0.8) should have close simhashes
    (small hamming distance), and unrelated docs should not all do."""
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.9).limit(5).collect()
    sigs = {r.id: r.simhash for r in dd.simhash_signatures(docs).collect()}

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    for p in pairs:
        assert hamming(sigs[p.id1], sigs[p.id2]) <= 6, p
    # background pairs: median hamming across a sample must be large
    ids = sorted(sigs)[:20]
    background = [hamming(sigs[ids[i]], sigs[ids[i + 1]]) for i in range(0, 18, 2)]
    assert sorted(background)[len(background) // 2] > 6


def test_shingle_guard_short_docs(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], ["doc_id", "text"])
    sh = dd.shingle_set(df).groupBy("id").agg(F.count("*").alias("n")).collect()
    by_id = {r.id: r.n for r in sh}
    assert 1 not in by_id  # < 3 tokens -> no shingles (no phantom rows)
    assert by_id[2] == 2


def test_connected_components_known_graph(spark):
    """Chain, triangle, and isolated pair must collapse to min-id
    representatives; singletons (no edges) are not emitted."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.clusters import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id1", "id2"],
    )
    out = {r.node: r.cluster_rep for r in connected_components(pairs).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= switches lineage truncation to RELIABLE
    checkpoint (survives executor loss, unlike localCheckpoint's
    executor-block storage): same fixpoint as the default path, and
    RDD checkpoint files actually land in the given directory."""
    import os

    from aws_cdk_pipelines_datalake_etl_spark.operators.clusters import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id1", "id2"],
    )
    ckpt = str(tmp_path / "cc_ckpt")
    out = {
        r.node: r.cluster_rep
        for r in connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "reliable checkpoint wrote no files"


def test_incremental_fingerprint_composes_to_full(spark, docs):
    """Corpus representatives + incremental batch survivors must cover
    every fingerprint of corpus+batch exactly once (first-seen-wins),
    i.e. incremental runs compose to the corpus-precedence recompute."""
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    inc = dd.incremental_fingerprint_dedup(batch, corpus)
    corpus_reps = dd.fingerprint_dedup(corpus)
    combined = {r.fp for r in inc.collect()} | {
        r.fp for r in corpus_reps.collect()
    }
    full_fps = {r.fp for r in dd.fingerprint(docs).select("fp").distinct().collect()}
    assert combined == full_fps
    # no overlap: a batch survivor's fp must be new
    assert not ({r.fp for r in inc.collect()} & {r.fp for r in corpus_reps.collect()})


def test_incremental_fingerprint_two_sequential_batches(spark, docs):
    """Ingesting two batches sequentially covers the same fingerprints
    as one combined recompute, with zero double-published fps."""
    b1 = docs.filter(F.col("doc_id") % 5 == 0)
    b2 = docs.filter(F.col("doc_id") % 5 == 1)
    corpus0 = docs.filter((F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 5 != 1))
    s1 = dd.incremental_fingerprint_dedup(b1, corpus0)
    corpus1 = corpus0.unionByName(b1)
    s2 = dd.incremental_fingerprint_dedup(b2, corpus1)
    fps0 = {r.fp for r in dd.fingerprint_dedup(corpus0).collect()}
    fps1 = {r.fp for r in s1.collect()}
    fps2 = {r.fp for r in s2.collect()}
    assert not (fps1 & fps0) and not (fps2 & (fps0 | fps1))
    full = {r.fp for r in dd.fingerprint(docs).select("fp").distinct().collect()}
    assert fps0 | fps1 | fps2 == full


def test_incremental_lsh_equals_full_restricted(spark, docs):
    """Incremental pairs == whole-corpus LSH pairs restricted to pairs
    touching the batch — and reusing a precomputed corpus band index
    gives the identical result."""
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    full = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.minhash_lsh_pairs(docs, threshold=0.8).collect()
        if r.id1 % 5 == 0 or r.id2 % 5 == 0
    }
    inc = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.incremental_minhash_pairs(batch, corpus, threshold=0.8).collect()
    }
    assert inc == full
    idx = dd.minhash_band_index(corpus)
    via_index = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.incremental_minhash_pairs(
            batch, corpus, corpus_bands=idx, threshold=0.8
        ).collect()
    }
    assert via_index == full


# ---------------------------------------------------------------------------
# Bloom-filter prefiltered incremental dedup (operators/bloom.py)
# ---------------------------------------------------------------------------


def test_bloom_prefilter_equals_plain_anti_join(spark, docs):
    """The bloom-routed operator is EXACT: identical relation to
    incremental_fingerprint_dedup on the same batch/corpus split."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.bloom import (
        bloom_prefilter_anti_join,
    )

    batch = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    plain = {
        (r.fp, r.doc_id, r.n_copies)
        for r in dd.incremental_fingerprint_dedup(batch, corpus).collect()
    }
    bloom = {
        (r.fp, r.doc_id, r.n_copies)
        for r in bloom_prefilter_anti_join(batch, corpus).collect()
    }
    assert plain, "batch should have surviving fingerprints"
    assert bloom == plain


def test_bloom_no_false_negatives_and_bitmap_bound(spark):
    """Every key actually in the set must probe maybe_in_set=True (no
    false negatives — the property the exactness proof rests on); the
    bitmap relation is bounded by m_bits/64 words regardless of key
    count."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.bloom import (
        bloom_bitmap,
        bloom_maybe_contains,
    )

    keys = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    m_bits = 1 << 14
    bitmap = bloom_bitmap(keys, "k", m_bits=m_bits, k=5)
    assert bitmap.count() <= m_bits // 64
    tagged = bloom_maybe_contains(keys, bitmap, "k", m_bits=m_bits, k=5)
    assert tagged.filter(~F.col("maybe_in_set")).count() == 0


def test_bloom_filters_out_most_absent_keys(spark):
    """Disjoint probe keys should be overwhelmingly bloom-negative at
    ~8 bits/key (FPP ~2%) — the prefilter actually prunes."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.bloom import (
        bloom_bitmap,
        bloom_maybe_contains,
    )

    corpus = spark.range(2000).select(
        F.concat(F.lit("in-"), F.col("id")).alias("k")
    )
    probes = spark.range(1000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("k")
    )
    bitmap = bloom_bitmap(corpus, "k", m_bits=1 << 14, k=5)
    tagged = bloom_maybe_contains(probes, bitmap, "k", m_bits=1 << 14, k=5)
    n_pos = tagged.filter(F.col("maybe_in_set")).count()
    assert n_pos < 100  # <10% false positives at these parameters


def test_bloom_probe_plan_broadcasts_bitmap_no_corpus_shuffle(spark, docs):
    """The probe side must join the bitmap via BroadcastHashJoin — the
    whole point is zero corpus shuffle at probe time."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.bloom import (
        bloom_bitmap,
        bloom_maybe_contains,
    )
    from aws_cdk_pipelines_datalake_etl_spark.plans.explain import formatted_plan

    keys = dd.fingerprint(docs).select("fp")
    plan = formatted_plan(
        bloom_maybe_contains(keys, bloom_bitmap(keys, "fp"), "fp")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_persisted_lsh_index_probe_equals_in_memory(spark, docs, tmp_path):
    """write_lsh_index + read_lsh_index_for: probing the persisted,
    bucket-partitioned index yields exactly the pairs the in-memory
    incremental path finds, and the index read partition-prunes."""
    from aws_cdk_pipelines_datalake_etl_spark.plans.explain import formatted_plan

    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    path = str(tmp_path / "lsh_idx")
    dd.write_lsh_index(corpus, path)

    batch_bands = dd.minhash_band_index(batch)
    corpus_bands = dd.read_lsh_index_for(spark, path, batch_bands)
    got = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.incremental_minhash_pairs(
            batch, corpus, corpus_bands=corpus_bands, threshold=0.8
        ).collect()
    }
    want = {
        (r.id1, r.id2, r.jaccard)
        for r in dd.incremental_minhash_pairs(
            batch, corpus, threshold=0.8
        ).collect()
    }
    assert got == want and got

    plan = formatted_plan(corpus_bands)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("bucket" in ln for ln in pf), plan


def test_bloom_empty_corpus_everything_is_new(spark):
    """Bloom prefilter against an EMPTY corpus: the bitmap has no set
    bits, every batch key is definite-new, result equals plain
    within-batch dedup."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.bloom import (
        bloom_prefilter_anti_join,
    )

    batch = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame([], "doc_id long, text string")
    got = {
        (r.doc_id, r.n_copies)
        for r in bloom_prefilter_anti_join(batch, corpus).collect()
    }
    assert got == {(1, 2), (3, 1)}


def test_simhash_pairs_pigeonhole_equals_quadratic(spark, docs):
    """Block-join candidate generation must find exactly the pairs the
    all-pairs scan finds (pigeonhole guarantee: <= t flips -> one of
    t+1 blocks agrees)."""
    sigs = {r.id: r.simhash for r in dd.simhash_signatures(docs).collect()}
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r.id1, r.id2, r.hamming)
        for r in dd.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert got == want and want


def _remove_spans_reference(rows, k):
    """Brute-force driver-side replica of remove_duplicate_spans."""
    grams = {}
    toks = {i: t.lower().split(" ") for i, t in rows}
    for i, w in toks.items():
        for p in range(len(w) - k + 1):
            grams.setdefault(" ".join(w[p : p + k]), []).append((i, p))
    dup_lo = {
        g: min(i for i, _ in occ)
        for g, occ in grams.items()
        if len({i for i, _ in occ}) >= 2
    }
    out = {}
    for i, w in toks.items():
        covered = set()
        for p in range(len(w) - k + 1):
            g = " ".join(w[p : p + k])
            if g in dup_lo and dup_lo[g] != i:
                covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(w) if j not in covered]
        out[i] = (len(w), len(covered), " ".join(kept))
    return out


def test_remove_duplicate_spans_matches_reference(spark):
    """remove_duplicate_spans == the brute-force reference on a corpus
    with shared runs, overlapping duplicated grams, self-repeats, and
    short docs — and the hash-key form equals the text-key form."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"intro words {shared} closing remark one"),
        (2, f"other beginning {shared} and a different tail"),
        (3, f"unrelated text with no big overlap at all here {shared}"),
        (4, "completely unique document content nothing shared anywhere"),
        (5, "tiny doc"),  # shorter than k: passes through
        (6, "rep rep rep rep rep rep rep rep"),  # self-repeat, single doc
    ]
    k = 3
    want = _remove_spans_reference(rows, k)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for key in ("text", "hash"):
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.text_dedup)
            for r in remove_duplicate_spans(df, k=k, key=key).collect()
        }
        assert got == want, (key, got)
    # canonical doc (min id sharing each gram) keeps the span: doc 1
    assert shared in want[1][2]
    assert shared not in want[2][2] and shared not in want[3][2]
    # single-doc self-repeats are NOT cross-doc duplicates
    assert want[6] == (8, 0, "rep rep rep rep rep rep rep rep")
    # short doc untouched
    assert want[5] == (2, 0, "tiny doc")


def test_remove_duplicate_spans_plan_no_python(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "b c d e f g")], "doc_id long, text string"
    )
    plan = (
        remove_duplicate_spans(df, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_remove_duplicate_spans_boundary_walk_property(spark):
    """Round-10 rebuild (sorted-boundary walk, VERDICT r9 #4): on a
    randomized heavily-duplicated corpus — tiny vocab, long docs, so
    covered intervals overlap, chain, and butt against each other —
    the walk's output equals the brute-force reference exactly.
    Deterministic seed; exercises the exact shapes the old
    array_contains rebuild was quadratic on."""
    import random

    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rng = random.Random(1007)
    vocab = [f"w{i}" for i in range(9)]
    rows = []
    for i in range(1, 41):
        n = rng.randint(1, 120)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    k = 4
    want = _remove_spans_reference(rows, k)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_dedup)
        for r in remove_duplicate_spans(df, k=k, key="hash").collect()
    }
    assert got == want


def test_source_overlap_matrix_semantics(spark):
    """source_overlap_matrix (round 10): hand-checkable corpus —
    mirror feed shows containment 1e6, disjoint pair emits no row,
    jaccard/containment integer micro-ratios exact."""
    rows = [
        (1, "a", "one two three four"),
        (2, "a", "five six seven eight"),
        (3, "b", "one two three four"),       # b mirrors half of a
        (4, "c", "nine ten eleven twelve"),   # disjoint from a and b
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.source_a, r.source_b): r
        for r in dd.source_overlap_matrix(df, k=3).collect()
    }
    assert set(got) == {("a", "b")}  # c shares nothing -> no row
    r = got[("a", "b")]
    # a: 4 shingles (2 per doc), b: 2 shingles, shared: 2
    assert (r.n_shared, r.n_a, r.n_b) == (2, 4, 2)
    assert r.jaccard_micro == 2 * 1_000_000 // 4
    assert r.containment_micro == 1_000_000  # b fully contained


def test_ngram_novelty_hash_equals_text_and_hand(spark):
    """ngram_novelty (round 10): hash-key and text-key forms are the
    identical relation, and a hand-checkable corpus gives the right
    ratios (first owner = min doc id; short docs NULL novelty)."""
    rows = [
        (1, "w1 w2 w3 w4 w5"),        # 3 trigram... k=3: grams at 1..3
        (2, "w1 w2 w3 w4 w5"),        # exact copy: zero novel
        (3, "w1 w2 w3 x1 x2 x3 x4"),  # shares the first gram only
        (4, "short doc"),             # < k tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = {r.doc_id: r for r in dd.ngram_novelty(df, k=3, key="text").collect()}
    h = {r.doc_id: r for r in dd.ngram_novelty(df, k=3, key="hash").collect()}
    assert {(k, v.n_grams, v.n_novel, v.novelty_micro) for k, v in t.items()} == {
        (k, v.n_grams, v.n_novel, v.novelty_micro) for k, v in h.items()
    }
    assert (t[1].n_grams, t[1].n_novel, t[1].novelty_micro) == (3, 3, 1_000_000)
    assert (t[2].n_grams, t[2].n_novel) == (3, 0)
    # doc 3: grams 'w1 w2 w3' (owned by 1), 'w2 w3 x1', 'w3 x1 x2',
    # 'x1 x2 x3', 'x2 x3 x4' -> 4 novel of 5
    assert (t[3].n_grams, t[3].n_novel) == (5, 4)
    assert t[3].novelty_micro == 4 * 1_000_000 // 5
    assert (t[4].n_grams, t[4].n_novel, t[4].novelty_micro) == (0, 0, None)


def test_quality_canonicals_keeps_longest(spark):
    """quality_canonicals (round 10): the longest cluster member wins
    (ties to smaller id); cluster_rep stays the min-id key; singleton
    docs are not emitted; exact == LSH pair source."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.clusters import (
        quality_canonicals,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),                       # cluster {1,2,3}: 3 is longest
        (2, base),
        (3, base + " tail"),
        (9, "completely unrelated content that stands alone here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dd.ngram_jaccard_pairs(df, threshold=0.8)
    quality = df.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("quality")
    )
    got = {r.doc_id: r for r in quality_canonicals(pairs, quality).collect()}
    assert set(got) == {1, 2, 3}  # 9 is a singleton: not emitted
    for i in (1, 2, 3):
        assert got[i].cluster_rep == 1
        assert got[i].canonical_id == 3
        assert got[i].keep is (i == 3)
    # tie case: equal quality -> smaller id
    q_tie = quality.withColumn("quality", F.lit(7))
    got2 = {r.doc_id: r for r in quality_canonicals(pairs, q_tie).collect()}
    assert all(r.canonical_id == 1 for r in got2.values())


def test_quality_canonicals_guards_and_coverage(spark):
    """quality_canonicals (ADVICE r10): non-numeric ids raise a clear
    TypeError (not an opaque cast failure); clustered docs with NO
    quality row still emit (LEFT join + long-MIN sentinel) and lose
    every tie against a scored member instead of silently flipping
    the canonical."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.clusters import (
        quality_canonicals,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    # doc 2 has no quality row; cluster {10,11} is entirely unscored.
    quality = spark.createDataFrame(
        [(1, 5), (3, 9)], "doc_id long, quality long"
    )
    got = {r.doc_id: r for r in quality_canonicals(pairs, quality).collect()}
    assert set(got) == {1, 2, 3, 10, 11}  # 2 emitted despite no score
    for i in (1, 2, 3):
        assert got[i].canonical_id == 3 and got[i].keep is (i == 3)
    # all-unscored cluster: sentinel ties resolve to the smaller id
    for i in (10, 11):
        assert got[i].canonical_id == 10 and got[i].keep is (i == 10)

    bad_q = spark.createDataFrame([("a", 1)], "doc_id string, quality long")
    with pytest.raises(TypeError, match="numeric"):
        quality_canonicals(pairs, bad_q)
    # ADVICE r11: a non-numeric QUALITY column must raise too — it
    # previously cast("long") to NULL -> sentinel, silently degrading
    # the argmax to min-id with no signal.
    bad_qcol = spark.createDataFrame(
        [(1, "high"), (3, "low")], "doc_id long, quality string"
    )
    with pytest.raises(TypeError, match="numeric"):
        quality_canonicals(pairs, bad_qcol)
    bad_pairs = spark.createDataFrame([("a", "b")], "id1 string, id2 string")
    with pytest.raises(TypeError, match="numeric"):
        quality_canonicals(bad_pairs, quality)


def test_source_overlap_sketch_equals_exact(spark):
    """source_overlap_matrix_sketch (round 10): in exact mode (well
    under 32k distinct shingles per source) the sketch matrix IS the
    exact matrix, row for row."""
    rows = [
        (i, f"s{i % 4}", " ".join(f"w{(i * 3 + j) % 15}" for j in range(8)))
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    exact = {
        tuple(r) for r in dd.source_overlap_matrix(df, k=3).collect()
    }
    sk = {
        tuple(r)
        for r in dd.source_overlap_matrix_sketch(df, k=3).collect()
    }
    assert exact and sk == exact


def test_block_unit_dedup_first_wins(spark):
    """block_unit_dedup (round 11): exact unit dedup keeps the
    globally-first (doc, idx) copy of each block, reassembles
    surviving blocks in original order, keeps full doc coverage."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        block_unit_dedup,
    )

    rows = [
        (1, "a b c d e f"),          # blocks (B=3): 'a b c', 'd e f'
        (2, "a b c x y z"),          # 'a b c' dups doc1 idx0
        (3, "d e f a b c"),          # both blocks dup doc1
        (4, "q r"),                  # single short block, unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in block_unit_dedup(df, block_words=3).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].n_units, got[1].n_kept) == (2, 2)
    assert got[1].text_clean == "a b c d e f"
    assert (got[2].n_units, got[2].n_kept) == (2, 1)
    assert got[2].text_clean == "x y z"
    assert (got[3].n_units, got[3].n_kept) == (2, 0)
    assert got[3].text_clean == ""
    assert (got[4].n_units, got[4].n_kept) == (1, 1)
    assert got[4].text_clean == "q r"
    # layout determinism: same outcome after a repartition
    again = {
        r.doc_id: r.text_clean
        for r in block_unit_dedup(df.repartition(7), block_words=3).collect()
    }
    assert again == {k: v.text_clean for k, v in got.items()}
    with pytest.raises(ValueError):
        block_unit_dedup(df, block_words=0)


def test_incremental_block_units_composes_to_full(spark):
    """incremental_block_unit_dedup == the full recompute over
    corpus+batch restricted to batch docs when corpus ids order
    first; the precomputed unit-index path is identical; corpus
    blocks are dropped outright (corpus precedence)."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        block_unit_dedup,
        incremental_block_unit_dedup,
    )

    rows = [
        (1, "a b c d e f"),
        (2, "g h i j k l"),
        (101, "a b c x y z"),      # first block published by doc 1
        (102, "x y z x y z"),      # self-dup within batch
        (103, "g h i"),            # fully covered by corpus doc 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.filter(F.col("doc_id") < 100)
    batch = df.filter(F.col("doc_id") >= 100)
    inc = {
        r.doc_id: r
        for r in incremental_block_unit_dedup(
            batch, corpus, block_words=3
        ).collect()
    }
    full = {
        r.doc_id: r
        for r in block_unit_dedup(df, block_words=3).collect()
        if r.doc_id >= 100
    }
    assert set(inc) == {101, 102, 103}
    for i in inc:
        assert (inc[i].n_units, inc[i].n_kept, inc[i].text_clean) == (
            full[i].n_units,
            full[i].n_kept,
            full[i].text_clean,
        ), i
    assert inc[101].text_clean == "x y z"
    assert inc[102].text_clean == ""    # both blocks lost (101 wins)
    assert inc[103].text_clean == "" and inc[103].n_units == 1
    # precomputed unit index path
    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        _block_units,
    )

    idx = _block_units(corpus, "doc_id", "text", 3).select("unit").distinct()
    via_idx = {
        r.doc_id: r.text_clean
        for r in incremental_block_unit_dedup(
            batch, corpus, block_words=3, corpus_units=idx
        ).collect()
    }
    assert via_idx == {k: v.text_clean for k, v in inc.items()}


def test_block_unit_dedup_md5_key_equals_string_key(spark):
    """VERDICT r11 #8 — the production 128-bit-key variant: grouping
    on md5(unit) with (doc, idx) winners re-sliced from the doc's own
    words column is OUTPUT-identical to the string-keyed form, on the
    hand fixture, on real sf0.001 documents, and under repartition."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        block_unit_dedup,
    )
    from tests.conftest import SF_DIR_SMOKE

    def snap(out):
        return {
            r.doc_id: (r.n_units, r.n_kept, r.text_clean)
            for r in out.collect()
        }

    rows = [
        (1, "a b c d e f"),
        (2, "a b c x y z"),
        (3, "d e f a b c"),
        (4, "q r"),
        (5, ""),                     # empty text edge
        (6, "a b c d e f"),          # full-doc duplicate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for b in (1, 3, 10):
        assert snap(block_unit_dedup(df, block_words=b, key="md5")) == snap(
            block_unit_dedup(df, block_words=b)
        ), f"mismatch at block_words={b}"
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    assert snap(block_unit_dedup(docs, key="md5")) == snap(
        block_unit_dedup(docs)
    )
    assert snap(
        block_unit_dedup(df.repartition(7), block_words=3, key="md5")
    ) == snap(block_unit_dedup(df, block_words=3))
    with pytest.raises(ValueError, match="key"):
        block_unit_dedup(df, key="sha1")


def test_minhash_band_index_matches_column_api_reference(spark):
    """r12 optimization guard: the single-SQL-expr signature/band path
    must equal the per-permutation Column-API form (the pre-r12
    implementation, inlined here as the reference) value-for-value."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "pack my box with five dozen liquor jugs today"),
            (4, "sphinx of black quartz judge my vow right now"),
        ],
        "doc_id long, text string",
    )
    num_perm, bands = 16, 4
    rows_per_band = num_perm // bands
    coeffs = dd.minhash_coefficients(num_perm)
    hmod = (F.col("h") % dd.MINHASH_PRIME).cast("long")
    mins = [
        F.min((hmod * F.lit(a) + F.lit(b)) % dd.MINHASH_PRIME).alias(f"mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = dd.shingle_hashes(docs, "doc_id", "text", 3).groupBy("id").agg(*mins)
    band_structs = ", ".join(
        "named_struct('band', {b}, 'bsig', xxhash64(concat_ws(',', {vals})))".format(
            b=b,
            vals=", ".join(
                f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    ref = (
        sig.select("id", F.explode(F.expr(f"array({band_structs})")).alias("bs"))
        .select("id", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig"))
        .orderBy("id", "band")
        .collect()
    )
    got = (
        dd.minhash_band_index(docs, num_perm=num_perm, bands=bands)
        .orderBy("id", "band")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]


def test_simhash_matches_column_api_reference(spark):
    """r12 optimization guard for the simhash single-expr bit sums."""
    from aws_cdk_pipelines_datalake_etl_spark.functions.text_fn import (
        hash48,
        tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    bits = 48
    toks = (
        docs.select(F.col("doc_id").alias("id"), F.explode(tokens("text")).alias("tok"))
        .distinct()
        .withColumn("h", hash48(F.col("tok")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    ref_sig = F.expr(
        " + ".join(
            f"CASE WHEN b{i} >= 0 THEN cast({1 << i} as bigint) ELSE 0 END"
            for i in range(bits)
        )
    )
    ref = {
        r["id"]: r["simhash"]
        for r in agg.select("id", ref_sig.alias("simhash")).collect()
    }
    got = {
        r["id"]: r["simhash"]
        for r in dd.simhash_signatures(docs).collect()
    }
    assert got == ref


def test_block_unit_dedup_plan_hash_aggregates(spark):
    """r12: the first-occurrence winner is two HASH aggregations
    (per-(unit,doc) min idx, then per-unit min doc + min_by idx) —
    the old min-struct form compiled to SortAggregate and sorted the
    whole exploded unit stream per partition."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
        block_unit_dedup,
    )
    from aws_cdk_pipelines_datalake_etl_spark.plans.explain import (
        formatted_plan,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "a b c d e f g h i j z z")],
        "doc_id long, text string",
    )
    for key in ("string", "md5"):
        plan = formatted_plan(block_unit_dedup(df, block_words=10, key=key))
        assert "SortAggregate" not in plan, key
