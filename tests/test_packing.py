"""pack_token_sequences: the tokenize->pack junction — budget
invariant, concatenation identity, spill-across-cuts golden case."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.chunking import (
    pack_token_sequences,
)


def _encoded(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, token_ids array<int>"
    )


def test_pack_golden_spill(spark):
    """3 docs of 5/4/3 ids, budget 4: 12 ids total, and every shard's
    stream cuts into full sequences plus at most one partial tail —
    per-shard budget/density invariants on the real md5 sharding."""
    df = _encoded(
        spark,
        [
            (1, [0, 1, 2, 3, 4]),
            (2, [5, 6, 7, 8]),
            (3, [9, 10, 11]),
        ],
    )
    out = pack_token_sequences(df, budget_tokens=4).collect()
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    # global: total ids preserved
    assert sum(r.n_tokens for r in out) == 12
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.seq_id)
        # seq ids are dense from 0
        assert [r.seq_id for r in rows] == list(range(len(rows)))
        # every sequence full except possibly the last
        for r in rows[:-1]:
            assert r.n_tokens == 4
        assert 1 <= rows[-1].n_tokens <= 4
        assert all(r.n_tokens == len(r.token_ids) for r in rows)


def test_pack_concatenation_identity(spark):
    """flatten(sequences in seq order) per shard == concat of the
    shard's docs' id arrays in doc_id order — no id lost, duplicated,
    or reordered, for an awkward budget."""
    rows = [(i, list(range(i * 100, i * 100 + (i % 7) + 1))) for i in range(1, 40)]
    df = _encoded(spark, rows)
    out = pack_token_sequences(df, budget_tokens=5).collect()
    got: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.seq_id)):
        got.setdefault(r.shard, []).extend(r.token_ids)
    # expected: group docs by the same md5 first-hex-digit shard
    import hashlib

    want: dict[str, list] = {}
    for doc_id, ids in sorted(rows):
        shard = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        want.setdefault(shard, []).extend(ids)
    assert got == want
    # budget invariant across every shard
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r.seq_id)
        assert all(r.n_tokens == 5 for r in rows_[:-1])
        assert 1 <= rows_[-1].n_tokens <= 5


def test_pack_empty_docs_and_partition_invariance(spark):
    rows = [(1, [1, 2, 3]), (2, []), (3, [4, 5])]
    a = pack_token_sequences(_encoded(spark, rows).coalesce(1), budget_tokens=2)
    b = pack_token_sequences(
        _encoded(spark, rows).repartition(7), budget_tokens=2
    )
    ka = sorted((r.shard, r.seq_id, list(r.token_ids)) for r in a.collect())
    kb = sorted((r.shard, r.seq_id, list(r.token_ids)) for r in b.collect())
    assert ka == kb
    assert sum(len(t) for _, _, t in ka) == 5  # empty doc contributes 0


def test_pack_eod_sentinel(spark):
    """eod_id appends exactly one sentinel per NON-EMPTY document
    before packing: the packed stream per shard equals the docs' id
    arrays each followed by the sentinel, concatenated in doc_id
    order — and the sentinel count equals the non-empty doc count."""
    import hashlib

    rows = [(1, [10, 11, 12]), (2, []), (3, [13]), (4, [14, 15, 16, 17, 18])]
    out = pack_token_sequences(
        _encoded(spark, rows), budget_tokens=4, eod_id=999
    ).collect()
    got: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.seq_id)):
        got.setdefault(r.shard, []).extend(r.token_ids)
    want: dict[str, list] = {}
    for doc_id, ids in sorted(rows):
        if not ids:
            continue  # empty docs get no sentinel — they are dropped
        shard = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        want.setdefault(shard, []).extend(ids + [999])
    assert got == want
    assert sum(t == 999 for ids in got.values() for t in ids) == 3


def test_pack_doc_spans_tile_and_mask_boundaries(spark):
    """emit_doc_spans: spans tile every sequence exactly (pos strictly
    increasing from 0, cumulative with len, summing to n_tokens), a
    spilled doc's continuation starts a fresh (pos=0) span, and
    re-cutting each sequence by its spans reproduces the per-shard
    document piece streams — the attention-mask reset points a
    training loader derives are all correct."""
    import hashlib

    rows = [(i, list(range(i * 100, i * 100 + (i % 9) + 1))) for i in range(1, 50)]
    out = pack_token_sequences(
        _encoded(spark, rows), budget_tokens=7, emit_doc_spans=True
    ).collect()
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    # spans tile each sequence exactly
    for r in out:
        pos = 0
        for s in r.doc_spans:
            assert s.pos == pos and s.len >= 1
            pos += s.len
        assert pos == r.n_tokens
    # exact boundary characterization per shard: a global offset g
    # starts a span iff g is a document start OR a sequence cut
    # (g % budget == 0) — spans are fully determined by the doc
    # lengths, so assert set EQUALITY, not just coverage.
    B = 7
    for shard, rows_ in by_shard.items():
        rows_.sort(key=lambda r: r.seq_id)
        flat = [t for r in rows_ for t in r.token_ids]
        want_flat: list = []
        doc_starts = set()
        for doc_id, ids in sorted(rows):
            if hashlib.md5(str(doc_id).encode()).hexdigest()[0] == shard and ids:
                doc_starts.add(len(want_flat))
                want_flat.extend(ids)
        assert flat == want_flat  # concatenation identity holds with spans on
        total = len(want_flat)
        want_starts = doc_starts | {k for k in range(0, total, B)}
        span_starts = set()
        goff = 0
        for r in rows_:
            for s in r.doc_spans:
                span_starts.add(goff + s.pos)
            goff += r.n_tokens
        assert span_starts == want_starts


def test_pack_eod_and_spans_compose(spark):
    """eod_id + emit_doc_spans together: every doc's final span piece
    ends with the sentinel, so span boundaries and sentinel positions
    agree — the two boundary mechanisms are consistent."""
    rows = [(i, list(range(i * 10, i * 10 + (i % 5) + 1))) for i in range(1, 30)]
    out = pack_token_sequences(
        _encoded(spark, rows), budget_tokens=6, eod_id=777, emit_doc_spans=True
    ).collect()
    # reconstruct per-shard streams; every 777 must terminate a span
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r.seq_id)
        for r in rows_:
            span_ends = {s.pos + s.len - 1 for s in r.doc_spans}
            for i, t in enumerate(r.token_ids):
                if t == 777:
                    assert i in span_ends


def test_pack_shard_chars_widens_without_breaking_invariants(spark):
    """shard_chars=2 (256 shards) must preserve the concatenation
    identity against its own shard keys and the budget invariant."""
    import hashlib

    rows = [(i, list(range(i * 10, i * 10 + (i % 5) + 1))) for i in range(1, 60)]
    out = pack_token_sequences(
        _encoded(spark, rows), budget_tokens=4, shard_chars=2
    ).collect()
    got: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.seq_id)):
        got.setdefault(r.shard, []).extend(r.token_ids)
    want: dict[str, list] = {}
    for doc_id, ids in sorted(rows):
        shard = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        want.setdefault(shard, []).extend(ids)
    assert got == want
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r.seq_id)
        assert all(r.n_tokens == 4 for r in rows_[:-1])
        assert 1 <= rows_[-1].n_tokens <= 4


def test_training_set_v3_capstone_invariants(spark):
    """The select->FIM->pack chain at smoke scale: budget invariant
    per shard, balanced FIM sentinels, one EOD per packed document."""
    from aws_cdk_pipelines_datalake_etl_spark.plans import registry as R

    reg = R.build_registry()
    rows = reg["corpus_training_set_v3"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_shard: dict[str, list] = {}
    ids_all: list[int] = []
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
        ids_all.extend(int(x) for x in r["ids_joined"].split(" "))
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["seq_id"])
        for r in shard_rows[:-1]:
            assert r["n_tokens"] == 32
        assert 1 <= shard_rows[-1]["n_tokens"] <= 32
    # FIM sentinels balance; EOD count == packed docs == span count
    pre, suf, mid = (ids_all.count(x) for x in (1001, 1002, 1003))
    assert pre == suf == mid > 0
    n_eod = ids_all.count(1000)
    n_span_pieces = sum(
        len(r["spans_joined"].split(" ")) for r in rows if r["spans_joined"]
    )
    assert n_eod > 0 and n_span_pieces >= n_eod


def test_packing_efficiency_report(spark):
    """packing_efficiency (round 10): per-shard report consistent with
    the packed frame — token conservation, pad complement, integer
    micro-ratios, doc-piece counts from the spans."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.chunking import (
        pack_token_sequences,
        packing_efficiency,
    )

    rows = [(i, list(range(i % 7 + 1))) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    B = 8
    packed = pack_token_sequences(
        df, budget_tokens=B, eod_id=99, emit_doc_spans=True
    )
    pk = packed.collect()
    rep = {r.shard: r for r in packing_efficiency(packed, budget_tokens=B).collect()}
    by_shard: dict[str, list] = {}
    for r in pk:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(rep) == set(by_shard)
    for sh, rs in by_shard.items():
        g = rep[sh]
        assert g.n_seqs == len(rs)
        assert g.n_tokens == sum(r.n_tokens for r in rs)
        assert g.n_full_seqs == sum(1 for r in rs if r.n_tokens == B)
        assert g.n_pad == g.n_seqs * B - g.n_tokens
        assert g.fill_ratio_micro == g.n_tokens * 1_000_000 // (g.n_seqs * B)
        assert g.n_doc_pieces == sum(len(r.doc_spans) for r in rs)
        assert g.pieces_per_seq_micro == g.n_doc_pieces * 1_000_000 // g.n_seqs
