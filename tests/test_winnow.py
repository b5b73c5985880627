"""Winnowing fingerprints (operators/winnow.py): selection rule,
coverage guarantee, and overlap detection.

The load-bearing property (Schleimer et al. 2003): for window w over
k-gram hashes, any two documents sharing a run of >= w + k - 1
consecutive tokens share at least one selected fingerprint.
"""

from __future__ import annotations

import hashlib

import pytest

from aws_cdk_pipelines_datalake_etl_spark.operators import winnow as wn


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _py_winnow(text: str, k: int = 3, w: int = 4) -> set[tuple[int, int]]:
    """Reference implementation: per-window min, rightmost tie-break."""
    toks = text.lower().split(" ")
    hs = [_h48(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    if not hs:
        return set()
    out = set()
    for i in range(max(1, len(hs) - w + 1)):
        win = hs[i : i + w]
        m = min(win)
        pos = max(j for j in range(i, min(i + w, len(hs))) if hs[j] == m)
        out.add((pos + 1, m))  # 1-based position
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "a completely different sentence with no shared runs at all here"),
    # doc 3 shares a >= w+k-1 = 6-token run with doc 1
    (3, "something else then the quick brown fox jumps over a cliff edge"),
    (4, "tiny doc"),  # < k tokens -> no fingerprints
    (5, "exactly three tokens"),  # == k tokens -> single k-gram
]


@pytest.fixture(scope="module")
def fps(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return wn.winnow_fingerprints(df).collect()


def test_matches_reference_implementation(fps):
    got: dict[int, set] = {}
    for r in fps:
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {i: _py_winnow(t) for i, t in DOCS if _py_winnow(t)}
    assert got == want


def test_short_doc_edge_cases(fps):
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc  # < k tokens: nothing
    assert len(by_doc[5]) == 1  # single k-gram: one fingerprint at pos 1
    assert by_doc[5][0].pos == 1


def test_coverage_guarantee_shared_run(spark):
    """Docs 1 and 3 share a 6-token run (w + k - 1 = 6) — winnowing
    must select at least one common fingerprint hash."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = wn.winnow_fingerprints(df).collect()
    f1 = {r.fp for r in rows if r.doc_id == 1}
    f3 = {r.fp for r in rows if r.doc_id == 3}
    assert f1 & f3


def test_overlap_pairs_detects_only_true_overlap(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    pairs = {
        (r.id1, r.id2): r.n_shared
        for r in wn.winnow_overlap_pairs(df, min_shared=1).collect()
    }
    assert (1, 3) in pairs
    assert all(p == (1, 3) for p in pairs), pairs


def test_fingerprint_count_is_sublinear(spark):
    """Winnowing with w=4 should keep far fewer rows than the full
    k-gram set (expected density 2/(w+1))."""
    text = " ".join(f"tok{i % 97}" for i in range(400))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    n_kgrams = 400 - 2
    n_fp = wn.winnow_fingerprints(df).count()
    assert n_fp < 0.6 * n_kgrams


def test_max_df_cap_drops_only_hot_fingerprints(spark):
    boiler = "shared footer text appears in every single document here"
    docs = [(i, f"unique{i}a unique{i}b unique{i}c unique{i}d " + boiler) for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    uncapped = wn.winnow_overlap_pairs(df, min_shared=1).count()
    assert uncapped == 15  # all 6 docs pair via the shared footer
    # cap at df=1: every shared fingerprint is dropped, no pairs remain
    # (window selection near the unique-prefix boundary differs per doc,
    # so some footer fps have df < 6 — only df=1 guarantees emptiness)
    assert wn.winnow_overlap_pairs(df, min_shared=1, max_df=1).count() == 0
    # a generous ceiling changes nothing
    assert wn.winnow_overlap_pairs(df, min_shared=1, max_df=100).count() == 15
