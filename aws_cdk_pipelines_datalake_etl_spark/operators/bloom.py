"""Broadcast Bloom-filter prefilter for cross-run (incremental) dedup.

:func:`~.dedup.incremental_fingerprint_dedup` anti-joins the ingest
batch against the corpus fingerprint column — correct, but the anti
join still shuffles every corpus fingerprint on every run.  At 100 TB
the corpus fingerprint column is itself tens of billions of rows; the
run-over-run cost should be O(batch), not O(corpus).

A Bloom filter fixes that: one offline pass builds a compact bitmap
(``m_bits`` bits as ``m_bits/64`` packed longs — a few MB for billions
of keys at ~10 bits/key), which is then BROADCAST to every executor.
The per-run probe is a broadcast hash join against the bitmap words —
zero shuffle of the corpus.  Bloom filters have no false negatives, so
a batch key that misses ANY of its ``k`` probe bits is *definitely*
new and skips the exact join entirely; only the (few) bloom-positive
keys fall through to the exact fingerprint anti-join, whose left side
is now tiny.  The composed operator is therefore EXACT — the bitmap
only routes rows, false positives are caught by the verification join
— and the oracle is the plain anti-join.

Everything is pure Catalyst (xxhash64 probes, shiftleft/bit_or packing,
broadcast join): no Python UDFs, no driver-side bitmap materialization.

Sizing: false-positive rate ~= (1 - e^(-k*n/m))^k; the default
``m_bits=2^20, k=5`` gives <1% FPP up to ~10^5 corpus keys.  At real
scale pick m ~= 10 bits per corpus key (1 GB of bitmap per ~800M keys;
partition the key space and build one bitmap per shard if that exceeds
the broadcast budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_cdk_pipelines_datalake_etl_spark.operators.dedup import (
    exact_dedup,
    fingerprint,
)


def _probe_positions(key_col: str, m_bits: int, k: int):
    """k independent bit positions for a key: pmod(xxhash64(key, seed), m)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(m_bits))
            for seed in range(k)
        ]
    )


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the packed bitmap relation ``(word_idx: long, bits: long)``.

    One pass over the key column: explode each key's ``k`` probe
    positions, group by 64-bit word, OR the one-hot words together.
    Output is at most ``m_bits / 64`` rows (16k rows for the default
    2^20 bits) regardless of corpus size — small enough to broadcast,
    cheap enough to persist next to the corpus and rebuild only on
    compaction.  ``bit_or`` is idempotent, so duplicate keys need no
    distinct pass."""
    return (
        keys.select(F.explode(_probe_positions(key_col, m_bits, k)).alias("pos"))
        .select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "one_hot"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(one_hot)").alias("bits"))
    )


def bloom_maybe_contains(
    probes: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Tag each distinct probe key with ``maybe_in_set`` (boolean).

    The probe explodes each key's ``k`` positions and broadcast-joins
    the bitmap words: a key is ``maybe_in_set`` only if ALL k bits are
    set (missing word rows count as unset).  False → the key is
    certainly absent (Bloom filters never false-negative)."""
    hits = (
        probes.select(
            key_col, F.explode(_probe_positions(key_col, m_bits, k)).alias("pos")
        )
        .withColumn("word_idx", F.shiftright(F.col("pos"), 6))
        .join(F.broadcast(bitmap), "word_idx", "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr("(shiftright(bits, CAST(pos % 64 AS INT)) & 1) = 1"),
                F.lit(False),
            ),
        )
    )
    return hits.groupBy(key_col).agg(F.expr("bool_and(hit)").alias("maybe_in_set"))


def bloom_prefilter_anti_join(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Incremental fingerprint dedup with a Bloom prefilter — exact
    same relation as :func:`~.dedup.incremental_fingerprint_dedup`
    (``fp, doc_id, n_copies``; first-seen-wins, min-id representative)
    but the corpus is touched only through (a) its broadcast bitmap and
    (b) an exact anti-join whose LEFT side is just the bloom-positive
    keys.  When batch∩corpus is small — the common ingest case — the
    anti-join input is a sliver of the batch and the corpus fingerprint
    shuffle can be pruned to the probed keys.

    In a real deployment ``bloom_bitmap`` is persisted and maintained
    incrementally (OR-ing each published batch's bitmap in); here it is
    rebuilt per call so the operator is self-contained."""
    survivors = exact_dedup(
        fingerprint(batch, text_col).select(id_col, "fp"), ["fp"], id_col
    )
    corpus_fps = fingerprint(corpus, text_col).select("fp")
    bitmap = bloom_bitmap(corpus_fps, "fp", m_bits, k)

    tagged = survivors.join(
        bloom_maybe_contains(survivors.select("fp"), bitmap, "fp", m_bits, k), "fp"
    )
    definite_new = tagged.filter(~F.col("maybe_in_set")).drop("maybe_in_set")
    verified_new = (
        tagged.filter(F.col("maybe_in_set"))
        .drop("maybe_in_set")
        .join(corpus_fps.distinct(), "fp", "left_anti")
    )
    return definite_new.unionByName(verified_new)
