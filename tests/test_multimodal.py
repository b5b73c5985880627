from __future__ import annotations

import hashlib

import pytest

from aws_cdk_pipelines_datalake_etl_spark.operators.multimodal import (
    attach_binary_column,
    decode_image_batch,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "abc"), (2, "defgh")], ["doc_id", "payload"]
    )


def test_attach_binary_column_metadata(spark, docs):
    out = attach_binary_column(docs, "payload", "image/png").collect()
    by_id = {r.doc_id: r for r in out}
    assert bytes(by_id[1].blob) == b"abc"
    assert by_id[1].blob_meta.media_type == "image/png"
    assert by_id[1].blob_meta.byte_len == 3
    assert by_id[1].blob_meta.sha == hashlib.sha256(b"abc").hexdigest()
    assert by_id[2].blob_meta.byte_len == 5


def test_decode_with_fake_decoder(spark, docs):
    def fake(payload: bytes) -> dict:
        return {
            "width": len(payload),
            "height": 2,
            "n_channels": 3,
            "mean_luma": str(sum(payload) % 256),
        }

    wrapped = attach_binary_column(docs, "payload", "image/png")
    feats = {r.doc_id: r for r in decode_image_batch(wrapped, decoder=fake).collect()}
    assert feats[1].width == 3
    assert feats[2].width == 5
    assert feats[1].n_channels == 3


def test_resize_binary_roundtrip(spark, docs):
    """Binary in → binary out through Arrow, with the target dims
    stamped alongside."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.multimodal import (
        resize_image_batch,
    )

    def fake_resize(payload: bytes, w: int, h: int) -> bytes:
        return payload[: w * h]  # deterministic truncation stand-in

    wrapped = attach_binary_column(docs, "payload", "image/png")
    out = {
        r.doc_id: r
        for r in resize_image_batch(wrapped, 2, 2, resizer=fake_resize).collect()
    }
    assert bytes(out[1].blob) == b"abc"[:4]
    assert bytes(out[2].blob) == b"defgh"[:4]
    assert out[1].width == 2 and out[1].height == 2


def test_frame_sample_fans_out(spark, docs):
    """One input row yields a row per sampled frame (1→N inside the
    Arrow batch, no shuffle)."""
    from aws_cdk_pipelines_datalake_etl_spark.operators.multimodal import (
        sample_video_frames,
    )

    def fake_sampler(payload: bytes, every_nth: int) -> list[bytes]:
        return [payload[i : i + 1] for i in range(0, len(payload), every_nth)]

    wrapped = attach_binary_column(docs, "payload", "video/mp4")
    rows = sample_video_frames(wrapped, every_nth=2, sampler=fake_sampler).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, bytes(r.frame)))
    assert sorted(by_doc[1]) == [(0, b"a"), (1, b"c")]
    assert sorted(by_doc[2]) == [(0, b"d"), (1, b"f"), (2, b"h")]


def test_resize_and_sampler_stubs_raise(spark, docs):
    from aws_cdk_pipelines_datalake_etl_spark.operators.multimodal import (
        resize_image_batch,
        sample_video_frames,
    )

    wrapped = attach_binary_column(docs, "payload", "image/png")
    for op in (
        lambda: resize_image_batch(wrapped, 2, 2).collect(),
        lambda: sample_video_frames(wrapped).collect(),
    ):
        with pytest.raises(Exception) as ei:
            op()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )


def test_default_decoder_is_stubbed(spark, docs):
    wrapped = attach_binary_column(docs, "payload", "image/png")
    with pytest.raises(Exception) as ei:
        decode_image_batch(wrapped).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_blob_to_embedding_to_search_pipeline(spark):
    """The full multimodal bridge: binary payloads -> deterministic
    fake embeddings (mapInPandas) -> brute-force cosine search finds
    each blob's own embedding as its nearest neighbor."""
    import hashlib

    from aws_cdk_pipelines_datalake_etl_spark.operators.multimodal import (
        extract_embedding_batch,
    )
    from aws_cdk_pipelines_datalake_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    def fake_extractor(payload: bytes) -> list:
        # deterministic 8-dim vector from the payload hash
        h = hashlib.md5(payload).digest()
        return [float(b) / 255.0 for b in h[:8]]

    blobs = spark.createDataFrame(
        [(i, f"media-{i}".encode()) for i in range(20)], ["doc_id", "blob"]
    )
    emb = extract_embedding_batch(blobs, extractor=fake_extractor)
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    # query ids offset: brute_force_topk excludes self-id matches,
    # and we want each query to find its own blob's embedding
    queries = emb.filter("doc_id < 3").select(
        (emb.doc_id + 1000).alias("vec_id"), "embedding"
    )
    corpus = emb.select(emb.doc_id.alias("vec_id"), "embedding")
    top = brute_force_topk(corpus, queries, k=1).collect()
    assert {(r.query_id, r.neighbor_id) for r in top} == {
        (1000, 0), (1001, 1), (1002, 2)
    }
    assert all(r.cosine == 1.0 for r in top)


def test_extract_embedding_default_raises(spark):
    from aws_cdk_pipelines_datalake_etl_spark.operators.multimodal import (
        extract_embedding_batch,
    )

    blobs = spark.createDataFrame([(1, b"x")], ["doc_id", "blob"])
    try:
        extract_embedding_batch(blobs).collect()
        raise AssertionError("expected NotImplementedError via Spark task")
    except Exception as exc:  # Py4J wraps the worker exception
        assert "NotImplementedError" in str(exc) or "no feature extractor" in str(exc)
