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


def test_default_decoder_is_stubbed(spark, docs):
    wrapped = attach_binary_column(docs, "payload", "image/png")
    with pytest.raises(Exception) as ei:
        decode_image_batch(wrapped).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
