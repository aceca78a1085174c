"""Multimodal binary-column plumbing (decode is stubbed by design)."""

from __future__ import annotations

import hashlib

import pytest

from netflix_data_ingestion_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, None)],
        "doc_id int, text string",
    )
    return multimodal.attach_binary_payload(docs, "doc_id", "text", "image")


def test_metadata_columns(media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert rows[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert rows[1]["media_type"] == "image"
    assert bytes(rows[1]["payload"]) == b"hello world"
    assert rows[3]["payload"] is None


def test_decode_stub_batches(media):
    feats = {
        r["media_id"]: r
        for r in multimodal.decode_stub_features(media).collect()
    }
    assert feats[1]["n_bytes"] == 11
    assert feats[1]["fake_width"] == 12  # 11 % 1920 + 1
    assert feats[1]["fake_height"] == 12
    assert abs(feats[1]["feature_norm"] - 11**0.5) < 1e-9
    assert feats[3]["n_bytes"] == 0


def test_real_decode_is_gated(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub_features(media, real_decode=True)
