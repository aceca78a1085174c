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


def test_frame_sample_windows(spark):
    import hashlib

    from netflix_data_ingestion_spark.operators.multimodal import (
        attach_binary_payload,
        frame_sample_stub,
    )

    rows = [
        (1, "x" * 100),         # < 256 bytes -> exactly 1 frame, len 100
        (2, "y" * 600),         # 2 full frames (600//256 = 2)
        (3, "z" * 5000),        # capped at 8 frames
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = attach_binary_payload(df, "doc_id", "text", "video")
    out = frame_sample_stub(media).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0]["frame_len"] == 100
    assert len(by_id[2]) == 2
    assert [r["frame_offset"] for r in sorted(by_id[2], key=lambda r: r["frame_idx"])] == [0, 256]
    assert len(by_id[3]) == 8
    expected = hashlib.md5(b"x" * 100).hexdigest()
    assert by_id[1][0]["frame_md5"] == expected


def test_resize_stub_shrinks_payload(spark):
    from netflix_data_ingestion_spark.operators.multimodal import (
        attach_binary_payload,
        resize_stub,
    )

    df = spark.createDataFrame([(1, "a" * 1000)], "doc_id long, text string")
    media = attach_binary_payload(df, "doc_id", "text", "image")
    row = resize_stub(media, max_width=100, max_height=100).collect()[0]
    assert row["out_width"] <= 100 and row["out_height"] <= 100
    assert row["n_bytes"] < 1000 and row["n_bytes"] == len(row["payload"])


def test_stubs_refuse_real_decode(spark):
    import pytest as _pytest

    from netflix_data_ingestion_spark.operators.multimodal import (
        attach_binary_payload,
        frame_sample_stub,
        resize_stub,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    media = attach_binary_payload(df, "doc_id", "text", "video")
    with _pytest.raises(NotImplementedError):
        frame_sample_stub(media, real_decode=True)
    with _pytest.raises(NotImplementedError):
        resize_stub(media, real_decode=True)


def test_phash_pairs_exact_payload_dups_at_hamming_zero(spark):
    from netflix_data_ingestion_spark.operators.multimodal import (
        attach_binary_payload,
        phash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "same bytes"), (2, "same bytes"), (3, "different bytes"),
         (4, "same bytes")],
        "doc_id long, text string",
    )
    media = attach_binary_payload(docs, "doc_id", "text", "image")
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(media).collect()
    }
    assert out == {(1, 2): 0, (1, 4): 0, (2, 4): 0}


def test_phash_hamming_one_fingerprint_pairs(spark):
    """The JOIN itself (not the stub) must pair fingerprints within the
    Hamming budget: feed hand-built 64-bit hashes through the shared
    block join."""
    from netflix_data_ingestion_spark.operators.dedup import (
        hamming_pairs_64,
    )

    fps = spark.createDataFrame(
        [(1, "0000000000000000"), (2, "0000000000000001"),  # 1 bit apart
         (3, "000000000000000f"),                            # 4 bits from 1
         (4, "ffffffffffffffff")],
        "media_id long, phash64 string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs_64(fps, "media_id", "phash64", 3).collect()
    }
    assert out[(1, 2)] == 1 and out[(2, 3)] == 3
    assert (1, 3) not in out  # hamming 4 > budget
    assert all(4 not in p for p in out)
