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


# ---------------------------------------------------------------------------
# Real decode path (pure-numpy netpbm/BMP parsers)
# ---------------------------------------------------------------------------


def _ppm_bytes(w, h, rgb):
    """P6 with a comment in the header; rgb = fn(x, y) -> (r, g, b)."""
    body = bytearray()
    for y in range(h):
        for x in range(w):
            body.extend(rgb(x, y))
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + bytes(body)


def _pgm_bytes(w, h, gray):
    body = bytes(gray(x, y) for y in range(h) for x in range(w))
    return b"P5 %d %d 255\n" % (w, h) + body


def _bmp_bytes(w, h, rgb):
    """Uncompressed 24-bit bottom-up BI_RGB."""
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = bytearray()
        for x in range(w):
            r, g, b = rgb(x, y)
            row.extend((b, g, r))  # BGR
        row.extend(b"\x00" * (stride - len(row)))
        body.extend(row)
    data_off = 54
    size = data_off + len(body)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(hdr) + bytes(body)


def _media_frame(spark, payloads):
    rows = [(i, bytearray(p), "image", len(p), "x") for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_real_decode_ppm_pgm_bmp_exact(spark):
    """Real pixel statistics: decoded dims and the exact integer mean
    luminance match a straight-line Python oracle for all 3 codecs."""
    w, h = 10, 6
    rgb = lambda x, y: ((x * 23) % 256, (y * 41) % 256, (x + y) % 256)
    gray = lambda x, y: (x * 7 + y * 13) % 256
    payloads = [_ppm_bytes(w, h, rgb), _pgm_bytes(w, h, gray), _bmp_bytes(w, h, rgb)]
    got = {
        r["media_id"]: r.asDict()
        for r in multimodal.decode_real_features(
            _media_frame(spark, payloads)
        ).collect()
    }
    # oracle: integer Rec.601 milli-luma means
    rgb_lumas = [
        rgb(x, y)[0] * 299 + rgb(x, y)[1] * 587 + rgb(x, y)[2] * 114
        for y in range(h)
        for x in range(w)
    ]
    want_rgb_mean = sum(rgb_lumas) // (w * h)
    gray_lumas = [gray(x, y) * 1000 for y in range(h) for x in range(w)]
    want_gray_mean = sum(gray_lumas) // (w * h)
    assert got[0]["codec"] == "ppm" and got[1]["codec"] == "pgm"
    assert got[2]["codec"] == "bmp"
    for mid in (0, 1, 2):
        assert (got[mid]["width"], got[mid]["height"]) == (w, h)
    assert got[0]["mean_luma_milli"] == want_rgb_mean
    assert got[1]["mean_luma_milli"] == want_gray_mean
    # BMP carries the SAME pixels as the PPM -> identical stats + hash
    assert got[2]["mean_luma_milli"] == want_rgb_mean
    assert got[2]["ahash64"] == got[0]["ahash64"]
    assert len(got[0]["ahash64"]) == 16


def test_real_decode_quarantines_bad_payloads(spark):
    payloads = [b"", b"JPEG not really", b"P6 trunca", b"BM\x00\x00"]
    rows = multimodal.decode_real_features(
        _media_frame(spark, payloads)
    ).collect()
    assert len(rows) == 4
    assert all(r["codec"] is None and r["ahash64"] is None for r in rows)


def test_real_decode_ahash_is_perceptual(spark):
    """Near-identical images land at small Hamming distance; a bright
    vs dark image pair lands far apart."""
    w, h = 32, 32
    base = lambda x, y: (x * 8 % 256, x * 8 % 256, x * 8 % 256)
    tweaked = lambda x, y: (
        min(255, x * 8 % 256 + (1 if (x, y) == (3, 3) else 0)),
    ) * 3
    inverted = lambda x, y: (255 - x * 8 % 256,) * 3
    got = {
        r["media_id"]: int(r["ahash64"], 16)
        for r in multimodal.decode_real_features(
            _media_frame(
                spark,
                [
                    _ppm_bytes(w, h, base),
                    _ppm_bytes(w, h, tweaked),
                    _ppm_bytes(w, h, inverted),
                ],
            )
        ).collect()
    }
    near = bin(got[0] ^ got[1]).count("1")
    far = bin(got[0] ^ got[2]).count("1")
    assert near <= 2
    assert far >= 20


def test_resize_real_box_downsample_exact(spark):
    """Aspect-fit dims + exact box-mean pixels: a 100x60 PPM into a
    50x50 box lands at 50x30, and a uniform-color image stays exactly
    that color after resampling."""
    rgb = lambda x, y: (37, 120, 211)
    media = _media_frame(spark, [_ppm_bytes(100, 60, rgb)])
    out = multimodal.resize_real(media, 50, 50).collect()[0]
    assert (out["out_width"], out["out_height"]) == (50, 30)
    codec, px = multimodal._decode_netpbm(bytes(out["payload"]))
    assert codec == "ppm" and px.shape == (30, 50, 3)
    assert (px.reshape(-1, 3) == [37, 120, 211]).all()


def test_resize_real_mean_preserved_when_blocks_divide(spark):
    """8x8 gray image of multiples-of-4 values into 4x4: each output
    pixel is the exact integer mean of its 2x2 block."""
    gray = lambda x, y: ((x + 2 * y) % 8) * 4
    media = _media_frame(spark, [_pgm_bytes(8, 8, gray)])
    out = multimodal.resize_real(media, 4, 4).collect()[0]
    codec, px = multimodal._decode_netpbm(bytes(out["payload"]))
    assert codec == "pgm" and px.shape == (4, 4)
    for i in range(4):
        for j in range(4):
            block = [
                gray(2 * j + dx, 2 * i + dy)
                for dy in range(2)
                for dx in range(2)
            ]
            assert px[i, j] == sum(block) // 4


def test_resize_real_bmp_normalizes_to_ppm_and_passthrough(spark):
    rgb = lambda x, y: (x % 256, y % 256, (x * y) % 256)
    payloads = [_bmp_bytes(64, 64, rgb), b"not an image at all"]
    rows = {
        r["media_id"]: r
        for r in multimodal.resize_real(
            _media_frame(spark, payloads), 16, 16
        ).collect()
    }
    codec, px = multimodal._decode_netpbm(bytes(rows[0]["payload"]))
    assert codec == "ppm" and px.shape == (16, 16, 3)
    # undecodable payload passes through byte-identical
    assert bytes(rows[1]["payload"]) == payloads[1]
    assert rows[1]["out_width"] is None and rows[1]["out_height"] is None


def test_resize_real_never_upscales(spark):
    media = _media_frame(spark, [_pgm_bytes(5, 3, lambda x, y: 7)])
    out = multimodal.resize_real(media, 100, 100).collect()[0]
    assert (out["out_width"], out["out_height"]) == (5, 3)


def test_phash_real_pairs_near_duplicate_images(spark):
    """Two perceptually-near images (one pixel nudged) pair up through
    the pigeonhole Hamming join; a perceptually-distant image doesn't —
    the property the md5 stand-in cannot provide."""
    from netflix_data_ingestion_spark.operators.dedup import (
        hamming_pairs_64,
    )

    w, h = 32, 32
    base = lambda x, y: ((x * 8) % 256,) * 3
    tweak = lambda x, y: (
        min(255, (x * 8) % 256 + (3 if (x, y) == (5, 5) else 0)),
    ) * 3
    inverted = lambda x, y: (255 - (x * 8) % 256,) * 3
    media = _media_frame(
        spark,
        [
            _ppm_bytes(w, h, base),
            _ppm_bytes(w, h, tweak),
            _ppm_bytes(w, h, inverted),
        ],
    )
    fps = multimodal.phash_real(media)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs_64(fps, "media_id", "phash64", 3).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_read_media_dir_end_to_end(spark, tmp_path):
    """Files on disk -> binaryFile source -> MEDIA_SCHEMA -> real
    decode: the full multimodal ingest edge."""
    from netflix_data_ingestion_spark.sources.readers import read_media_dir

    rgb = lambda x, y: (x % 256, y % 256, 128)
    (tmp_path / "a.ppm").write_bytes(_ppm_bytes(12, 8, rgb))
    (tmp_path / "b.bmp").write_bytes(_bmp_bytes(6, 4, rgb))
    (tmp_path / "notes.txt").write_bytes(b"not media")
    media = read_media_dir(spark, str(tmp_path))
    rows = media.collect()
    assert len(rows) == 3
    assert {r["media_type"] for r in rows} == {"image", "other"}
    assert all(r["n_bytes"] == len(bytes(r["payload"])) for r in rows)
    assert len({r["media_id"] for r in rows}) == 3
    decoded = {
        r["codec"]
        for r in multimodal.decode_real_features(media).collect()
    }
    assert decoded == {"ppm", "bmp", None}
