"""PNG decode (operators/multimodal._decode_png) — pure-stdlib path.

The test encoder writes spec-compliant PNGs (zlib-compressed IDAT, real
CRCs) applying the FORWARD filter transform per PNG spec §9 for a chosen
per-row filter type; decoding must invert it exactly.  Cross-codec
oracle: the same pixel array shipped as PNG and as netpbm must produce
identical luma statistics and aHash through decode_real_features.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from netflix_data_ingestion_spark.operators import multimodal
from netflix_data_ingestion_spark.operators.multimodal import (
    _decode_netpbm,
    _decode_png,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_rows(px: np.ndarray, channels: int, filt: int) -> bytes:
    """Forward filter transform (PNG spec §9): raw scanlines ->
    filtered scanlines, each prefixed by the filter-type byte."""
    h = px.shape[0]
    flat = px.reshape(h, -1).astype(np.int64)
    bpp = channels * (2 if px.dtype == np.uint16 else 1)
    if px.dtype == np.uint16:
        rows = np.zeros((h, flat.shape[1] * 2), dtype=np.int64)
        rows[:, 0::2] = flat >> 8
        rows[:, 1::2] = flat & 0xFF
        flat = rows
    out = b""
    prev = np.zeros(flat.shape[1], dtype=np.int64)
    for y in range(h):
        raw = flat[y]
        line = np.empty_like(raw)
        for x in range(len(raw)):
            a = raw[x - bpp] if x >= bpp else 0
            up = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = up
            elif filt == 3:
                pred = (a + up) // 2
            else:  # Paeth
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else c
                )
            line[x] = (raw[x] - pred) % 256
        out += bytes([filt]) + bytes(line.astype(np.uint8))
        prev = raw
    return out


def _png_bytes(
    px: np.ndarray,
    color_type: int,
    filt: int = 0,
    palette: bytes | None = None,
    interlace: int = 0,
) -> bytes:
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    depth = 16 if px.dtype == np.uint16 else 8
    h, w = px.shape[0], px.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    raw = _filter_rows(px, channels, filt)
    body = _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette)
    body += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_rgb_roundtrip_every_filter(filt):
    px = _rng(filt).integers(0, 256, size=(11, 7, 3), dtype=np.int64)
    got = _decode_png(_png_bytes(px.astype(np.uint8), 2, filt))
    assert got is not None and got[0] == "png"
    assert np.array_equal(got[1], px)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_gray_roundtrip_every_filter(filt):
    px = _rng(20 + filt).integers(0, 256, size=(9, 13, 1), dtype=np.int64)
    got = _decode_png(_png_bytes(px.astype(np.uint8), 0, filt))
    assert got is not None
    assert np.array_equal(got[1], px[:, :, 0])


def test_png_rgba_drops_alpha():
    px = _rng(3).integers(0, 256, size=(6, 5, 4), dtype=np.int64)
    got = _decode_png(_png_bytes(px.astype(np.uint8), 6, filt=4))
    assert got is not None
    assert np.array_equal(got[1], px[:, :, :3])


def test_png_gray_alpha_drops_alpha():
    px = _rng(4).integers(0, 256, size=(4, 4, 2), dtype=np.int64)
    got = _decode_png(_png_bytes(px.astype(np.uint8), 4, filt=1))
    assert got is not None
    assert np.array_equal(got[1], px[:, :, 0])


def test_png_palette_lookup():
    pal = bytes(range(30))  # 10 RGB entries
    idx = _rng(5).integers(0, 10, size=(5, 8, 1), dtype=np.int64)
    got = _decode_png(
        _png_bytes(idx.astype(np.uint8), 3, filt=2, palette=pal)
    )
    assert got is not None
    expect = np.frombuffer(pal, np.uint8).reshape(-1, 3).astype(np.int64)[
        idx[:, :, 0]
    ]
    assert np.array_equal(got[1], expect)


def test_png_16bit_normalizes_like_netpbm():
    px16 = _rng(6).integers(0, 65536, size=(5, 4, 3), dtype=np.int64)
    got = _decode_png(_png_bytes(px16.astype(np.uint16), 2, filt=2))
    assert got is not None
    # same //257 normalization the 16-bit netpbm path uses
    assert np.array_equal(got[1], px16 // 257)


def test_png_rejects_unsupported_and_corrupt():
    px = _rng(8).integers(0, 256, size=(4, 4, 3), dtype=np.int64)
    good = _png_bytes(px.astype(np.uint8), 2)
    assert _decode_png(good) is not None
    assert _decode_png(b"") is None
    assert _decode_png(good[:30]) is None  # truncated
    assert _decode_png(b"\x89PNG\r\n\x1a\njunk") is None
    interlaced = _png_bytes(px.astype(np.uint8), 2, interlace=1)
    assert _decode_png(interlaced) is None
    # corrupt the deflate stream
    broken = bytearray(good)
    broken[45] ^= 0xFF
    assert _decode_png(bytes(broken)) is None


def test_png_quarantines_decompression_bombs():
    """Untrusted-payload guard: crafted payloads that would OOM the
    executor must quarantine (None), never allocate or crash."""
    # 1) Huge declared dimensions (100k x 100k = 1e10 px) with a tiny
    #    IDAT: the 64M-pixel cap must fire before any buffer allocation.
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    bomb_dims = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _chunk(b"IEND", b"")
    )
    assert _decode_png(bomb_dims) is None
    # 2) Plausible dimensions but an IDAT that inflates far past the
    #    declared geometry (4x4 RGB needs 52 bytes; this yields 10 MB):
    #    bounded inflate must stop at need+1 and quarantine.
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb_data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + _chunk(b"IEND", b"")
    )
    assert _decode_png(bomb_data) is None
    # 3) Off-by-a-little excess output (need + a few bytes) is also a
    #    malformed payload -> quarantine, while exact-length decodes.
    px = _rng(12).integers(0, 256, size=(4, 4, 3), dtype=np.int64)
    raw = _filter_rows(px.astype(np.uint8), 3, 0)
    good = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    excess = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw + b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    assert _decode_png(good) is not None
    assert _decode_png(excess) is None


def test_png_matches_netpbm_cross_codec():
    """Same pixels via PNG and via P6 netpbm must decode identically —
    the independent in-repo oracle for the PNG filter inversion."""
    px = _rng(9).integers(0, 256, size=(16, 12, 3), dtype=np.int64)
    ppm = (
        f"P6 {px.shape[1]} {px.shape[0]} 255\n".encode()
        + bytes(px.astype(np.uint8).reshape(-1))
    )
    a = _decode_netpbm(ppm)
    b = _decode_png(_png_bytes(px.astype(np.uint8), 2, filt=4))
    assert a is not None and b is not None
    assert np.array_equal(a[1], b[1])


def _media_frame(spark, payloads):
    rows = [(i + 1, p, "image", len(p), None) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_decode_real_features_handles_png(spark):
    px = _rng(11).integers(0, 256, size=(10, 10, 3), dtype=np.int64)
    ppm = (
        f"P6 {px.shape[1]} {px.shape[0]} 255\n".encode()
        + bytes(px.astype(np.uint8).reshape(-1))
    )
    png = _png_bytes(px.astype(np.uint8), 2, filt=3)
    out = {
        r["media_id"]: r
        for r in multimodal.decode_real_features(
            _media_frame(spark, [ppm, png, b"\x89PNG bogus"])
        ).collect()
    }
    assert out[1]["codec"] == "ppm" and out[2]["codec"] == "png"
    # identical pixels -> identical features across codecs
    for k in ("width", "height", "mean_luma_milli", "ahash64"):
        assert out[1][k] == out[2][k]
    assert out[3]["codec"] is None  # quarantined, not crashed
