"""AVI video decode (operators/avi.py) — pure-stdlib path.

BI_RGB 24-bit DIB streams are lossless, so encode_avi -> decode_avi
round-trips must be bit-exact.  The MJPG profile is proven with the
spec-compliant baseline JPEG test encoder (tests/test_jpeg_decode.py):
all-ones quant tables bound per-pixel error tightly, so decoded MJPG
frames must match the source within the quantization bound.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from netflix_data_ingestion_spark.operators.avi import (
    decode_avi,
    encode_avi,
)
from tests.test_jpeg_decode import encode_jpeg


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for _ in range(n)
    ]


@pytest.mark.parametrize("shape", [(8, 8), (5, 7), (16, 12), (1, 1)])
def test_dib_roundtrip_bit_exact(shape):
    h, w = shape
    frames = _frames(3, h, w, seed=h * 17 + w)
    got = decode_avi(encode_avi(frames))
    assert got is not None
    assert (got["width"], got["height"]) == (w, h)
    assert len(got["frames"]) == 3
    for want, have in zip(frames, got["frames"]):
        assert np.array_equal(want, have)


def test_stride_padding_is_exercised():
    """w=5 -> 15-byte rows padded to 16: the 4-byte stride path."""
    frames = _frames(2, 4, 5, seed=9)
    got = decode_avi(encode_avi(frames))
    assert got is not None
    assert np.array_equal(got["frames"][1], frames[1])


def _mjpg_avi(frames_px: list[np.ndarray], w: int, h: int) -> bytes:
    """Build an MJPG AVI by swapping encode_avi's strf compression to
    'MJPG' and the DIB movi chunks for JPEG payloads."""
    base = bytearray(encode_avi([np.zeros((h, w, 3), dtype=np.uint8)]))
    strf_pos = base.index(b"strf") + 8
    struct.pack_into(
        "<I", base, strf_pos + 16, struct.unpack("<I", b"MJPG")[0]
    )
    head = bytes(base[: base.index(b"movi") - 8])  # up to the movi LIST
    movi_body = b"movi"
    for px in frames_px:
        payload = encode_jpeg(px)
        pad = b"\x00" if len(payload) & 1 else b""
        movi_body += b"00dc" + struct.pack("<I", len(payload)) + payload + pad
    out = bytearray(
        head + b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    )
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


def test_mjpg_frames_decode_within_quant_bound():
    h, w = 16, 16
    rng = np.random.default_rng(4)
    # smooth frames keep DCT coefficients small -> tight error bound
    base = rng.integers(60, 196, size=(h, w, 3)).astype(np.float64)
    frames_px = [
        np.clip(base + i * 10, 0, 255).astype(np.uint8) for i in range(2)
    ]
    got = decode_avi(_mjpg_avi(frames_px, w, h))
    assert got is not None
    assert len(got["frames"]) == 2
    for want, have in zip(frames_px, got["frames"]):
        err = np.abs(want.astype(int) - have.astype(int))
        assert err.max() <= 24, err.max()  # all-ones quant: tight bound


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:16],
        lambda b: b"RIFF" + b[4:8] + b"WAVE" + b[12:],  # wrong type
        lambda b: b[:-10],  # truncated movi chunk
        lambda b: b"",
    ],
)
def test_corrupt_payloads_quarantine(mutate):
    core = encode_avi(_frames(2, 4, 4))
    assert decode_avi(mutate(core)) is None


def test_unsupported_compression_quarantines():
    core = bytearray(encode_avi(_frames(1, 4, 4)))
    strf_pos = core.index(b"strf") + 8
    struct.pack_into(
        "<I", core, strf_pos + 16, struct.unpack("<I", b"H264")[0]
    )
    assert decode_avi(bytes(core)) is None
    # 8-bit DIB also declines
    core2 = bytearray(encode_avi(_frames(1, 4, 4)))
    struct.pack_into("<H", core2, core2.index(b"strf") + 8 + 14, 8)
    assert decode_avi(bytes(core2)) is None


def test_bomb_cap_declines():
    from netflix_data_ingestion_spark.operators import avi as avimod

    old = avimod.BOMB_CAP_PIXELS
    avimod.BOMB_CAP_PIXELS = 100
    try:
        assert avimod.decode_avi(encode_avi(_frames(2, 10, 10))) is None
        assert avimod.decode_avi(encode_avi(_frames(1, 5, 5))) is not None
    finally:
        avimod.BOMB_CAP_PIXELS = old
