"""Property tests over the pure-stdlib codec family (operators/gif.py,
audio.py, avi.py): lossless round-trips must hold for ARBITRARY
payloads, not just the handwritten cases — hypothesis drives sizes,
bit depths, palette widths, and sample values.

(JPEG is deliberately absent: it is lossy, so its bound-based checks
live in tests/test_jpeg_decode.py against the spec-compliant test
encoder.)
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from netflix_data_ingestion_spark.operators.audio import (
    decode_wav,
    encode_wav,
    resample_wav,
)
from netflix_data_ingestion_spark.operators.avi import (
    decode_avi,
    encode_avi,
)
from netflix_data_ingestion_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=3000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_any_bytes(data, mcs):
    """LZW must invert for any byte stream whose values fit the code
    space (values >= 2^mcs can't be literals, so mask them in)."""
    mask = (1 << mcs) - 1
    payload = bytes(b & mask for b in data)
    enc = _lzw_encode(payload, mcs)
    assert bytes(_lzw_decode(enc, mcs, len(payload) or 1)) == payload


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    depth=st.sampled_from([1, 2, 4, 8]),
    interlace=st.booleans(),
)
def test_gif_roundtrip_any_geometry(seed, h, w, depth, interlace):
    rng = np.random.default_rng(seed)
    n = 1 << depth
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    f = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    got = decode_gif(encode_gif([f], pal, interlace=interlace))
    assert got is not None
    assert np.array_equal(got["frames"][0], pal[f])


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    frames=st.integers(min_value=0, max_value=200),
    channels=st.integers(min_value=1, max_value=4),
    bits=st.sampled_from([8, 16, 24, 32]),
    rate=st.integers(min_value=1, max_value=96_000),
)
def test_wav_roundtrip_any_params(seed, frames, channels, bits, rate):
    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    samples = rng.integers(lo, hi + 1, size=frames * channels, dtype=np.int64)
    got = decode_wav(encode_wav(samples, channels, rate, bits))
    assert got is not None
    assert got["num_frames"] == frames
    assert got["sample_rate"] == rate
    assert np.array_equal(got["samples"], samples)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    frames=st.integers(min_value=0, max_value=120),
    src=st.integers(min_value=1, max_value=50_000),
    dst=st.integers(min_value=1, max_value=50_000),
)
def test_resample_frame_math_any_rates(seed, frames, src, dst):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=frames, dtype=np.int64)
    got = decode_wav(resample_wav(encode_wav(samples, 1, src, 16), dst))
    assert got is not None
    m = frames * dst // src
    assert got["num_frames"] == m
    want = samples[[(j * src) // dst for j in range(m)]]
    assert np.array_equal(got["samples"], want)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n=st.integers(min_value=1, max_value=5),
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
)
def test_avi_dib_roundtrip_any_geometry(seed, n, h, w):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for _ in range(n)
    ]
    got = decode_avi(encode_avi(frames))
    assert got is not None
    assert len(got["frames"]) == n
    for a, b in zip(frames, got["frames"]):
        assert np.array_equal(a, b)
