"""Baseline JPEG decode (operators/jpeg.py) — pure-stdlib path.

The test encoder writes spec-compliant baseline JPEGs (T.81: canonical
Huffman tables, zigzag RLE, byte stuffing, optional restart markers)
using its OWN forward DCT; decoding must invert it to within the
quantization error bound.  With all-ones quant tables the only loss is
coefficient rounding (|err| per coef <= 0.5), so pixel error is
tightly bounded — the in-repo independent oracle for the entropy
decode + dequant + IDCT + color pipeline.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from netflix_data_ingestion_spark.operators.jpeg import (
    ZIGZAG,
    _build_huffman,
    decode_jpeg,
)

# --- minimal spec-compliant baseline encoder (test-only) ---------------

# all 12 DC magnitude symbols at code length 4 (Kraft 12/16 <= 1,
# all-ones length-4 code unused), all 162 AC symbols at length 8
_DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_VALS = bytes(range(12))
_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = bytes([0, 0, 0, 0, 0, 0, 0, len(_AC_VALS)] + [0] * 8)


def _enc_table(bits: bytes, vals: bytes) -> dict:
    """symbol -> (length, code), inverted from the decoder's builder
    so encoder and decoder share one canonical-code definition."""
    return {v: lc for lc, v in _build_huffman(bits, vals).items()}


_DC_ENC = _enc_table(_DC_BITS, _DC_VALS)
_AC_ENC = _enc_table(_AC_BITS, _AC_VALS)


def _dct_matrix():
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0) / 2.0
    return a


_M = _dct_matrix()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits
        return bytes(self.out)


def _mag(v: int) -> tuple[int, int]:
    """DC/AC magnitude category + value bits per T.81 F.1.2.1."""
    s = 0 if v == 0 else v.bit_length() if v > 0 else (-v).bit_length()
    bitsv = v if v >= 0 else v + (1 << s) - 1
    return s, bitsv


def _encode_block(w: _BitWriter, block: np.ndarray, pred: int) -> int:
    f = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    q = np.round(f).astype(np.int64)  # all-ones quant table
    zz = [int(q.flat[ZIGZAG[k]]) for k in range(64)]
    s, bitsv = _mag(zz[0] - pred)
    ln, code = _DC_ENC[s]
    w.write(code, ln)
    if s:
        w.write(bitsv, s)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_ENC[0xF0]
            w.write(code, ln)
            run -= 16
        s, bitsv = _mag(zz[k])
        ln, code = _AC_ENC[(run << 4) | s]
        w.write(code, ln)
        w.write(bitsv, s)
        run = 0
    if run:
        ln, code = _AC_ENC[0x00]
        w.write(code, ln)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _plane_blocks(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Pad a component plane (edge-replicate) to bh x bw blocks."""
    h, w = plane.shape
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg(
    px: np.ndarray, luma_hv: tuple[int, int] = (1, 1), restart: int = 0
) -> bytes:
    """Baseline JPEG: all-ones quant table, shared canonical Huffman
    tables, single interleaved scan; luma_hv=(2,2) emits 4:2:0 with
    box-averaged chroma."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        hv = [(1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        lh, lv = luma_hv
        if (lh, lv) != (1, 1):
            # box-average chroma downsample to the sampling grid
            ch = (h + lv - 1) // lv
            cw = (w + lh - 1) // lh
            def down(p):
                pad = np.empty((ch * lv, cw * lh))
                pad[:h, :w] = p
                pad[h:, :w] = p[h - 1 : h, :]
                pad[:, w:] = pad[:, w - 1 : w]
                return pad.reshape(ch, lv, cw, lh).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [y, cb, cr]
        hv = [luma_hv, (1, 1), (1, 1)]

    hmax = max(x for x, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _plane_blocks(p, mcux * ch, mcuy * cv)
        for p, (ch, cv) in zip(planes, hv)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT: all ones
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        ch, cv = hv[c]
        sof += bytes([c + 1, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + _DC_BITS + _DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + _AC_BITS + _AC_VALS)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    preds = [0] * ncomp
    writer = _BitWriter()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                out += writer.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                writer = _BitWriter()
                preds = [0] * ncomp
            for c in range(ncomp):
                ch, cv = hv[c]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[c] = _encode_block(
                            writer,
                            padded[c][y0 : y0 + 8, x0 : x0 + 8],
                            preds[c],
                        )
            mcu_count += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- tests --------------------------------------------------------------


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_jpeg_gray_roundtrip_tight_bound():
    px = _rng(1).integers(0, 256, size=(24, 17), dtype=np.int64)
    got = decode_jpeg(encode_jpeg(px))
    assert got is not None and got[0] == "jpeg"
    assert got[1].shape == (24, 17)
    # all-ones quant: only coefficient rounding (<=0.5/coef) survives
    assert np.abs(got[1] - px).max() <= 4
    assert np.abs(got[1] - px).mean() <= 1.0


def test_jpeg_rgb_444_roundtrip():
    px = _rng(2).integers(0, 256, size=(16, 16, 3), dtype=np.int64)
    got = decode_jpeg(encode_jpeg(px))
    assert got is not None
    assert got[1].shape == (16, 16, 3)
    # color round trip adds YCbCr forward/inverse rounding
    assert np.abs(got[1] - px).max() <= 6
    assert np.abs(got[1] - px).mean() <= 1.5


def test_jpeg_420_constant_chroma_exact_subsampling():
    """4:2:0: with spatially CONSTANT chroma the box-average downsample
    and replication upsample are mutually inverse, so the only error is
    the luma path's coefficient rounding."""
    h, w = 21, 19
    y = _rng(3).integers(40, 216, size=(h, w)).astype(np.float64)
    # constant color cast: fixed (cb, cr) => r-g-b from one luma plane
    cb, cr = 140.0, 110.0
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.stack([r, g, b], axis=2), 16, 239).astype(np.int64)
    got = decode_jpeg(encode_jpeg(px, luma_hv=(2, 2)))
    assert got is not None
    assert got[1].shape == (h, w, 3)
    assert np.abs(got[1] - px).max() <= 8
    assert np.abs(got[1] - px).mean() <= 2.0


def test_jpeg_restart_markers():
    px = _rng(4).integers(0, 256, size=(32, 24), dtype=np.int64)
    plain = decode_jpeg(encode_jpeg(px))
    rst = decode_jpeg(encode_jpeg(px, restart=3))
    assert plain is not None and rst is not None
    # restart segmentation must not change the decoded image at all
    assert np.array_equal(plain[1], rst[1])


def test_jpeg_quarantines_out_of_scope_and_corrupt():
    px = _rng(5).integers(0, 256, size=(8, 8), dtype=np.int64)
    good = encode_jpeg(px)
    assert decode_jpeg(good) is not None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8\xff") is None
    assert decode_jpeg(good[:40]) is None  # truncated mid-header
    # SOF0 flipped to SOF2: now parsed as progressive, but the baseline
    # scan (Ss=0..Se=63) is illegal in a progressive stream -> quarantine
    prog = bytearray(good)
    sof_at = good.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None
    # dimension bomb: SOF declares 65000 x 65000 (> 64M pixel cap)
    bomb = bytearray(good)
    struct.pack_into(">HH", bomb, sof_at + 5, 65000, 65000)
    assert decode_jpeg(bytes(bomb)) is None
    # corrupt entropy data: truncate right after SOS
    sos_at = good.find(b"\xff\xda")
    assert decode_jpeg(good[: sos_at + 14]) is None


def test_jpeg_in_decode_real_features(spark):
    """The JPEG codec must ride the same Arrow mapInPandas stage as
    netpbm/BMP/PNG, with near-equal luma features for the same pixels
    (lossy codec: equality up to the rounding bound, not bit-exact)."""
    from netflix_data_ingestion_spark.operators import multimodal

    px = _rng(6).integers(0, 256, size=(12, 10, 3), dtype=np.int64)
    ppm = (
        f"P6 {px.shape[1]} {px.shape[0]} 255\n".encode()
        + bytes(px.astype(np.uint8).reshape(-1))
    )
    jpg = encode_jpeg(px)
    rows = [
        (1, ppm, "image", len(ppm), None),
        (2, jpg, "image", len(jpg), None),
        (3, b"\xff\xd8 bogus", "image", 7, None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in multimodal.decode_real_features(df).collect()
    }
    assert out[1]["codec"] == "ppm" and out[2]["codec"] == "jpeg"
    assert out[2]["width"] == 10 and out[2]["height"] == 12
    assert (
        abs(out[1]["mean_luma_milli"] - out[2]["mean_luma_milli"]) <= 3000
    )
    assert out[3]["codec"] is None  # quarantined, not crashed


# --- progressive (SOF2) ---------------------------------------------------

from netflix_data_ingestion_spark.operators.jpeg import (  # noqa: E402
    encode_jpeg_progressive,
)


def test_progressive_bit_identical_to_baseline():
    """With all-ones quant tables the progressive scan script (DC
    successive approximation + spectral selection + AC refinement)
    reconstructs EXACTLY the coefficients the baseline single-scan path
    codes, so the decoded pixels must be bit-identical — the strongest
    possible cross-check of the whole multi-scan machinery against the
    already-verified baseline path."""
    cases = [
        ((24, 17), (1, 1), 11),
        ((16, 16, 3), (1, 1), 12),
        ((21, 19, 3), (2, 2), 13),
        ((8, 8), (1, 1), 14),
        ((9, 25, 3), (2, 1), 15),
    ]
    for shape, hv, seed in cases:
        px = _rng(seed).integers(0, 256, size=shape, dtype=np.int64)
        base = decode_jpeg(encode_jpeg(px, luma_hv=hv))
        prog = decode_jpeg(encode_jpeg_progressive(px, luma_hv=hv))
        assert base is not None and prog is not None, (shape, hv)
        assert np.array_equal(base[1], prog[1]), (shape, hv)


def test_progressive_low_contrast_exercises_refinement():
    """Low-contrast inputs make most AC coefficients +-1..3, driving
    the newly-significant / correction-bit / EOB-run paths of the AC
    refinement scan (the regression shape that caught the encoder's
    Al mix-up during development)."""
    for seed in range(6):
        px = _rng(40 + seed).integers(120, 136, size=(24, 17),
                                      dtype=np.int64)
        base = decode_jpeg(encode_jpeg(px))
        prog = decode_jpeg(encode_jpeg_progressive(px))
        assert prog is not None and np.array_equal(base[1], prog[1])


def test_progressive_restart_markers():
    """RSTn inside progressive scans resets DC predictors AND EOB runs;
    the decoded image must not change at all."""
    px = _rng(16).integers(0, 256, size=(32, 24), dtype=np.int64)
    plain = decode_jpeg(encode_jpeg_progressive(px))
    rst = decode_jpeg(encode_jpeg_progressive(px, restart=3))
    assert plain is not None and rst is not None
    assert np.array_equal(plain[1], rst[1])
    color = _rng(17).integers(0, 256, size=(21, 19, 3), dtype=np.int64)
    a = decode_jpeg(encode_jpeg_progressive(color, luma_hv=(2, 2)))
    b = decode_jpeg(encode_jpeg_progressive(color, luma_hv=(2, 2),
                                            restart=2))
    assert a is not None and b is not None
    assert np.array_equal(a[1], b[1])


def test_progressive_constant_blocks_exact():
    """8x8-constant tiles have DC-only DCT coefficients that survive
    the all-ones quant round() exactly, so the progressive round-trip
    is EXACT — the primitive the oracle-checked contract row builds
    on (SQL can predict the decoded luma without replaying a DCT)."""
    vals = np.array([[7, 250], [128, 33]], dtype=np.int64)
    px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)  # 16x16
    got = decode_jpeg(encode_jpeg_progressive(px))
    assert got is not None
    assert np.array_equal(got[1], px)


def test_progressive_quarantines_corrupt():
    px = _rng(18).integers(0, 256, size=(16, 16), dtype=np.int64)
    good = encode_jpeg_progressive(px)
    assert decode_jpeg(good) is not None
    # truncated mid-scan: entropy data exhausted -> quarantine
    assert decode_jpeg(good[: len(good) // 2]) is None
    # missing EOI: progressive needs the terminating marker
    assert decode_jpeg(good[:-2]) is None
    # a baseline file whose SOF is flipped to SOF2 becomes an INVALID
    # progressive stream (its single scan spans Ss=0..Se=63, which
    # progressive forbids) -> quarantine, not crash
    base = encode_jpeg(px)
    flip = bytearray(base)
    flip[base.find(b"\xff\xc0") + 1] = 0xC2
    assert decode_jpeg(bytes(flip)) is None


# --- 12-bit extended sequential (SOF1) ------------------------------------


def test_jpeg12_gray_roundtrip_tight_bound():
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_12bit,
    )

    px = _rng(21).integers(0, 4096, size=(24, 17), dtype=np.int64)
    got = decode_jpeg(encode_jpeg_12bit(px))
    assert got is not None and got[0] == "jpeg"
    assert got[1].shape == (24, 17)
    # all-ones quant: only coefficient rounding survives — the SAME
    # bound as the 8-bit path, in 12-bit sample units
    assert np.abs(got[1] - px).max() <= 4
    assert np.abs(got[1] - px).mean() <= 1.0
    # the decode genuinely uses the 12-bit range
    assert got[1].max() > 255


def test_jpeg12_constant_tiles_exact():
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_12bit,
    )

    vals = np.array([[5, 2047], [3000, 4095]], dtype=np.int64)
    px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    got = decode_jpeg(encode_jpeg_12bit(px))
    assert got is not None
    # DC-only blocks survive all-ones quantization exactly
    assert np.array_equal(got[1], px)


def test_jpeg12_rgb_and_restart():
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_12bit,
    )

    px = _rng(22).integers(0, 4096, size=(16, 16, 3), dtype=np.int64)
    got = decode_jpeg(encode_jpeg_12bit(px))
    assert got is not None and got[1].shape == (16, 16, 3)
    assert np.abs(got[1] - px).max() <= 6
    gray = _rng(23).integers(0, 4096, size=(32, 24), dtype=np.int64)
    plain = decode_jpeg(encode_jpeg_12bit(gray))
    rst = decode_jpeg(encode_jpeg_12bit(gray, restart=3))
    assert np.array_equal(plain[1], rst[1])


# --- lossless (SOF3) -------------------------------------------------------


def test_jpeg_lossless_bit_exact_all_predictors_all_precisions():
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    rng = _rng(31)
    for prec, hi in [(8, 256), (12, 4096), (16, 65536)]:
        px = rng.integers(0, hi, size=(23, 17), dtype=np.int64)
        for pred in range(1, 8):
            got = decode_jpeg(encode_jpeg_lossless(px, predictor=pred,
                                                   prec=prec))
            assert got is not None and got[0] == "jpeg"
            # lossless means EXACT — every predictor, every precision
            assert np.array_equal(got[1], px), (prec, pred)


def test_jpeg_lossless_rgb_and_scope_quarantines():
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    px3 = _rng(32).integers(0, 256, size=(9, 11, 3), dtype=np.int64)
    got = decode_jpeg(encode_jpeg_lossless(px3, predictor=7))
    # components carry no color transform: output is the RGB planes
    assert np.array_equal(got[1], px3)

    px = _rng(33).integers(0, 256, size=(8, 8), dtype=np.int64)
    good = encode_jpeg_lossless(px)
    assert decode_jpeg(good) is not None
    # differential lossless (SOF7) stays quarantined
    flip = bytearray(good)
    flip[good.find(b"\xff\xc3") + 1] = 0xC7
    assert decode_jpeg(bytes(flip)) is None
    # truncated entropy data quarantines
    assert decode_jpeg(good[: len(good) - 8]) is None
    # a DRI segment before the lossless scan quarantines (restart
    # interaction out of scope), never decodes wrong pixels
    sos_at = good.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    assert decode_jpeg(good[:sos_at] + dri + good[sos_at:]) is None


def test_jpeg_lossless_sos_order_differs_from_frame_order():
    """An externally produced SOF3 file may list SOS components in a
    different order than the SOF frame header; T.81 H.2 interleaves the
    entropy stream in SOS order, so a frame-order walk mis-assigns the
    planes.  Craft such a file (SOS components reversed, stream
    interleaved reversed) and require a bit-exact decode — the encoder
    twin can never produce this shape, hence the hand-rolled writer."""
    import struct as _struct

    from netflix_data_ingestion_spark.operators import jpeg as J

    px3 = _rng(34).integers(0, 256, size=(7, 5, 3), dtype=np.int64)
    h, w = px3.shape[:2]
    planes = [np.asarray(px3[:, :, k], dtype=np.int64) for k in range(3)]
    pred, prec, default = 4, 8, 1 << 7
    ll_enc = {
        v: lc
        for lc, v in J._build_huffman(J._E_LL_BITS, J._E_LL_VALS).items()
    }
    out = bytearray(b"\xff\xd8")
    sof = bytes([prec]) + _struct.pack(">HH", h, w) + bytes([3])
    for ci in range(3):  # frame order 1,2,3
        sof += bytes([ci + 1, 0x11, 0])
    out += J._marker_seg(0xC3, sof)
    out += J._marker_seg(0xC4, bytes([0x00]) + J._E_LL_BITS + J._E_LL_VALS)
    sos = bytes([3])
    for ci in (2, 1, 0):  # SOS order 3,2,1 — reversed vs the frame
        sos += bytes([ci + 1, 0x00])
    sos += bytes([pred, 0, 0])
    out += J._marker_seg(0xDA, sos)
    w_ = J._BitWriter()
    for r in range(h):
        for col in range(w):
            for ci in (2, 1, 0):  # stream interleaved in SOS order
                p = planes[ci]
                pv = J._lossless_predict(p, r, col, pred, default)
                diff = (int(p[r][col]) - pv) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if diff == -32768:
                    ln, code = ll_enc[16]
                    w_.write(code, ln)
                    continue
                s, bitsv = J._mag_bits(diff)
                ln, code = ll_enc[s]
                w_.write(code, ln)
                if s:
                    w_.write(bitsv, s)
    out += w_.flush()
    out += b"\xff\xd9"
    got = decode_jpeg(bytes(out))
    assert got is not None and np.array_equal(got[1], px3)


def test_jpeg_lossless_sample_budget_tighter_than_dct():
    """SOF3's per-sample Python Huffman loop gets a 64x tighter budget
    than the per-block DCT paths: declared w*h*ncomp past 1M samples
    quarantines at the SOF header, before any entropy decode."""
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    good = encode_jpeg_lossless(
        _rng(35).integers(0, 256, size=(4, 4), dtype=np.int64)
    )
    at = good.find(b"\xff\xc3")
    bomb = bytearray(good)
    # rewrite declared dims to 1024x1024 on the 1-component frame (1M
    # samples: at the cap, still parses past the SOF) then 1025x1024
    bomb[at + 5 : at + 9] = (1024).to_bytes(2, "big") * 2
    assert decode_jpeg(bytes(bomb)) is None  # fails later, not a bomb
    bomb[at + 5 : at + 7] = (1025).to_bytes(2, "big")
    import pytest as _pytest  # noqa: F401

    # past the cap the SOF itself quarantines (decode returns None via
    # the ValueError path, identically — but assert the cheap rejection
    # happens by checking no multi-second stall)
    import time

    t0 = time.time()
    assert decode_jpeg(bytes(bomb)) is None
    assert time.time() - t0 < 2.0


def test_jpeg12_scope_quarantines():
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_12bit,
    )

    px = _rng(24).integers(0, 4096, size=(16, 16), dtype=np.int64)
    good = encode_jpeg_12bit(px)
    assert decode_jpeg(good) is not None
    # flipping the frame marker to SOF0 (baseline forbids 12-bit) or
    # SOF2 (now a progressive frame whose single Ss=0..Se=63 scan is
    # illegal in a progressive stream) must quarantine, not crash
    for marker in (0xC0, 0xC2):
        flip = bytearray(good)
        flip[good.find(b"\xff\xc1") + 1] = marker
        assert decode_jpeg(bytes(flip)) is None
    # truncated entropy data quarantines like every other profile
    assert decode_jpeg(good[: len(good) - 20]) is None


def test_jpeg12_progressive_roundtrip_and_twin_identity():
    """12-bit PROGRESSIVE (SOF2 at precision 12): round-trips within
    the coefficient-rounding bound and decodes BIT-IDENTICAL to the
    12-bit sequential twin on the same pixels — the multi-scan
    accumulation and the single-scan path must agree exactly."""
    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_12bit,
        encode_jpeg_progressive,
    )

    px = _rng(25).integers(0, 4096, size=(24, 17), dtype=np.int64)
    prog = decode_jpeg(encode_jpeg_progressive(px, prec=12))
    assert prog is not None
    assert np.abs(prog[1] - px).max() <= 4
    seq = decode_jpeg(encode_jpeg_12bit(px))
    assert np.array_equal(prog[1], seq[1])
    # constant tiles exact; restart segmentation invisible
    vals = np.array([[10, 2000], [3000, 4095]], dtype=np.int64)
    tile = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    got = decode_jpeg(encode_jpeg_progressive(tile, prec=12))
    assert np.array_equal(got[1], tile)
    rst = decode_jpeg(encode_jpeg_progressive(px, prec=12, restart=2))
    assert np.array_equal(rst[1], prog[1])
    # 12-bit RGB progressive
    px3 = _rng(26).integers(0, 4096, size=(16, 16, 3), dtype=np.int64)
    g3 = decode_jpeg(encode_jpeg_progressive(px3, prec=12))
    assert np.abs(g3[1] - px3).max() <= 6
