"""Pure-stdlib baseline JPEG decode (ITU-T T.81, JFIF color model).

Joins the real multimodal codec family (netpbm/BMP/PNG) behind
``multimodal.decode_real_features`` — no image library, just struct +
numpy: marker parse, canonical Huffman entropy decode, dequantize,
exact separable float IDCT, chroma upsample by replication, JFIF
YCbCr -> RGB.

Scope (the baseline-sequential profile):
- SOF0 (and SOF1 with 8-bit precision — extended sequential Huffman
  decodes identically at 8 bits), Huffman coding only;
- 8-bit samples, 1 or 3 components, sampling factors 1 or 2 per axis
  (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), single interleaved scan;
- restart intervals (DRI + RSTn, DC predictors reset per segment).

Quarantined -> None, never an error (the untrusted-payload contract):
progressive (SOF2) and every other SOF family, arithmetic coding,
12-bit precision, 4-component (CMYK) payloads, sampling factors > 2,
multi-scan files, truncated/corrupt entropy data, and declared
dimensions past the 64M-pixel bomb cap.

Like the PNG path, decode errors of ANY kind quarantine: the public
``decode_jpeg`` wraps the parser in a broad except and returns None.
"""

from __future__ import annotations

import math
import struct

#: natural (row-major) flat index of each zigzag position k = 0..63
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

_PIXEL_CAP = 64_000_000  # same bomb cap as the PNG path


def _idct_matrix():
    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0) / 2.0
    return a


_A = None  # lazy: numpy import cost only when a JPEG is actually seen


def _build_huffman(bits: bytes, vals: bytes) -> dict:
    """Canonical Huffman per T.81 Annex C: {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _Bits:
    """MSB-first bit reader over an already-destuffed entropy segment."""

    __slots__ = ("d", "pos", "cur", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.d):
                raise ValueError("entropy data exhausted")
            self.cur = self.d[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _split_ecs(data: bytes) -> tuple[list[bytes], int]:
    """Entropy-coded data -> destuffed segments split on RSTn markers.
    Returns (segments, bytes consumed including the terminating
    marker's 0xFF, exclusive)."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else None
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker: end of scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def _parse(b: bytes):
    """Raises on anything outside the supported profile; the public
    wrapper maps every raise to a None quarantine."""
    import numpy as np

    global _A
    if _A is None:
        _A = _idct_matrix()

    if len(b) < 4 or b[0:2] != b"\xff\xd8":  # SOI
        raise ValueError("not a JPEG")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError("marker expected")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan")
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        seg = b[i + 4 : i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    qt[tq] = list(seg[p : p + 64])
                    p += 64
                elif pq == 1:
                    qt[tq] = [
                        struct.unpack(">H", seg[p + 2 * k : p + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits16 = seg[p + 1 : p + 17]
                cnt = sum(bits16)
                vals = seg[p + 17 : p + 17 + cnt]
                if len(vals) != cnt:
                    raise ValueError("truncated DHT")
                t = _build_huffman(bits16, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = t
                if tc > 1:
                    raise ValueError("bad DHT class")
                p += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (8-bit: identical)
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision")
            if ncomp not in (1, 3):
                raise ValueError("1 or 3 components only")
            if w <= 0 or h <= 0 or w * h > _PIXEL_CAP:
                raise ValueError("dimension bomb")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                ch, cv = hv >> 4, hv & 15
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError("sampling factor out of scope")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise ValueError("multi-scan out of scope")
            scan = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tables >> 4, tables & 15)
            ecs_start = i + 2 + seg_len
            segs, _used = _split_ecs(b[ecs_start:])
            return _decode_scan(
                np, frame, scan, qt, huff_dc, huff_ac,
                restart_interval, segs,
            )
        # APPn / COM / anything else with a length: skip
        i += 2 + seg_len
    raise ValueError("no SOS marker")


def _decode_scan(
    np, frame, scan, qt, huff_dc, huff_ac, restart_interval, segs
):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("missing quant table")
        dc_t, ac_t = scan[c["id"]]
        if dc_t not in huff_dc or ac_t not in huff_ac:
            raise ValueError("missing Huffman table")
        c["dc"] = huff_dc[dc_t]
        c["ac"] = huff_ac[ac_t]
        c["q"] = qt[c["tq"]]
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        c["pred"] = 0

    seg_idx = 0
    bits = _Bits(segs[0])
    mcu_count = 0
    total_mcus = mcux * mcuy
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                bits = _Bits(segs[seg_idx])
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(np, bits, c)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    if mcu_count != total_mcus:
        raise ValueError("MCU count mismatch")

    planes = []
    for c in comps:
        compw = (w * c["h"] + hmax - 1) // hmax
        comph = (h * c["v"] + vmax - 1) // vmax
        p = c["plane"][:comph, :compw]
        p = np.repeat(
            np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(p)
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.int64)
        return "jpeg", gray
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    px = np.stack(
        [
            np.clip(np.round(r), 0, 255),
            np.clip(np.round(g), 0, 255),
            np.clip(np.round(bl), 0, 255),
        ],
        axis=2,
    ).astype(np.int64)
    return "jpeg", px


def _decode_block(np, bits: _Bits, c) -> "object":
    coef = np.zeros(64, dtype=np.float64)
    s = _huff_decode(bits, c["dc"])
    if s > 11:
        raise ValueError("bad DC magnitude")
    diff = _extend(bits.receive(s), s)
    c["pred"] += diff
    coef[0] = c["pred"] * c["q"][0]
    k = 1
    while k < 64:
        rs = _huff_decode(bits, c["ac"])
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef[ZIGZAG[k]] = _extend(bits.receive(s), s) * c["q"][k]
        k += 1
    f = coef.reshape(8, 8)
    return _A.T @ f @ _A + 128.0


def decode_jpeg(b: bytes):
    """("jpeg", HxW gray or HxWx3 RGB int64 array) for a supported
    baseline payload, else None — quarantine, never crash."""
    if not b or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    try:
        return _parse(b)
    except Exception:
        return None
