"""Pure-stdlib baseline + progressive JPEG decode (ITU-T T.81, JFIF).

Joins the real multimodal codec family (netpbm/BMP/PNG) behind
``multimodal.decode_real_features`` — no image library, just struct +
numpy: marker parse, canonical Huffman entropy decode, dequantize,
exact separable float IDCT, chroma upsample by replication, JFIF
YCbCr -> RGB.

Scope:
- SOF0 (and SOF1 with 8-bit precision — extended sequential Huffman
  decodes identically at 8 bits): single interleaved scan;
- SOF2 progressive (T.81 G.1/G.2): multi-scan coefficient
  accumulation — DC first + DC refinement (successive approximation),
  per-component AC spectral-selection scans with EOB-run decoding, and
  AC refinement scans with interleaved correction bits — then ONE
  dequantize + IDCT pass at EOI (the most common quarantined payload
  class in a real web corpus's image column, now decoded real);
- 8-bit samples, plus 12-BIT samples in SOF1 extended sequential AND
  SOF2 progressive (T.81 Table B.2 — the medical/scientific-corpus
  precision: DC DIFF categories to 15, AC magnitudes to 14 per Tables
  F.1/F.2, level shift 2^(P-1), 16-bit DQT) — output is the same
  int64 array with 0..4095 samples;
- SOF3 lossless sequential (T.81 Annex H): spatial DPCM over all
  seven H.1 predictors with modulo-65536 reconstruction and point
  transform, 8/12/16-bit samples, decode bit-EXACT (components carry
  no color transform; 3-component output is RGB planes directly);
- 1 or 3 components, sampling factors 1 or 2 per axis
  (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), Huffman coding only;
- restart intervals (DRI + RSTn; DC predictors and EOB runs reset per
  segment, in every DCT scan kind — lossless scans with DRI set stay
  quarantined: the restart/row-structure interaction is ambiguous
  across implementations).

Quarantined -> None, never an error (the untrusted-payload contract):
differential lossless (SOF7), hierarchical (SOF5/6/13/14/15),
arithmetic coding (SOF9-11), 4-component (CMYK) payloads, sampling
factors > 2 (or != 1 in lossless), truncated/corrupt entropy data,
scans that violate the progressive ordering rules, and declared
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
# SOF3 runs a pure-Python per-SAMPLE Huffman loop (the DCT paths loop
# per 8x8 BLOCK, ~64x fewer Python-level decodes for the same declared
# dimensions), so the lossless path gets a 64x tighter budget to keep
# the worst-case CPU amplification of a hostile payload comparable:
# w*h*ncomp decoded samples, not w*h pixels.
_LOSSLESS_SAMPLE_CAP = _PIXEL_CAP // 64  # 1M decoded samples


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
    n_prog_scans = 0
    i = 2
    n = len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            raise ValueError("marker expected")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            if frame is not None and frame.get("progressive") and n_prog_scans:
                return _prog_finish(np, frame, qt)
            raise ValueError("no scan")
        if i + 4 > n:
            raise ValueError("truncated marker segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 / SOF1 (8-bit: identical; 12-bit per T.81 Table B.2)
            # / SOF2 progressive
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if prec == 12:
                # T.81: 12-bit is legal in extended sequential (SOF1)
                # and progressive (SOF2) but NOT baseline (SOF0)
                if marker == 0xC0:
                    raise ValueError("12-bit illegal in baseline SOF0")
            elif prec != 8:
                raise ValueError("8- or 12-bit precision only")
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
            frame = {
                "w": w, "h": h, "comps": comps,
                "progressive": marker == 0xC2,
                "prec": prec,
            }
            if marker == 0xC2:
                _prog_init(np, frame)
        elif marker == 0xC3:
            # SOF3 lossless sequential (T.81 Annex H): spatial DPCM,
            # no DCT/quantization — P up to 16 bits
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if prec not in (8, 12, 16):
                raise ValueError("lossless precision out of scope")
            if ncomp not in (1, 3):
                raise ValueError("1 or 3 components only")
            if w <= 0 or h <= 0 or w * h * ncomp > _LOSSLESS_SAMPLE_CAP:
                raise ValueError("dimension bomb")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    # subsampling has no meaning without a transform
                    # domain; lossless scope is 1:1 grids only
                    raise ValueError("lossless subsampling out of scope")
                comps.append({"id": cid, "h": 1, "v": 1, "tq": tq})
            frame = {
                "w": w, "h": h, "comps": comps,
                "progressive": False, "lossless": True, "prec": prec,
            }
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tables >> 4, tables & 15)
            ecs_start = i + 2 + seg_len
            segs, used = _split_ecs(b[ecs_start:])
            if frame.get("lossless"):
                if ns != len(frame["comps"]):
                    raise ValueError("multi-scan out of scope")
                if restart_interval:
                    # restart prediction-reset rules interact with the
                    # row structure ambiguously across implementations;
                    # out of scope (quarantine, never a wrong pixel)
                    raise ValueError("lossless restart out of scope")
                ss = seg[1 + 2 * ns]          # predictor selector
                se = seg[2 + 2 * ns]
                pt = seg[3 + 2 * ns] & 15     # point transform
                if not (1 <= ss <= 7) or se != 0:
                    raise ValueError("bad lossless scan header")
                return _decode_lossless_scan(
                    np, frame, scan, huff_dc, segs, ss, pt
                )
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise ValueError("multi-scan out of scope")
                return _decode_scan(
                    np, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval, segs,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            _decode_prog_scan(
                frame, scan, huff_dc, huff_ac, restart_interval, segs,
                ss, se, ah_al >> 4, ah_al & 15,
            )
            n_prog_scans += 1
            i = ecs_start + used
            continue
        # APPn / COM / anything else with a length: skip
        i += 2 + seg_len
    raise ValueError("no SOS marker")


def _decode_scan(
    np, frame, scan, qt, huff_dc, huff_ac, restart_interval, segs
):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    prec = frame.get("prec", 8)
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
        # T.81 Tables F.1/F.2: DC DIFF categories reach 15 and AC
        # magnitudes 14 at 12-bit (11 / 10 at 8-bit); level shift is
        # 2^(P-1) (A.3.1)
        c["max_dc_s"] = 15 if prec == 12 else 11
        c["center"] = float(1 << (prec - 1))
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
    return _finish_planes(np, w, h, comps, hmax, vmax, prec)


def _lossless_predict(plane, r: int, c: int, sel: int, default: int) -> int:
    """T.81 H.1.2 prediction for sample (r, c): a=left, b=above,
    c=above-left; the first scan sample uses the default, the rest of
    the first line predictor 1 (left), the first column of later lines
    predictor 2 (above), everything else the selected predictor 1-7."""
    if r == 0:
        return default if c == 0 else int(plane[0][c - 1])
    if c == 0:
        return int(plane[r - 1][0])
    a = int(plane[r][c - 1])
    b = int(plane[r - 1][c])
    cc = int(plane[r - 1][c - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return cc
    if sel == 4:
        return a + b - cc
    if sel == 5:
        return a + ((b - cc) >> 1)
    if sel == 6:
        return b + ((a - cc) >> 1)
    return (a + b) >> 1  # sel == 7


def _decode_lossless_scan(np, frame, scan, huff_dc, segs, sel, pt):
    """SOF3 lossless sequential decode (T.81 Annex H): per-sample
    Huffman-coded prediction differences, modulo-65536 reconstruction
    (H.1.2.1), samples emitted as value << Pt.  Components are stored
    without a defined color transform, so 3-component output is taken
    as RGB directly (the PIL/libjpeg convention) — no YCbCr inverse."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    prec = frame["prec"]
    default = 1 << (prec - pt - 1)
    maxval = (1 << prec) - 1
    if len(segs) != 1:
        raise ValueError("lossless restart out of scope")
    bits = _Bits(segs[0])
    planes = []
    for c in comps:
        t = scan.get(c["id"])
        if t is None or t[0] not in huff_dc:
            raise ValueError("missing Huffman table")
        c["dc"] = huff_dc[t[0]]
        planes.append([[0] * w for _ in range(h)])
    # T.81 H.2: the entropy stream interleaves samples in SOS component
    # order, which may differ from SOF frame order — walking frame order
    # against such a stream silently mis-assigns tables/planes.  `scan`
    # is an insertion-ordered dict built while parsing the SOS, so its
    # key order IS the stream order.
    id_to_idx = {c["id"]: i for i, c in enumerate(comps)}
    scan_order = []
    for cid in scan:
        if cid not in id_to_idx:
            raise ValueError("SOS component not in frame")
        scan_order.append((id_to_idx[cid], comps[id_to_idx[cid]]))
    for r in range(h):
        for col in range(w):
            for ci, c in scan_order:
                s = _huff_decode(bits, c["dc"])
                if s > 16:
                    raise ValueError("bad lossless magnitude")
                # SSSS=16: difference is 32768 with no appended bits
                diff = 32768 if s == 16 else _extend(bits.receive(s), s)
                pred = _lossless_predict(planes[ci], r, col, sel, default)
                planes[ci][r][col] = (pred + diff) & 0xFFFF
    arrs = [
        (np.array(p, dtype=np.int64) << pt) & ((1 << 16) - 1)
        for p in planes
    ]
    if any(int(a.max()) > maxval for a in arrs):
        # only a corrupt/mismatched stream can leave the declared
        # sample range after mod-2^16 reconstruction -> quarantine
        raise ValueError("lossless sample past declared precision")
    if len(arrs) == 1:
        return "jpeg", arrs[0]
    return "jpeg", np.stack(arrs, axis=2)


def _finish_planes(np, w, h, comps, hmax, vmax, prec: int = 8):
    """Crop each component plane, replicate-upsample to full resolution,
    and convert to the output pixel array (shared by the baseline and
    progressive paths).  At 12-bit the chroma center and clip range
    scale to 2^(P-1) / 2^P - 1 (JFIF YCbCr constants are
    precision-independent)."""
    center = float(1 << (prec - 1))
    maxval = (1 << prec) - 1
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
        gray = np.clip(np.round(planes[0]), 0, maxval).astype(np.int64)
        return "jpeg", gray
    y, cb, cr = planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    bl = y + 1.772 * (cb - center)
    px = np.stack(
        [
            np.clip(np.round(r), 0, maxval),
            np.clip(np.round(g), 0, maxval),
            np.clip(np.round(bl), 0, maxval),
        ],
        axis=2,
    ).astype(np.int64)
    return "jpeg", px


# --- progressive (SOF2) scan machinery — T.81 G.1.2 / G.2 ----------------


def _prog_init(np, frame) -> None:
    """Allocate the per-component coefficient accumulators: (bh, bw, 64)
    int32 in ZIGZAG index space on the MCU-padded block grid (interleaved
    DC scans code the padding blocks; non-interleaved scans traverse only
    the ceil(comp/8) sub-grid, `nbw` x `nbh`)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    prec = frame.get("prec", 8)
    for c in comps:
        c["coef"] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
        )
        c["pred"] = 0
        # T.81 Table F.1: DC DIFF categories reach 15 at 12-bit
        c["max_dc_s"] = 15 if prec == 12 else 11
        compw = (w * c["h"] + hmax - 1) // hmax
        comph = (h * c["v"] + vmax - 1) // vmax
        c["nbw"] = (compw + 7) // 8
        c["nbh"] = (comph + 7) // 8


def _dc_decode(bits: _Bits, c, blk, ah: int, al: int) -> None:
    if ah == 0:  # first DC scan: diff-coded, point transform << al
        s = _huff_decode(bits, c["dcT"])
        if s > c.get("max_dc_s", 11):
            raise ValueError("bad DC magnitude")
        c["pred"] += _extend(bits.receive(s), s)
        blk[0] = c["pred"] << al
    elif bits.read_bit():  # refinement: one bit appends at position al
        blk[0] |= 1 << al


def _ac_first(bits: _Bits, c, blk, ss, se, al, eobrun: int) -> int:
    """First AC scan of a band (Ah == 0), T.81 G.1.2.2: run/size coding
    within [Ss, Se] plus EOBn symbols encoding runs of all-zero bands
    across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(bits, c["acT"])
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: this block ends the band...
            if r:
                eobrun += bits.receive(r)
            break  # ...and eobrun more blocks are all-zero in it
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(bits.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(bits: _Bits, c, blk, ss, se, al, eobrun: int) -> int:
    """AC refinement scan (Ah > 0), T.81 G.1.2.3: newly significant
    coefficients arrive as run/1 symbols; every already-nonzero
    coefficient visited on the way consumes one interleaved correction
    bit; EOBn runs also carry correction bits for the remaining nonzero
    coefficients of each block in the run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, c["acT"])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.receive(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if bits.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if bits.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement run past band end")
                blk[k] = val
            if k <= se:
                k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of this block
            if blk[k] != 0:
                if bits.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    frame, scan, huff_dc, huff_ac, restart_interval, segs,
    ss, se, ah, al,
) -> None:
    """Decode one progressive scan into the coefficient accumulators.
    DC scans (Ss == 0) may interleave several components over the MCU
    grid; AC scans are single-component over that component's own block
    grid (T.81 G.1.1)."""
    comps = [c for c in frame["comps"] if c["id"] in scan]
    if len(comps) != len(scan) or not comps:
        raise ValueError("scan names unknown component")
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        if ah == 0:
            for c in comps:
                dc_t = scan[c["id"]][0]
                if dc_t not in huff_dc:
                    raise ValueError("missing Huffman table")
                c["dcT"] = huff_dc[dc_t]
                c["pred"] = 0
    else:
        if len(comps) != 1:
            raise ValueError("progressive AC scan must be one component")
        if se < ss or se > 63:
            raise ValueError("bad spectral band")
        ac_t = scan[comps[0]["id"]][1]
        if ac_t not in huff_ac:
            raise ValueError("missing Huffman table")
        comps[0]["acT"] = huff_ac[ac_t]

    interleaved = len(comps) > 1
    mcux = frame["mcux"]
    if interleaved:
        total_units = mcux * frame["mcuy"]
    else:
        total_units = comps[0]["nbw"] * comps[0]["nbh"]

    seg_idx = 0
    bits = _Bits(segs[0])
    eobrun = 0
    for u in range(total_units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            bits = _Bits(segs[seg_idx])
            eobrun = 0
            for c in comps:
                c["pred"] = 0
        if interleaved:  # DC scan over MCUs
            my, mx = divmod(u, mcux)
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                        _dc_decode(bits, c, blk, ah, al)
        else:
            c = comps[0]
            byy, bxx = divmod(u, c["nbw"])
            blk = c["coef"][byy, bxx]
            if ss == 0:
                _dc_decode(bits, c, blk, ah, al)
            elif ah == 0:
                eobrun = _ac_first(bits, c, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(bits, c, blk, ss, se, al, eobrun)


def _prog_finish(np, frame, qt):
    """EOI reached: dequantize every accumulated block (zigzag ->
    natural scatter + per-band quant step, vectorized across the whole
    component), one batched IDCT, then the shared crop/upsample/color
    tail."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    prec = frame.get("prec", 8)
    center = float(1 << (prec - 1))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    zz = np.array(ZIGZAG)
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("missing quant table")
        q = np.asarray(qt[c["tq"]], dtype=np.float64)
        bh, bw = c["coef"].shape[:2]
        deq = c["coef"].astype(np.float64) * q  # zigzag space
        nat = np.zeros_like(deq)
        nat[:, :, zz] = deq
        blocks = nat.reshape(bh, bw, 8, 8)
        spat = _A.T @ blocks @ _A + center  # batched separable IDCT
        c["plane"] = spat.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _finish_planes(np, w, h, comps, hmax, vmax, prec)


def _decode_block(np, bits: _Bits, c) -> "object":
    coef = np.zeros(64, dtype=np.float64)
    s = _huff_decode(bits, c["dc"])
    if s > c.get("max_dc_s", 11):
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
    return _A.T @ f @ _A + c.get("center", 128.0)


def decode_jpeg(b: bytes):
    """("jpeg", HxW gray or HxWx3 RGB int64 array) for a supported
    baseline payload, else None — quarantine, never crash."""
    if not b or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    try:
        return _parse(b)
    except Exception:
        return None


# --- progressive encoder twin (T.81 G.1) ---------------------------------
#
# Spec-compliant SOF2 encoder used by the contract row and the decode
# tests: all-ones quant tables (the only loss is coefficient rounding,
# so 8x8-constant inputs round-trip EXACTLY — DC-only blocks), a
# libjpeg-style scan script (DC first with successive approximation,
# per-component AC spectral-selection scans, DC + AC refinement), EOBn
# run coding with buffered correction bits, optional restart markers.

#: all 12 DC magnitude symbols at code length 4 (Kraft 12/16 <= 1)
_E_DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_E_DC_VALS = bytes(range(12))
#: every (run, size) symbol incl. EOBn (r<<4) and ZRL at length 8
#: (176 codes, Kraft 176/256 <= 1)
_E_AC_VALS = bytes([(r << 4) | s for r in range(16) for s in range(11)])
_E_AC_BITS = bytes([0] * 7 + [len(_E_AC_VALS)] + [0] * 8)


def _enc_tables():
    dc = {v: lc for lc, v in _build_huffman(_E_DC_BITS, _E_DC_VALS).items()}
    ac = {v: lc for lc, v in _build_huffman(_E_AC_BITS, _E_AC_VALS).items()}
    return dc, ac


class _BitWriter:
    """MSB-first writer with T.81 byte stuffing; flush pads with 1s."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.write(1, 1)
        b = bytes(self.out)
        self.out = bytearray()
        return b


def _mag_bits(v: int) -> tuple[int, int]:
    """magnitude category + appended value bits per T.81 F.1.2.1."""
    s = 0 if v == 0 else v.bit_length() if v > 0 else (-v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _marker_seg(marker: int, payload: bytes) -> bytes:
    return (
        bytes([0xFF, marker])
        + struct.pack(">H", len(payload) + 2)
        + payload
    )


def _enc_quantized(px, luma_hv, prec: int = 8):
    """pixels -> per-component MCU-padded grids of zigzag-order
    quantized (all-ones table) coefficient lists, plus geometry.
    ``prec`` sets the level shift / chroma center to 2^(P-1)."""
    import numpy as np

    global _A
    if _A is None:
        _A = _idct_matrix()
    center = float(1 << (prec - 1))
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
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        lh, lv = luma_hv
        if (lh, lv) != (1, 1):
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
    comps = []
    for p, (ch, cv) in zip(planes, hv):
        bw, bh = mcux * ch, mcuy * cv
        pad = np.empty((bh * 8, bw * 8), dtype=np.float64)
        ph, pw = p.shape
        pad[:ph, :pw] = p
        pad[ph:, :pw] = p[ph - 1 : ph, :]
        pad[:, pw:] = pad[:, pw - 1 : pw]
        grid = [[None] * bw for _ in range(bh)]
        for by in range(bh):
            for bx in range(bw):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                f = _A @ (blk - center) @ _A.T
                q = np.round(f).astype(np.int64)
                grid[by][bx] = [int(q.flat[ZIGZAG[k]]) for k in range(64)]
        compw = (w * ch + hmax - 1) // hmax
        comph = (h * cv + vmax - 1) // vmax
        comps.append({
            "grid": grid, "h": ch, "v": cv,
            "nbw": (compw + 7) // 8, "nbh": (comph + 7) // 8,
        })
    return comps, hv, h, w, mcux, mcuy


def _rst_marker(rst_count: int) -> bytes:
    return bytes([0xFF, 0xD0 + rst_count % 8])


def _emit_dc_scan(out, comps, scan_comp_idx, mcux, mcuy, ah, al,
                  restart, dc_enc) -> None:
    """DC scan over the MCU grid (interleaved when len > 1; the single-
    component case traverses the same grid, which equals its own block
    grid when all sampling factors are 1)."""
    w_ = _BitWriter()
    preds = {ci: 0 for ci in scan_comp_idx}
    cnt = rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and cnt and cnt % restart == 0:
                out += w_.flush()
                out += _rst_marker(rst)
                rst += 1
                preds = {ci: 0 for ci in scan_comp_idx}
            for ci in scan_comp_idx:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = c["grid"][my * c["v"] + by][mx * c["h"] + bx][0]
                        if ah == 0:
                            vt = v >> al  # DC point transform: arith shift
                            s, bitsv = _mag_bits(vt - preds[ci])
                            ln, code = dc_enc[s]
                            w_.write(code, ln)
                            if s:
                                w_.write(bitsv, s)
                            preds[ci] = vt
                        else:
                            w_.write((v >> al) & 1, 1)
            cnt += 1
    out += w_.flush()


def _emit_ac_first_scan(out, c, ss, se, al, restart, ac_enc) -> None:
    w_ = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ln, code = ac_enc[r << 4]
            w_.write(code, ln)
            if r:
                w_.write(eobrun - (1 << r), r)
            eobrun = 0

    cnt = rst = 0
    for byy in range(c["nbh"]):
        for bxx in range(c["nbw"]):
            if restart and cnt and cnt % restart == 0:
                flush_eob()
                out += w_.flush()
                out += _rst_marker(rst)
                rst += 1
            zzv = c["grid"][byy][bxx]
            t = [
                (v >> al) if v >= 0 else -((-v) >> al)  # trunc toward 0
                for v in zzv
            ]
            if all(t[k] == 0 for k in range(ss, se + 1)):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
            else:
                flush_eob()
                r = 0
                for k in range(ss, se + 1):
                    if t[k] == 0:
                        r += 1
                        continue
                    while r > 15:
                        ln, code = ac_enc[0xF0]
                        w_.write(code, ln)
                        r -= 16
                    s, bitsv = _mag_bits(t[k])
                    ln, code = ac_enc[(r << 4) | s]
                    w_.write(code, ln)
                    w_.write(bitsv, s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            cnt += 1
    flush_eob()
    out += w_.flush()


def _emit_ac_refine_scan(out, c, ss, se, al, restart, ac_enc) -> None:
    """Encoder side of T.81 G.1.2.3 with libjpeg-style correction-bit
    buffering: bits for already-nonzero coefficients ride immediately
    after the symbol that crosses them, or with the next EOBn flush."""
    w_ = _BitWriter()
    eobrun = 0
    pending: list[int] = []  # correction bits owed at the next EOB flush

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            ln, code = ac_enc[r << 4]
            w_.write(code, ln)
            if r:
                w_.write(eobrun - (1 << r), r)
            for bit in pending:
                w_.write(bit, 1)
            pending = []
            eobrun = 0

    cnt = rst = 0
    for byy in range(c["nbh"]):
        for bxx in range(c["nbw"]):
            if restart and cnt and cnt % restart == 0:
                flush_eob()
                out += w_.flush()
                out += _rst_marker(rst)
                rst += 1
            zzv = c["grid"][byy][bxx]
            t = [abs(v) >> al for v in zzv]
            eob_pos = ss - 1  # position of the LAST newly-significant
            for k in range(ss, se + 1):
                if t[k] == 1:
                    eob_pos = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                tv = t[k]
                if tv == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_pos:
                    flush_eob()
                    ln, code = ac_enc[0xF0]
                    w_.write(code, ln)
                    r -= 16
                    for bit in br:
                        w_.write(bit, 1)
                    br = []
                if tv > 1:  # history coefficient: correction bit
                    br.append(tv & 1)
                    continue
                flush_eob()  # newly significant: run/1 + sign + bits
                ln, code = ac_enc[(r << 4) | 1]
                w_.write(code, ln)
                w_.write(1 if zzv[k] > 0 else 0, 1)
                for bit in br:
                    w_.write(bit, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
            cnt += 1
    flush_eob()
    out += w_.flush()


def encode_jpeg_progressive(
    px, luma_hv: tuple[int, int] = (1, 1), restart: int = 0,
    prec: int = 8,
) -> bytes:
    """Progressive (SOF2) JPEG with all-ones quant tables and a
    libjpeg-style scan script: DC first at Al=1 (interleaved), spectral-
    selection AC first scans at Al=1 per component, then DC and AC
    refinement passes to Al=0.  The coefficients equal the baseline
    test encoder's exactly (same DCT, same rounding), so progressive
    and baseline decodes of the same pixels are bit-identical —
    asserted by tests/test_jpeg_decode.py.  ``prec=12`` emits the
    12-bit progressive profile (T.81 Table B.2: 16-bit DQT, DC
    categories to 15 / AC to 14 — the _E12 tables)."""
    comps, hv, h, w, mcux, mcuy = _enc_quantized(px, luma_hv, prec=prec)
    if prec == 12:
        dc_enc = {
            v: lc
            for lc, v in _build_huffman(_E12_DC_BITS, _E12_DC_VALS).items()
        }
        # progressive needs every EOBn symbol (r<<4 with s==0), which
        # the sequential 12-bit table lacks beyond EOB/ZRL: use the
        # full (run, size<=14) grid at length 8 — 16*15=240 <= 256
        ac_vals = bytes([(r << 4) | s for r in range(16) for s in range(15)])
        ac_bits = bytes([0] * 7 + [len(ac_vals)] + [0] * 8)
        ac_enc = {
            v: lc for lc, v in _build_huffman(ac_bits, ac_vals).items()
        }
        dht_dc = bytes([0x00]) + _E12_DC_BITS + _E12_DC_VALS
        dht_ac = bytes([0x10]) + ac_bits + ac_vals
        dqt = bytes([0x10]) + b"".join(
            struct.pack(">H", 1) for _ in range(64)
        )
    else:
        dc_enc, ac_enc = _enc_tables()
        dht_dc = bytes([0x00]) + _E_DC_BITS + _E_DC_VALS
        dht_ac = bytes([0x10]) + _E_AC_BITS + _E_AC_VALS
        dqt = bytes([0x00]) + bytes([1] * 64)
    ncomp = len(comps)

    out = bytearray(b"\xff\xd8")
    out += _marker_seg(0xDB, dqt)
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (ch, cv) in enumerate(hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += _marker_seg(0xC2, sof)
    out += _marker_seg(0xC4, dht_dc)
    out += _marker_seg(0xC4, dht_ac)
    if restart:
        out += _marker_seg(0xDD, struct.pack(">H", restart))

    def sos(comp_ids, ss, se, ah, al):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        out.extend(_marker_seg(0xDA, hdr))

    all_ids = list(range(1, ncomp + 1))
    all_idx = list(range(ncomp))
    # 1) DC first, successive approximation Al=1
    sos(all_ids, 0, 0, 0, 1)
    _emit_dc_scan(out, comps, all_idx, mcux, mcuy, 0, 1, restart, dc_enc)
    # 2) AC first scans: spectral split for luma, full band for chroma
    ac_first = [(0, 1, 5)] + [(ci, 1, 63) for ci in range(1, ncomp)]
    ac_first += [(0, 6, 63)]
    for ci, ss_, se_ in ac_first:
        sos([ci + 1], ss_, se_, 0, 1)
        _emit_ac_first_scan(out, comps[ci], ss_, se_, 1, restart, ac_enc)
    # 3) DC refinement to full precision
    sos(all_ids, 0, 0, 1, 0)
    _emit_dc_scan(out, comps, all_idx, mcux, mcuy, 1, 0, restart, dc_enc)
    # 4) AC refinement to full precision, per component
    for ci in range(ncomp):
        sos([ci + 1], 1, 63, 1, 0)
        _emit_ac_refine_scan(out, comps[ci], 1, 63, 0, restart, ac_enc)
    out += b"\xff\xd9"
    return bytes(out)


# --- 12-bit extended-sequential encoder twin (T.81 Table B.2) -------------

#: all 16 DC magnitude symbols (12-bit DIFF reaches category 15) at
#: code length 5 (Kraft 16/32 <= 1)
_E12_DC_BITS = bytes([0, 0, 0, 0, 16] + [0] * 11)
_E12_DC_VALS = bytes(range(16))
#: EOB, ZRL and every (run, size) with size 1..14 (12-bit AC magnitude
#: cap per Table F.2) at length 8 — 226 codes, Kraft 226/256 <= 1
_E12_AC_VALS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_E12_AC_BITS = bytes([0] * 7 + [len(_E12_AC_VALS)] + [0] * 8)


def encode_jpeg_12bit(
    px, luma_hv: tuple[int, int] = (1, 1), restart: int = 0
) -> bytes:
    """12-bit extended-sequential (SOF1) JPEG with all-ones quant
    tables (written as a 16-bit DQT, which 12-bit requires) and a
    single interleaved scan — the encoder twin that pins the 12-bit
    decode path the way the baseline/progressive twins pin theirs.
    Samples are 0..4095; the only loss is coefficient rounding, so
    8x8-constant tiles round-trip EXACTLY.  Raises if a coefficient
    exceeds the T.81 12-bit magnitude caps (DC DIFF category 15 /
    AC 14) — unencodable, not silently clamped."""
    comps, hv, h, w, mcux, mcuy = _enc_quantized(px, luma_hv, prec=12)
    dc_enc = {
        v: lc for lc, v in _build_huffman(_E12_DC_BITS, _E12_DC_VALS).items()
    }
    ac_enc = {
        v: lc for lc, v in _build_huffman(_E12_AC_BITS, _E12_AC_VALS).items()
    }
    ncomp = len(comps)

    out = bytearray(b"\xff\xd8")
    # Pq=1: 16-bit table entries, all ones
    out += _marker_seg(
        0xDB, bytes([0x10]) + b"".join(struct.pack(">H", 1) for _ in range(64))
    )
    sof = bytes([12]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (ch, cv) in enumerate(hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += _marker_seg(0xC1, sof)
    out += _marker_seg(0xC4, bytes([0x00]) + _E12_DC_BITS + _E12_DC_VALS)
    out += _marker_seg(0xC4, bytes([0x10]) + _E12_AC_BITS + _E12_AC_VALS)
    if restart:
        out += _marker_seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _marker_seg(0xDA, sos)

    w_ = _BitWriter()
    preds = [0] * ncomp
    cnt = rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and cnt and cnt % restart == 0:
                out += w_.flush()
                out += _rst_marker(rst)
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["grid"][my * c["v"] + by][mx * c["h"] + bx]
                        s, bitsv = _mag_bits(zz[0] - preds[ci])
                        if s > 15:
                            raise ValueError("DC diff past 12-bit cap")
                        preds[ci] = zz[0]
                        ln, code = dc_enc[s]
                        w_.write(code, ln)
                        if s:
                            w_.write(bitsv, s)
                        run = 0
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_enc[0xF0]
                                w_.write(code, ln)
                                run -= 16
                            s, bitsv = _mag_bits(zz[k])
                            if s > 14:
                                raise ValueError("AC past 12-bit cap")
                            ln, code = ac_enc[(run << 4) | s]
                            w_.write(code, ln)
                            w_.write(bitsv, s)
                            run = 0
                        if run:
                            ln, code = ac_enc[0x00]
                            w_.write(code, ln)
            cnt += 1
    out += w_.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --- lossless (SOF3) encoder twin (T.81 Annex H) ---------------------------

#: all 17 lossless magnitude symbols (SSSS 0..16; 16 = the +32768
#: special) at code length 5 (Kraft 17/32 <= 1)
_E_LL_BITS = bytes([0, 0, 0, 0, 17] + [0] * 11)
_E_LL_VALS = bytes(range(17))


def encode_jpeg_lossless(px, predictor: int = 4, prec: int = 8) -> bytes:
    """Lossless (SOF3) JPEG: spatial DPCM with the selected T.81 H.1
    predictor (1-7), Huffman-coded modulo-65536 differences, Pt=0 —
    the encoder twin that pins the lossless decode path.  ``px`` is an
    HxW gray or HxWx3 array of 0..2^prec-1 samples; decode is EXACT
    (bit-for-bit), which is the point of the profile.  Components are
    stored without a color transform (3-component = RGB planes
    directly)."""
    import numpy as np

    if not 1 <= predictor <= 7:
        raise ValueError("predictor 1-7")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    planes = (
        [np.asarray(px, dtype=np.int64)]
        if gray
        else [np.asarray(px[:, :, k], dtype=np.int64) for k in range(3)]
    )
    ncomp = len(planes)
    default = 1 << (prec - 1)

    ll_enc = {
        v: lc for lc, v in _build_huffman(_E_LL_BITS, _E_LL_VALS).items()
    }
    out = bytearray(b"\xff\xd8")
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += _marker_seg(0xC3, sof)
    out += _marker_seg(0xC4, bytes([0x00]) + _E_LL_BITS + _E_LL_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah<<4|Al(Pt)=0
    out += _marker_seg(0xDA, sos)

    w_ = _BitWriter()
    for r in range(h):
        for col in range(w):
            for p in planes:
                pred = _lossless_predict(p, r, col, predictor, default)
                diff = (int(p[r][col]) - pred) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if diff == -32768:
                    # SSSS=16: +32768 == -32768 mod 2^16, no value bits
                    ln, code = ll_enc[16]
                    w_.write(code, ln)
                    continue
                s, bitsv = _mag_bits(diff)
                ln, code = ll_enc[s]
                w_.write(code, ln)
                if s:
                    w_.write(bitsv, s)
    out += w_.flush()
    out += b"\xff\xd9"
    return bytes(out)
