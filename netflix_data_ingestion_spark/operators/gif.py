"""Pure-stdlib GIF87a/GIF89a decode (W3C/CompuServe spec, LZW).

Fifth member of the real multimodal codec family (netpbm/BMP/PNG/
baseline-JPEG, operators/multimodal.py + jpeg.py) and the first
MULTI-FRAME one: an animated GIF decodes to the full composited frame
sequence, which makes the frame-sampling plumbing
(multimodal.frame_sample_stub) REAL — see ``gif_frame_stats``.

No image library: struct + numpy only.  Scope:
- GIF87a and GIF89a, global and local color tables;
- LZW image data (variable 3..12-bit codes, LSB-first packing,
  clear/end codes, deferred-clear dictionaries at 4096 entries);
- interlaced frames (the 8/8/4/2 four-pass row order);
- animation compositing on the logical screen: Graphic Control
  Extension disposal methods 0/1 (leave), 2 (restore background),
  3 (restore previous), and transparency indices;
- extension blocks skipped per spec (application/comment/plain text).

Quarantined -> None, never an error (the untrusted-payload contract):
truncated streams, LZW code overruns, frames past the logical screen,
missing color tables, and payloads whose total decoded pixel count
(width x height x frames) exceeds the 64M-pixel bomb cap shared with
the PNG/JPEG paths.

The matching ``encode_gif`` (global-palette LZW writer) lives here —
like audio.encode_wav it is both the unit-test oracle's counterpart
and the synthesis side of the hash-checked end-to-end contract query
(multimodal_gif_frames): if either direction of the codec drifts from
spec, the round-trip breaks a DuckDB-checked value hash.
"""

from __future__ import annotations

import struct

import numpy as np

#: decline payloads whose declared width*height*frames exceeds this
#: (the PNG/JPEG decompression-bomb cap)
BOMB_CAP_PIXELS = 1 << 26


# ---------------------------------------------------------------------------
# LZW codec (GIF flavor: LSB-first bit packing, no early width change)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, mcs: int, max_pixels: int) -> bytearray:
    """GIF LZW: variable-width codes starting at mcs+1 bits, clear code
    2^mcs, end code clear+1; the dictionary grows by one entry per
    decoded code and the width bumps when the NEXT code number reaches
    2^width (capped at 12 — past 4096 entries the dict freezes until
    the encoder sends a clear)."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    # dict as a list: index -> bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        byte_idx = bitpos >> 3
        chunk = int.from_bytes(data[byte_idx : byte_idx + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("lzw: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("lzw: code beyond table")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("lzw: output exceeds declared pixels")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """The encoder twin (test oracle + synthesis side): standard GIF
    LZW with the no-early-change width rule — the width bumps when the
    next code to be ASSIGNED passes the current ceiling, mirroring the
    decoder's post-add check."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bits: list[tuple[int, int]] = [(clear, width)]
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        bits.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # decoder bumps width when ITS table hits 2^width after
            # adding; its table trails ours by one add at emit time,
            # so we bump when next_code passes the ceiling + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            # table frozen; reset (simplest correct policy)
            bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        w = bytes([k])
    if w:
        bits.append((table[w], width))
    bits.append((end, width))
    out = bytearray()
    acc = 0
    nbits = 0
    for code, cw in bits:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [
        r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
    ]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a data sub-block chain starting at pos; returns
    (data, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(b):
            raise ValueError("gif: truncated sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(b):
            raise ValueError("gif: truncated sub-block")
        chunks.append(b[pos : pos + n])
        pos += n


def _parse_gif(b: bytes):
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        if gct.shape[0] != n:
            return None
        pos += 3 * n
    if sw == 0 or sh == 0:
        return None
    # canvas starts at the background color (or black without a GCT)
    if gct is not None and bg_idx < gct.shape[0]:
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic control state
    transparent: int | None = None
    disposal = 0
    delay_cs = 0
    total_px = 0
    while True:
        if pos >= len(b):
            raise ValueError("gif: missing trailer")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("gif: truncated extension")
            label = b[pos]
            pos += 1
            data, pos = _sub_blocks(b, pos)
            if label == 0xF9 and len(data) >= 4:
                gflags, delay_cs = struct.unpack_from("<BH", data, 0)
                disposal = (gflags >> 2) & 0x07
                transparent = data[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:  # image descriptor is all that remains
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("gif: frame outside logical screen")
        total_px += w * h
        if total_px > BOMB_CAP_PIXELS:
            raise ValueError("gif: bomb cap")
        palette = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                b[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            if palette.shape[0] != n:
                raise ValueError("gif: truncated local color table")
            pos += 3 * n
        if palette is None:
            raise ValueError("gif: frame without color table")
        if pos >= len(b):
            raise ValueError("gif: truncated before LZW")
        mcs = b[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("gif: bad LZW min code size")
        data, pos = _sub_blocks(b, pos)
        idx = _lzw_decode(data, mcs, w * h)
        if len(idx) < w * h:
            raise ValueError("gif: short frame data")
        rows = np.frombuffer(
            bytes(idx[: w * h]), dtype=np.uint8
        ).reshape(h, w)
        if iflags & 0x40:
            rows = _deinterlace(rows)
        if int(rows.max()) >= palette.shape[0]:
            raise ValueError("gif: index outside palette")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = palette[rows]
        if transparent is not None:
            mask = rows != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(int(delay_cs))
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent = None
        disposal = 0
        delay_cs = 0
    if not frames:
        return None
    return {"width": sw, "height": sh, "frames": frames, "delays": delays}


def decode_gif(b: bytes):
    """Public decoder: GIF bytes -> dict(width, height,
    frames=[HxWx3 uint8 composited canvases], delays=[centiseconds])
    — or None for anything corrupt or outside the supported profile
    (broad-except quarantine, like decode_jpeg/decode_wav)."""
    try:
        return _parse_gif(bytes(b))
    except Exception:  # noqa: BLE001 — untrusted payload, quarantine
        return None


def encode_gif(
    frames,
    palette,
    delays=None,
    interlace: bool = False,
    bg_index: int = 0,
) -> bytes:
    """Minimal spec-compliant GIF89a writer: one global color table,
    full-screen frames of palette indices (each HxW uint8), optional
    interlacing, per-frame delay GCEs.  ``palette`` is Nx3 uint8 with
    N a power of two >= 2."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    palette = np.asarray(palette, dtype=np.uint8)
    n = palette.shape[0]
    depth = max(1, (n - 1).bit_length())
    if n != (1 << depth):
        raise ValueError("palette size must be a power of two")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), bg_index, 0)
    out += palette.tobytes()
    mcs = max(2, depth)
    for i, f in enumerate(frames):
        delay = 0 if delays is None else int(delays[i])
        out += b"\x21\xf9" + bytes([4]) + struct.pack("<BH", 0, delay)
        out += bytes([0, 0])  # transparent idx (unused) + terminator
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        rows = f
        if interlace:
            order = [
                r
                for start, step in _INTERLACE_PASSES
                for r in range(start, h, step)
            ]
            rows = f[order]
        out += bytes([mcs])
        data = _lzw_encode(rows.tobytes(), mcs)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
