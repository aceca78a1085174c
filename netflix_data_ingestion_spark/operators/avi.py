"""Pure-stdlib AVI video decode (RIFF container, OpenDML/VfW layout).

Completes the real multimodal codec family across all three
modalities: images (netpbm/BMP/PNG/JPEG/GIF), audio (WAV PCM), and —
with this module — video, within the same honest-scope discipline:
formats a pure-Python decoder can truly handle are decoded FOR REAL,
everything else quarantines to None.

Scope:
- RIFF 'AVI ' container: hdrl (avih + the first 'vids' strl), movi
  LIST (direct or 'rec ' grouped), idx1 ignored (frames are read in
  stream order), junk/unknown chunks skipped, odd sizes padded;
- frame codecs:
  * BI_RGB uncompressed 24-bit DIB ('00db'/'00dc' chunks): bottom-up
    BGR rows, 4-byte row stride — decoded exactly (lossless, so the
    multimodal_avi_frames contract query can hash-check the whole
    container round-trip against SQL);
  * MJPG ('MJPG' compression): every frame is a baseline JPEG,
    decoded by operators/jpeg.py's own Huffman+IDCT path — a REAL
    compressed-video profile with zero new codec code.

Quarantined -> None, never an error: any other compression
(DivX/XviD/H.264 need real codec libraries — the honest stop), 8/16/32
bpp DIBs, truncated chunks, frames disagreeing with the declared
geometry, and payloads whose width x height x frames exceeds the
shared 64M-pixel bomb cap.

``encode_avi`` (BI_RGB writer) is the synthesis/test twin, like
audio.encode_wav and gif.encode_gif.
"""

from __future__ import annotations

import struct

import numpy as np

#: shared with the PNG/JPEG/GIF paths
BOMB_CAP_PIXELS = 1 << 26


def _chunks(b: bytes, pos: int, end: int):
    """Iterate (fourcc, body, next_pos) over a RIFF chunk range."""
    while pos + 8 <= end:
        fcc = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError("avi: truncated chunk")
        yield fcc, body_start, size
        pos = body_start + size + (size & 1)


def _decode_dib24(body: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(body) < stride * h:
        raise ValueError("avi: short DIB frame")
    rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(
        h, stride
    )[:, : w * 3].reshape(h, w, 3)
    # bottom-up BGR -> top-down RGB
    return rows[::-1, :, ::-1].copy()


def _parse_avi(b: bytes):
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    end = len(b)
    width = height = None
    compression = None
    frames: list[np.ndarray] = []
    total_px = 0

    def handle_frame(body: bytes):
        nonlocal total_px
        from netflix_data_ingestion_spark.operators.jpeg import decode_jpeg

        if width is None or height is None:
            raise ValueError("avi: frame before header")
        total_px += width * height
        if total_px > BOMB_CAP_PIXELS:
            raise ValueError("avi: bomb cap")
        if compression == 0:  # BI_RGB
            frames.append(_decode_dib24(body, width, height))
            return
        # MJPG: each frame is a standalone baseline JPEG
        got = decode_jpeg(body)
        if got is None:
            raise ValueError("avi: MJPG frame failed to decode")
        _, px = got
        if px.ndim == 2:
            px = np.stack([px] * 3, axis=2)
        if px.shape[0] != height or px.shape[1] != width:
            raise ValueError("avi: MJPG frame geometry mismatch")
        frames.append(px)

    def walk(pos: int, limit: int):
        nonlocal width, height, compression
        for fcc, body_start, size in _chunks(b, pos, limit):
            body_end = body_start + size
            if fcc == b"LIST":
                walk(body_start + 4, body_end)  # skip list type fourcc
                continue
            if fcc == b"strf" and width is None and size >= 40:
                (
                    _bisz,
                    biw,
                    bih,
                    _planes,
                    bitcount,
                    comp,
                ) = struct.unpack_from("<IiiHHI", b, body_start)
                if comp == 0:
                    if bitcount != 24:
                        raise ValueError("avi: only 24-bit BI_RGB DIBs")
                elif comp not in (
                    struct.unpack("<I", b"MJPG")[0],
                    struct.unpack("<I", b"mjpg")[0],
                ):
                    raise ValueError("avi: unsupported compression")
                if biw <= 0 or bih <= 0:
                    raise ValueError("avi: bad geometry")
                width, height, compression = biw, bih, comp
                continue
            if fcc[2:4] in (b"db", b"dc") and fcc[:2].isdigit():
                handle_frame(b[body_start:body_end])

    # top level: RIFF body starts at 12 with the 'AVI ' type consumed
    walk(12, end)
    if not frames:
        return None
    return {"width": width, "height": height, "frames": frames}


def decode_avi(b: bytes):
    """Public decoder: AVI bytes -> dict(width, height,
    frames=[HxWx3 uint8 RGB]) for BI_RGB-24 or MJPG streams — or None
    for anything corrupt or outside the profile (broad-except
    quarantine, like decode_jpeg/decode_wav/decode_gif)."""
    try:
        return _parse_avi(bytes(b))
    except Exception:  # noqa: BLE001 — untrusted payload, quarantine
        return None


def encode_avi(frames, fps: int = 25) -> bytes:
    """Minimal spec-compliant AVI writer: one BI_RGB 24-bit 'vids'
    stream, one '00db' chunk per frame (bottom-up BGR, 4-byte row
    stride), no index.  ``frames`` is a list of HxWx3 uint8 RGB
    arrays of one geometry — the synthesis/test twin."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes per sec
        0,
        0x10,  # AVIF_HASINDEX off; flags minimal
        len(frames),
        0,
        1,  # one stream
        frame_bytes,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + b"DIB "
        # flags, prio, lang, initialFrames, scale, rate, start, length,
        # bufsize, quality, sampleSize (56-byte strh with rcFrame below)
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(frames), frame_bytes, 0, 0,
        )
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    for f in frames:
        bgr_bottom_up = f[::-1, :, ::-1]
        if stride != w * 3:
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, : w * 3] = bgr_bottom_up.reshape(h, w * 3)
            body = padded.tobytes()
        else:
            body = bgr_bottom_up.tobytes()
        movi_body += chunk(b"00db", body)
    movi = chunk(b"LIST", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
