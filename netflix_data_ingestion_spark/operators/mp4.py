"""Pure-stdlib MP4/MOV video decode (ISO Base Media File Format).

Completes the video-container family the AVI/RIFF walk started
(operators/avi.py): the other container a real pipeline meets for the
video column, within the same honest-scope discipline — profiles a
pure-Python decoder can truly handle are decoded FOR REAL, everything
else quarantines to None.

Scope:
- ISO BMFF box walk: 32-bit sizes, 64-bit ``largesize`` (size==1),
  size==0 (to end of enclosing box), unknown boxes skipped; the video
  ``trak`` is the first one whose ``hdlr`` handler_type is 'vide';
- sample tables: ``stsd`` (first sample entry's fourcc + geometry),
  ``stsz`` (uniform or per-sample sizes), ``stsc`` (sample-to-chunk
  runs), ``stco``/``co64`` (32/64-bit chunk offsets) — samples are
  located exactly the way a spec-compliant demuxer does, not by
  scanning ``mdat``;
- sample codecs:
  * 'raw ' (QuickTime uncompressed RGB, depth 24): each sample is
    width*height*3 top-down packed RGB — decoded exactly (lossless,
    so the multimodal_mp4_frames contract query hash-checks the whole
    container round-trip against SQL);
  * 'jpeg' / 'mjpa' (QuickTime Motion-JPEG): every sample is a
    baseline JPEG, decoded by operators/jpeg.py's own Huffman+IDCT
    path — a REAL compressed-video profile with zero new codec code.

Quarantined -> None, never an error: any other sample entry ('avc1',
'hvc1', 'mp4v', ... need real codec libraries — the honest stop),
depths other than 24 for 'raw ', truncated boxes or samples, samples
disagreeing with the declared geometry, and payloads whose total
decoded pixels exceed the shared 64M-pixel bomb cap.

``encode_mp4`` (the 'raw ' writer) is the synthesis/test twin, like
avi.encode_avi / gif.encode_gif / audio.encode_wav;
``encode_mp4_samples`` writes arbitrary pre-encoded samples under any
sample-entry fourcc (the MJPEG test path).
"""

from __future__ import annotations

import struct

import numpy as np

#: shared with the PNG/JPEG/GIF/AVI paths
BOMB_CAP_PIXELS = 1 << 26

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(b: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, box_end) over a box range."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        fcc = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4: bad box size")
        yield fcc, pos + hdr, pos + size
        pos += size


def _collect(b: bytes, pos: int, end: int, out: dict) -> None:
    """Recursively index leaf boxes by fourcc (containers descended)."""
    for fcc, body, box_end in _boxes(b, pos, end):
        if fcc in _CONTAINERS:
            if fcc == b"trak":
                out.setdefault(b"trak", []).append((body, box_end))
            else:
                _collect(b, body, box_end, out)
        elif fcc not in out:
            out[fcc] = (body, box_end)


def _u32s(b: bytes, pos: int, n: int) -> list[int]:
    return list(struct.unpack_from(f">{n}I", b, pos))


def _sample_sizes(b: bytes, stsz: tuple[int, int]) -> list[int]:
    body, _end = stsz
    uniform, count = struct.unpack_from(">II", b, body + 4)
    if uniform:
        return [uniform] * count
    return _u32s(b, body + 12, count)


def _chunk_offsets(b: bytes, tables: dict) -> list[int]:
    if b"stco" in tables:
        body, _ = tables[b"stco"]
        (count,) = struct.unpack_from(">I", b, body + 4)
        return _u32s(b, body + 8, count)
    body, _ = tables[b"co64"]
    (count,) = struct.unpack_from(">I", b, body + 4)
    return list(struct.unpack_from(f">{count}Q", b, body + 8))


def _stsc_runs(b: bytes, stsc: tuple[int, int]) -> list[tuple[int, int]]:
    """[(first_chunk, samples_per_chunk), ...] in table order."""
    body, _ = stsc
    (count,) = struct.unpack_from(">I", b, body + 4)
    return [
        (e[0], e[1])
        for e in struct.iter_unpack(
            ">III", b[body + 8 : body + 8 + 12 * count]
        )
    ]


def _extract_samples(b: bytes, tables: dict) -> list[bytes]:
    """Demux sample payloads via stsz + stsc + stco/co64 — the
    spec-defined sample location, chunk by chunk."""
    sizes = _sample_sizes(b, tables[b"stsz"])
    offsets = _chunk_offsets(b, tables)
    runs = _stsc_runs(b, tables[b"stsc"])
    if not runs or runs[0][0] != 1:
        raise ValueError("mp4: stsc must start at chunk 1")
    samples: list[bytes] = []
    k = 0
    for ci in range(1, len(offsets) + 1):
        spc = next(
            run[1] for run in reversed(runs) if run[0] <= ci
        )
        pos = offsets[ci - 1]
        for _ in range(spc):
            if k >= len(sizes):
                break
            size = sizes[k]
            if pos + size > len(b):
                raise ValueError("mp4: sample beyond file end")
            samples.append(b[pos : pos + size])
            pos += size
            k += 1
    if k != len(sizes):
        raise ValueError("mp4: chunk tables cover too few samples")
    return samples


def _parse_mp4(b: bytes):
    top: dict = {}
    _collect(b, 0, len(b), top)
    if b"trak" not in top:
        return None
    for body, box_end in top[b"trak"]:
        tables: dict = {}
        _collect(b, body, box_end, tables)
        hdlr = tables.get(b"hdlr")
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stsd = tables.get(b"stsd")
        if stsd is None or not all(
            t in tables for t in (b"stsz", b"stsc")
        ) or not (b"stco" in tables or b"co64" in tables):
            raise ValueError("mp4: video trak missing sample tables")
        entry = stsd[0] + 8  # skip ver/flags + entry_count
        fourcc = b[entry + 4 : entry + 8]
        width, height = struct.unpack_from(">HH", b, entry + 32)
        (depth,) = struct.unpack_from(">H", b, entry + 82)
        if width <= 0 or height <= 0:
            raise ValueError("mp4: bad geometry")
        samples = _extract_samples(b, tables)
        if not samples:
            return None
        if len(samples) * width * height > BOMB_CAP_PIXELS:
            raise ValueError("mp4: bomb cap")
        frames: list[np.ndarray] = []
        if fourcc == b"raw ":
            if depth != 24:
                raise ValueError("mp4: only depth-24 'raw ' samples")
            nbytes = width * height * 3
            for s in samples:
                if len(s) != nbytes:
                    raise ValueError("mp4: raw sample size mismatch")
                frames.append(
                    np.frombuffer(s, dtype=np.uint8).reshape(
                        height, width, 3
                    )
                )
        elif fourcc in (b"jpeg", b"mjpa"):
            from netflix_data_ingestion_spark.operators.jpeg import (
                decode_jpeg,
            )

            for s in samples:
                got = decode_jpeg(s)
                if got is None:
                    raise ValueError("mp4: MJPEG sample failed to decode")
                _, px = got
                if px.ndim == 2:
                    px = np.stack([px] * 3, axis=2)
                if px.shape[0] != height or px.shape[1] != width:
                    raise ValueError("mp4: MJPEG sample geometry mismatch")
                frames.append(px.astype(np.uint8))
        else:
            raise ValueError("mp4: unsupported sample entry")
        return {"width": int(width), "height": int(height), "frames": frames}
    return None


def decode_mp4(b: bytes):
    """Public decoder: MP4/MOV bytes -> dict(width, height,
    frames=[HxWx3 uint8 RGB]) for 'raw '-24 or MJPEG video traks — or
    None for anything corrupt or outside the profile (broad-except
    quarantine, like decode_avi/decode_jpeg/decode_gif)."""
    try:
        return _parse_mp4(bytes(b))
    except Exception:  # noqa: BLE001 — untrusted payload, quarantine
        return None


def _box(fcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fcc + body


def _full(fcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fcc, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4_samples(
    samples: list[bytes],
    width: int,
    height: int,
    sample_type: bytes = b"raw ",
    fps: int = 25,
    depth: int = 24,
) -> bytes:
    """Minimal spec-compliant ISO BMFF writer: one video trak whose
    samples are ``samples`` verbatim under sample-entry ``sample_type``
    — single chunk, full stsd/stts/stsc/stsz/stco tables, moov after
    mdat so chunk offsets are exact."""
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat = _box(b"mdat", b"".join(samples))
    first_sample_off = len(ftyp) + 8  # mdat header is 8 bytes

    entry = (
        struct.pack(">I", 86)
        + sample_type
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved / vendor / qualities
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)  # dataSize
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", depth, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    sizes = [len(s) for s in samples]
    if len(set(sizes)) == 1:
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", sizes[0], n))
    else:
        stsz = _full(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
        )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")  # self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00"
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0),  # lang 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        3,  # enabled + in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, n)
        + b"\x00" * 16
        + _IDENTITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _IDENTITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


_IDENTITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4(frames, fps: int = 25) -> bytes:
    """The lossless synthesis/test twin: HxWx3 uint8 RGB frames as
    QuickTime 'raw ' depth-24 samples (top-down packed RGB)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    return encode_mp4_samples(
        [f.tobytes() for f in frames], w, h, b"raw ", fps
    )
