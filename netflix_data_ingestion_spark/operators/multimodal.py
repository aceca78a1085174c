"""Multimodal column plumbing — beyond-reference (BASELINE.json north star).

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata.  The Spark-side plumbing — schemas, per-row metadata
extraction, Arrow-batched ``mapInPandas`` decode/feature stages — is real
and tested.  Formats that need no codec library are decoded FOR REAL
in pure numpy: ``decode_real_features`` (netpbm P5/P6, uncompressed
24-bit BMP, PNG via stdlib zlib, baseline-sequential JPEG via
operators/jpeg.py's own Huffman+IDCT, and animated GIF87a/89a via
operators/gif.py's own LZW + frame compositing -> integer luma stats
+ 8x8 perceptual aHash), ``gif_frame_stats`` (REAL multi-frame
sampling: one row per composited frame), and ``resize_real`` (integer
box-average downsample + netpbm re-encode).
Library-needing formats (lossy video codecs beyond MJPEG) remain
honestly stubbed (progressive JPEG decodes REAL as of round 10 —
operators/jpeg.py SOF2 multi-scan path):
``decode_stub_features``/``frame_sample_stub``/``resize_stub`` derive
deterministic pseudo-features so batch shape / schema / partitioning
are exercised end-to-end, and raise ``NotImplementedError`` when asked
for a real decode this environment cannot perform.

At 100 TB: binary payloads make row groups large — ingest should set
``spark.sql.files.maxPartitionBytes`` with payload size in mind, and
feature extraction is a ``mapInPandas`` over Arrow batches (payloads
never pass through Python row-by-row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Demo ingest: treat a text column's UTF-8 bytes as an opaque payload
    and attach the typed metadata columns of MEDIA_SCHEMA."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("feature_norm", T.DoubleType(), True),
    ]
)


def decode_stub_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched 'decode + feature extract' stage over MEDIA_SCHEMA rows.

    ``real_decode=True`` raises NotImplementedError (no media libs in this
    container); the stub derives deterministic pseudo-features from the
    payload bytes so batch shape / schema / partitioning are exercised.
    """
    if real_decode:
        raise NotImplementedError(
            "real media decode of library-needing formats (lossy video "
            "codecs beyond MJPEG, ...) is unavailable in this "
            "environment; use decode_real_features for netpbm/BMP/PNG/"
            "baseline-or-progressive-JPEG/GIF payloads, or wire "
            "PIL/torchaudio here on a real cluster"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            # deterministic fake dimensions from payload length
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": (n_bytes % 1920 + 1).astype("int32"),
                    "fake_height": (n_bytes % 1080 + 1).astype("int32"),
                    "feature_norm": (n_bytes.astype("float64") ** 0.5),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-SQL metadata projection over a MEDIA_SCHEMA frame (oracle-able)."""
    return df.select(
        "media_id",
        "media_type",
        "n_bytes",
        "sha256",
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset", T.LongType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)

_FRAME_STRIDE = 256
_MAX_FRAMES = 8


def frame_sample_stub(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched 'video frame sampling' over MEDIA_SCHEMA rows.

    A real implementation would demux the container and decode I-frames
    (``real_decode=True`` raises — no codec libraries in this
    environment); the stub samples deterministic byte windows so the
    one-row-in / many-rows-out ``mapInPandas`` plumbing (schema, batch
    fan-out, partitioning) is exercised and oracle-checkable:
    min(8, max(1, n_bytes // 256)) frames per payload, frame i covering
    bytes [i*256, i*256 + min(256, n_bytes - i*256)), fingerprinted by
    md5.  Fan-out happens inside the Arrow batch — no explode shuffle.
    """
    if real_decode:
        raise NotImplementedError(
            "real frame sampling requires video codec libraries not "
            "present in this environment; wire pyav/ffmpeg here on a "
            "real cluster"
        )
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_offset": [],
                "frame_len": [],
                "frame_md5": [],
            }
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = b"" if payload is None else bytes(payload)
                n = len(b)
                n_frames = min(_MAX_FRAMES, max(1, n // _FRAME_STRIDE))
                for i in range(n_frames):
                    off = i * _FRAME_STRIDE
                    ln = min(_FRAME_STRIDE, n - off)
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_len"].append(ln)
                    out["frame_md5"].append(
                        hashlib.md5(b[off : off + ln]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("delay_cs", T.IntegerType(), True),
        T.StructField("mean_luma_milli", T.LongType(), True),
        T.StructField("ahash64", T.StringType(), True),
    ]
)


def gif_frame_batches(
    id_col: str = "media_id", payload_col: str = "payload"
):
    """Iterator->iterator form of ``gif_frame_stats``' decode stage,
    exposed so synth+decode contract rows can FUSE into one
    ``mapInPandas`` (guide §4.1: the payload then never crosses the
    JVM boundary between stages — the audio.wav_feature_frame move)."""
    from netflix_data_ingestion_spark.operators.gif import decode_gif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "n_frames": [],
                "frame_idx": [],
                "width": [],
                "height": [],
                "delay_cs": [],
                "mean_luma_milli": [],
                "ahash64": [],
            }
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                got = decode_gif(b"" if payload is None else bytes(payload))
                if got is None:
                    out["media_id"].append(media_id)
                    for k in (
                        "n_frames",
                        "frame_idx",
                        "width",
                        "height",
                        "delay_cs",
                        "mean_luma_milli",
                        "ahash64",
                    ):
                        out[k].append(None)
                    continue
                n = len(got["frames"])
                for i, (canvas, delay) in enumerate(
                    zip(got["frames"], got["delays"])
                ):
                    luma = _luma(canvas)
                    h, w = luma.shape
                    out["media_id"].append(media_id)
                    out["n_frames"].append(n)
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["delay_cs"].append(delay)
                    out["mean_luma_milli"].append(int(luma.sum()) // (w * h))
                    out["ahash64"].append(_ahash64(luma))
            yield pd.DataFrame(out).astype(
                {
                    "media_id": "int64",
                    "n_frames": "Int32",
                    "frame_idx": "Int32",
                    "width": "Int32",
                    "height": "Int32",
                    "delay_cs": "Int32",
                    "mean_luma_milli": "Int64",
                }
            )

    return batches


def gif_frame_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL frame sampling: decode an animated GIF (operators/gif.py,
    pure-stdlib LZW) and emit one row per COMPOSITED frame — exact
    integer Rec.601 mean luma and the 8x8 aHash of each canvas, plus
    the per-frame delay.  The genuine version of the one-row-in /
    many-rows-out plumbing frame_sample_stub exercises for
    library-needing containers: fan-out happens inside the Arrow
    batch, no explode shuffle.  Non-GIF / corrupt payloads yield one
    NULL-stats row (quarantine-not-crash)."""
    return df.mapInPandas(
        gif_frame_batches(id_col, payload_col), GIF_FRAME_SCHEMA
    )


AVI_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma_milli", T.LongType(), True),
        T.StructField("ahash64", T.StringType(), True),
    ]
)


def avi_frame_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL video frame sampling: decode an AVI (operators/avi.py —
    BI_RGB 24-bit DIB or MJPG-over-operators/jpeg.py) and emit one row
    per frame with exact integer Rec.601 mean luma and the 8x8 aHash —
    the video twin of gif_frame_stats, fan-out inside the Arrow batch.
    Non-AVI / corrupt / unsupported-codec payloads yield one NULL-stats
    row (quarantine-not-crash)."""
    from netflix_data_ingestion_spark.operators.avi import decode_avi

    return _video_frame_stats(df, decode_avi, id_col, payload_col)


def mp4_frame_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """avi_frame_stats for the ISO BMFF container (operators/mp4.py —
    QuickTime 'raw ' depth-24 exact, or MJPEG samples through
    operators/jpeg.py): same per-frame schema, same Arrow fan-out,
    same NULL-row quarantine for payloads outside the profile."""
    from netflix_data_ingestion_spark.operators.mp4 import decode_mp4

    return _video_frame_stats(df, decode_mp4, id_col, payload_col)


def video_frame_batches(decoder, id_col: str, payload_col: str):
    """Iterator->iterator form of the AVI/MP4 frame-stats decode stage
    (see ``gif_frame_batches`` for why it is exposed)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "n_frames": [],
                "frame_idx": [],
                "width": [],
                "height": [],
                "mean_luma_milli": [],
                "ahash64": [],
            }
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                got = decoder(b"" if payload is None else bytes(payload))
                if got is None:
                    out["media_id"].append(media_id)
                    for k in (
                        "n_frames",
                        "frame_idx",
                        "width",
                        "height",
                        "mean_luma_milli",
                        "ahash64",
                    ):
                        out[k].append(None)
                    continue
                n = len(got["frames"])
                for i, frame in enumerate(got["frames"]):
                    luma = _luma(frame)
                    h, w = luma.shape
                    out["media_id"].append(media_id)
                    out["n_frames"].append(n)
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_luma_milli"].append(int(luma.sum()) // (w * h))
                    out["ahash64"].append(_ahash64(luma))
            yield pd.DataFrame(out).astype(
                {
                    "media_id": "int64",
                    "n_frames": "Int32",
                    "frame_idx": "Int32",
                    "width": "Int32",
                    "height": "Int32",
                    "mean_luma_milli": "Int64",
                }
            )

    return batches


def _video_frame_stats(
    df: DataFrame, decoder, id_col: str, payload_col: str
) -> DataFrame:
    return df.mapInPandas(
        video_frame_batches(decoder, id_col, payload_col), AVI_FRAME_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
    ]
)


def resize_stub(
    df: DataFrame, max_width: int = 256, max_height: int = 256,
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched 'image resize' over MEDIA_SCHEMA rows.

    The stub truncates the payload proportionally to the fake resize
    ratio (keeping the binary-in / binary-out plumbing honest) and
    recomputes n_bytes/sha256 on the new payload; ``real_decode=True``
    raises (no image libraries in this environment).
    """
    if real_decode:
        raise NotImplementedError(
            "use resize_real for netpbm/BMP payloads (pure-numpy box "
            "resample); other formats require an image library not present in this "
            "environment; wire PIL here on a real cluster"
        )
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA}
            for media_id, payload, mt in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                b = b"" if payload is None else bytes(payload)
                n = len(b)
                # fake source dims (same derivation as decode_stub_features)
                w, h = n % 1920 + 1, n % 1080 + 1
                scale = min(max_width / w, max_height / h, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                nb = max(1, int(n * scale)) if n else 0
                out = b[:nb]
                rows["media_id"].append(media_id)
                rows["payload"].append(out)
                rows["media_type"].append(mt)
                rows["n_bytes"].append(len(out))
                rows["sha256"].append(hashlib.sha256(out).hexdigest())
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, RESIZE_SCHEMA)


def phash_stub(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash64) — 64-bit hex fingerprint per payload: the slot a
    REAL perceptual hash (DCT pHash / aHash over the decoded image)
    plugs into.  In this environment the decode is stubbed (no media
    libs — same honesty as ``decode_stub_features``), so the stand-in
    is md5-derived: exact-duplicate payloads collide at Hamming 0 and
    every downstream JOIN mechanic is exercised for real; a true pHash
    additionally places near-identical IMAGES within small Hamming
    distance, changing only this one projection.
    """
    return media.select(
        F.col(id_col),
        F.substring(F.md5(F.col(payload_col)), 1, 16).alias("phash64"),
    )


def phash_near_dup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) — media pairs whose perceptual fingerprints
    differ in <= ``max_hamming`` bits: the IMAGE near-dup path of the
    dedup ladder, sharing the 4-block pigeonhole join with SimHash
    (``dedup.hamming_pairs_64`` — the recall guarantee belongs to the
    join, not the fingerprint family).  Payload bytes never shuffle:
    only (id, 16-hex) fingerprints enter the join.
    """
    from netflix_data_ingestion_spark.operators.dedup import (
        hamming_pairs_64,
    )

    fps = phash_stub(media, id_col, payload_col).localCheckpoint(eager=True)
    return hamming_pairs_64(fps, id_col, "phash64", max_hamming)


# ---------------------------------------------------------------------------
# Real decode: pure-numpy parsers for container-free tiny formats.  No
# media libraries exist in this environment, but PPM/PGM (netpbm) and
# uncompressed 24-bit BMP need none — so ONE real decode path is live,
# tested code rather than a stub: header parse -> numpy pixel array ->
# exact integer luminance stats + an 8x8 average-hash (aHash), the real
# perceptual fingerprint phash_stub's md5 stands in for.
# ---------------------------------------------------------------------------

REAL_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), True),  # ppm|pgm|bmp|NULL
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma_milli", T.LongType(), True),
        T.StructField("ahash64", T.StringType(), True),
    ]
)


def _decode_netpbm(b: bytes):
    """P6 (RGB) / P5 (gray) binary netpbm -> (codec, 8-bit pixel array:
    HxW gray or HxWx3 RGB, int64).  Returns None when the payload isn't
    valid netpbm."""
    import numpy as np

    if len(b) < 2 or b[0:1] != b"P" or b[1:2] not in (b"5", b"6"):
        return None
    codec = "pgm" if b[1:2] == b"5" else "ppm"
    # header = magic + 3 ASCII ints (w, h, maxval) separated by
    # whitespace/comments, terminated by ONE whitespace byte
    vals, i, n = [], 2, len(b)
    while len(vals) < 3:
        while i < n and (b[i : i + 1].isspace() or b[i : i + 1] == b"#"):
            if b[i : i + 1] == b"#":  # comment to end of line
                while i < n and b[i : i + 1] != b"\n":
                    i += 1
            i += 1
        j = i
        while j < n and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        vals.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        return None
    ch = 1 if codec == "pgm" else 3
    bpv = 1 if maxval < 256 else 2
    need = w * h * ch * bpv
    if n - i < need:
        return None
    dt = np.dtype(">u2") if bpv == 2 else np.uint8
    px = np.frombuffer(b, dtype=dt, count=w * h * ch, offset=i).astype(
        np.int64
    )
    if maxval != (256**bpv - 1):  # normalize to 8-bit range
        px = px * 255 // maxval
    elif bpv == 2:
        px = px // 257
    px = px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)
    return codec, px


def _decode_bmp(b: bytes):
    """Uncompressed 24-bit bottom-up BI_RGB BMP -> ("bmp", HxWx3 RGB
    int64 array), or None."""
    import numpy as np

    if len(b) < 54 or b[0:2] != b"BM":
        return None
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if w <= 0 or h == 0 or bpp != 24 or compression != 0:
        return None
    rows = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if len(b) < data_off + stride * rows:
        return None
    raw = np.frombuffer(
        b, dtype=np.uint8, count=stride * rows, offset=data_off
    ).reshape(rows, stride)
    px = raw[:, : w * 3].reshape(rows, w, 3).astype(np.int64)
    if h > 0:  # bottom-up storage
        px = px[::-1]
    # BMP stores BGR; normalize to RGB channel order
    return "bmp", px[:, :, ::-1]


def _decode_png(b: bytes):
    """Pure-stdlib PNG decode (zlib IDAT inflate + scanline
    unfiltering, PNG spec §9 and §13) -> ("png", 8-bit pixel array:
    HxW gray or HxWx3 RGB, int64), or None.

    Scope: non-interlaced, bit depth 8 or 16 for gray (0), RGB (2),
    gray+alpha (4) and RGBA (6), bit depth 8 for palette (3); alpha is
    dropped (feature extraction wants the color planes), 16-bit
    normalizes to 8-bit via //257 like the netpbm path.  Interlaced or
    sub-byte-depth payloads return None and quarantine as NULL-codec
    rows — never an error.  Filters: Sub is an exact per-lane cumsum
    mod 256, Up is a vectorized previous-row add; Average/Paeth take
    the sequential per-pixel path (both neighbors feed back)."""
    import zlib

    import numpy as np

    if len(b) < 45 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(b)
    ihdr, idat, plte = None, [], None
    while pos + 8 <= n:
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if (
        w <= 0
        or h <= 0
        or channels is None
        or comp != 0
        or filt != 0
        or interlace != 0
        or depth not in (8, 16)
        or (color == 3 and (depth != 8 or plte is None))
    ):
        return None
    if w * h > 64_000_000:
        # Untrusted-payload guard: a crafted IHDR can declare absurd
        # dimensions and OOM the executor at buffer allocation; cap at
        # 64M pixels (far above any training-corpus image) and
        # quarantine, never crash.
        return None
    bps = depth // 8  # bytes per sample
    bpp = channels * bps  # filter stride (bytes per pixel)
    stride = w * bpp
    need = h * (1 + stride)
    try:
        # Bounded inflate: never produce more than the geometry implies
        # (+1 sentinel byte to detect overflow) so a decompression bomb
        # in IDAT cannot balloon past the declared dimensions.
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), need + 1)
    except zlib.error:
        return None
    if len(raw) != need or dec.unconsumed_tail:
        return None
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (1 + stride)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: exact per-lane cumsum mod 256
            cur = (
                np.cumsum(
                    line.reshape(-1, bpp).astype(np.int64), axis=0
                )
                % 256
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraparound IS mod-256
        elif ftype in (3, 4):  # Average / Paeth: left+up feedback
            cur = np.empty(stride, dtype=np.uint8)
            li, pi = line.astype(np.int64), prev.astype(np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                up = int(pi[x])
                if ftype == 3:
                    cur[x] = (li[x] + (a + up) // 2) % 256
                else:
                    c = int(recon[y - 1, x - bpp]) if (
                        x >= bpp and y > 0
                    ) else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else c
                    )
                    cur[x] = (li[x] + pred) % 256
        else:
            return None
        recon[y] = cur
        prev = cur
    if depth == 16:
        px = (
            recon.reshape(h, w, channels, 2).astype(np.int64)
        )
        px = (px[:, :, :, 0] * 256 + px[:, :, :, 1]) // 257
    else:
        px = recon.reshape(h, w, channels).astype(np.int64)
    if color == 3:  # palette lookup
        pal = np.frombuffer(plte, dtype=np.uint8)
        if len(pal) % 3 or px.max() >= len(pal) // 3:
            return None
        px = pal.reshape(-1, 3).astype(np.int64)[px[:, :, 0]]
    elif color == 4:  # gray+alpha -> gray
        px = px[:, :, :1]
    elif color == 6:  # RGBA -> RGB
        px = px[:, :, :3]
    if px.shape[2] == 1:
        px = px[:, :, 0]
    return "png", px


def _decode_gif_first_frame(b: bytes):
    """GIF (operators/gif.py, pure-stdlib LZW) -> first composited
    frame as ("gif", HxWx3 RGB); the full frame sequence is exposed by
    gif_frame_stats below."""
    from netflix_data_ingestion_spark.operators.gif import decode_gif

    got = decode_gif(b)
    if got is None:
        return None
    return "gif", got["frames"][0]


def _decode_image(b: bytes):
    """Format-sniffing dispatch over every pure-Python codec:
    netpbm (P5/P6), uncompressed 24-bit BMP, PNG, baseline JPEG,
    GIF87a/89a (first frame).  None = quarantine."""
    from netflix_data_ingestion_spark.operators.jpeg import decode_jpeg

    return (
        _decode_netpbm(b)
        or _decode_bmp(b)
        or _decode_png(b)
        or decode_jpeg(b)
        or _decode_gif_first_frame(b)
    )


def _luma(px):
    """8-bit pixel array (HxW gray or HxWx3 RGB) -> integer Rec.601
    luma plane in milli-units.

    The int64 widening is load-bearing: numpy's weak promotion keeps
    uint8 * python-int at a narrow dtype (uint16), and milli-luma
    ranges to 255,000 — without the cast, bright pixels WRAP.  Caught
    by the multimodal_gif_frames end-to-end oracle (round 8)."""
    import numpy as np

    px = np.asarray(px).astype(np.int64)
    if px.ndim == 3:
        return px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    return px * 1000


def _ahash64(luma) -> str:
    """8x8 average-hash over an integer luma plane: block-mean
    downsample (exact integer sums over an 8x8 grid of cells), bit i
    set iff cell i's mean > the global cell mean.  Deterministic, no
    floats until nothing is left to round."""
    import numpy as np

    h, w = luma.shape
    ys = [h * i // 8 for i in range(9)]
    xs = [w * j // 8 for j in range(9)]
    cells = np.empty((8, 8), dtype=np.int64)
    for i in range(8):
        for j in range(8):
            y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            y1, x1 = min(y1, h), min(x1, w)
            block = luma[y0:y1, x0:x1]
            cells[i, j] = (
                block.sum() // block.size if block.size else 0
            )
    mean = cells.sum() // 64
    bits = 0
    for i in range(8):
        for j in range(8):
            bits = (bits << 1) | (1 if cells[i, j] > mean else 0)
    return f"{bits:016x}"


def decode_real_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode + feature extraction for netpbm (P5/P6),
    uncompressed 24-bit BMP, PNG, baseline JPEG, and GIF (first
    composited frame) payloads — no codec library, Arrow-batched
    ``mapInPandas``,
    same plumbing shape as ``decode_stub_features`` but producing true
    pixel statistics: (codec, width, height, exact integer mean
    luminance in milli-units, 8x8 aHash hex).  Payloads in any other
    format (or corrupt) yield a NULL-codec row rather than an error —
    the quarantine-not-crash ingest contract.  JPEG covers both the
    baseline and progressive (SOF2) profiles; formats needing codec
    libraries remain out of scope in this environment — on a real
    cluster the PIL branch plugs into the same batch loop.
    """
    return df.mapInPandas(
        real_decode_batches(id_col, payload_col), REAL_DECODE_SCHEMA
    )


def real_decode_batches(
    id_col: str = "media_id", payload_col: str = "payload"
):
    """Iterator->iterator form of ``decode_real_features``' decode stage
    (see ``gif_frame_batches`` for why it is exposed)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "codec": [],
                "width": [],
                "height": [],
                "mean_luma_milli": [],
                "ahash64": [],
            }
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = b"" if payload is None else bytes(payload)
                got = _decode_image(b)
                out["media_id"].append(media_id)
                if got is None:
                    out["codec"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_luma_milli"].append(None)
                    out["ahash64"].append(None)
                    continue
                codec, px = got
                luma = _luma(px)
                h, w = luma.shape
                out["codec"].append(codec)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma_milli"].append(
                    int(luma.sum()) // (w * h)
                )
                out["ahash64"].append(_ahash64(luma))
            yield pd.DataFrame(out).astype(
                {
                    "media_id": "int64",
                    "width": "Int32",
                    "height": "Int32",
                    "mean_luma_milli": "Int64",
                }
            )

    return batches


def _box_resample(px, oh: int, ow: int):
    """Exact integer box-average downsample of an 8-bit pixel array
    (HxW or HxWx3) to (oh, ow): each output pixel is the floor-mean of
    its source block (blocks tile the image via the same h*i//oh grid
    as _ahash64 — deterministic, no float resampling kernels)."""
    import numpy as np

    h, w = px.shape[:2]
    ys = np.array([h * i // oh for i in range(oh)], dtype=np.int64)
    xs = np.array([w * j // ow for j in range(ow)], dtype=np.int64)
    yc = np.diff(np.append(ys, h))
    xc = np.diff(np.append(xs, w))
    sums = np.add.reduceat(np.add.reduceat(px, ys, axis=0), xs, axis=1)
    counts = np.outer(yc, xc)
    if px.ndim == 3:
        counts = counts[:, :, None]
    return sums // counts


def _encode_netpbm(px) -> bytes:
    """8-bit pixel array -> P6 (RGB) / P5 (gray) binary netpbm bytes."""
    import numpy as np

    h, w = px.shape[:2]
    magic = b"P6" if px.ndim == 3 else b"P5"
    return (
        magic + b"\n%d %d\n255\n" % (w, h)
        + np.clip(px, 0, 255).astype(np.uint8).tobytes()
    )


def resize_real(
    df: DataFrame,
    max_width: int = 256,
    max_height: int = 256,
) -> DataFrame:
    """REAL image resize for every codec ``_decode_image`` speaks
    (netpbm/BMP/PNG/baseline-JPEG/GIF first frame) — decode, exact
    integer box-average downsample to fit (max_width, max_height)
    preserving aspect (never upscales), re-encode as netpbm (P6/P5:
    the canonical-interchange choice a real pipeline makes when
    normalizing formats).  Same RESIZE_SCHEMA as ``resize_stub``;
    payloads that don't decode pass through UNCHANGED with their
    original metadata (quarantine-not-crash), so the operator is safe
    to run over a mixed-format corpus.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA}
            for media_id, payload, mt in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                b = b"" if payload is None else bytes(payload)
                got = _decode_image(b)
                if got is None:
                    out, ow, oh = b, None, None
                else:
                    _, px = got
                    h, w = px.shape[:2]
                    num = min(max_width * h, max_height * w, w * h)
                    # integer-exact aspect fit: scale = num/(w*h) <= 1
                    ow = max(1, (w * num) // (w * h))
                    oh = max(1, (h * num) // (w * h))
                    out = _encode_netpbm(_box_resample(px, oh, ow))
                rows["media_id"].append(media_id)
                rows["payload"].append(out)
                rows["media_type"].append(mt)
                rows["n_bytes"].append(len(out))
                rows["sha256"].append(hashlib.sha256(out).hexdigest())
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
            yield pd.DataFrame(rows).astype(
                {"out_width": "Int32", "out_height": "Int32"}
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


def phash_real(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash64) — REAL perceptual fingerprint for decodable
    payloads: the 8x8 average-hash of the decoded luma plane
    (``decode_real_features``' aHash), which places near-identical
    IMAGES within small Hamming distance — the property ``phash_stub``'s
    md5 stand-in cannot provide.  Undecodable payloads fall back to the
    md5 fingerprint (exact-duplicate detection still works for them).
    Same output contract as ``phash_stub``, so
    ``phash_near_dup_pairs``' pigeonhole Hamming join composes
    unchanged with ``fingerprints=phash_real(...)``.
    """
    import hashlib

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("phash64", T.StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = b"" if payload is None else bytes(payload)
                got = _decode_image(b)
                ids.append(media_id)
                if got is None:
                    hashes.append(hashlib.md5(b).hexdigest()[:16])
                else:
                    hashes.append(_ahash64(_luma(got[1])))
            yield pd.DataFrame({"media_id": ids, "phash64": hashes})

    return media.mapInPandas(batches, schema)
