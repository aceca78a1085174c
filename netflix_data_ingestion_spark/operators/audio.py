"""Pure-stdlib WAV/RIFF PCM audio decode.

Extends the real multimodal codec family (netpbm/BMP/PNG/baseline
JPEG, operators/multimodal.py + operators/jpeg.py) to audio — no
audio library, just struct + numpy: RIFF chunk walk, fmt parse,
integer PCM sample extraction, exact integer sample statistics.

The reference pipeline (reference etl_pipeline_spark.py) has no
multimodal surface at all; this module exists for the large-scale
training-data side of the engine, where audio payloads ride as opaque
``binary`` columns exactly like images (SURVEY.md §2 multimodal
plumbing).  Same contract as every codec in the family:

Scope:
- RIFF/WAVE container, little-endian, canonical and non-canonical
  chunk layouts (any chunk order, unknown chunks skipped, odd-sized
  chunks padded per the RIFF spec);
- ``fmt`` codes 1 (integer PCM) and 0xFFFE (WAVE_FORMAT_EXTENSIBLE
  wrapping the PCM sub-format GUID);
- 8-bit unsigned, 16/24/32-bit signed little-endian samples, any
  channel count >= 1, any sample rate >= 1.

Quarantined -> None, never an error (the untrusted-payload contract):
float PCM (code 3), A-law/mu-law/ADPCM, big-endian RIFX, truncated or
corrupt chunks, zero channels/rate, bit depths outside {8,16,24,32},
data chunks declaring more frames than the 256M-sample bomb cap, and
payloads whose data chunk is shorter than its declared size.

Decoded features are exact integers (no float in the contract
columns) so stats are bit-stable across partitionings:
- ``duration_ms`` = frames * 1000 // rate (floor),
- ``mean_abs_milli`` = 1000 * sum(|sample|) // (n * full_scale),
- ``peak_milli``     = 1000 * max(|sample|) // full_scale,
where full_scale is 2**(bits-1) (128 for 8-bit after re-centering).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: WAVE_FORMAT_EXTENSIBLE sub-format GUID for integer PCM
#: (KSDATAFORMAT_SUBTYPE_PCM, little-endian on the wire).
_PCM_GUID = bytes.fromhex("0100000000001000800000aa00389b71")

#: decline payloads declaring more than this many samples
#: (frames * channels) — the decompression-bomb cap, mirroring the
#: PNG/JPEG 64M-pixel caps.
BOMB_CAP_SAMPLES = 1 << 28

_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def _parse_wav(b: bytes):
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    pos = 12
    # RIFF chunk walk: ignore the declared RIFF size (commonly wrong in
    # the wild) and trust per-chunk sizes, padding odd chunks.
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt " and fmt is None:
            fmt = body
        elif cid == b"data" and data is None:
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    code, channels, rate, _brate, _balign, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if code == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: cbSize(2) + validBits(2) + mask(4) + GUID(16)
        if len(fmt) < 40 or fmt[24:40] != _PCM_GUID:
            return None
        code = 1
    if code != 1 or channels < 1 or rate < 1 or bits not in (8, 16, 24, 32):
        return None
    frame_bytes = channels * (bits // 8)
    frames = len(data) // frame_bytes
    if frames * channels > BOMB_CAP_SAMPLES:
        return None
    usable = data[: frames * frame_bytes]
    if bits == 24:
        # no native 24-bit dtype: widen 3-byte LE to 4-byte with sign byte
        raw = np.frombuffer(usable, dtype=np.uint8).reshape(-1, 3)
        hi = (raw[:, 2].astype(np.int8)).astype(np.int32) << 16
        samples = (
            hi | (raw[:, 1].astype(np.int32) << 8) | raw[:, 0].astype(np.int32)
        ).astype(np.int64)
    else:
        samples = np.frombuffer(usable, dtype=_DTYPES[bits]).astype(np.int64)
        if bits == 8:
            samples -= 128  # 8-bit WAV is unsigned, re-center
    return {
        "channels": int(channels),
        "sample_rate": int(rate),
        "bit_depth": int(bits),
        "num_frames": int(frames),
        "samples": samples,  # interleaved, length frames*channels
    }


def decode_wav(b: bytes):
    """Public decoder: RIFF PCM WAV bytes -> dict with channels,
    sample_rate, bit_depth, num_frames and an int64 interleaved sample
    array — or None for anything outside the supported profile or any
    corrupt payload (broad-except quarantine, like ``decode_jpeg``)."""
    try:
        return _parse_wav(bytes(b))
    except Exception:  # noqa: BLE001 — untrusted payload, quarantine
        return None


def encode_wav(
    samples, channels: int, rate: int, bits: int = 16
) -> bytes:
    """Minimal canonical PCM WAV encoder (test oracle + re-encode
    path, the ``_encode_netpbm`` analogue).  ``samples`` is an
    interleaved int sequence already in the target bit range."""
    arr = np.asarray(samples, dtype=np.int64)
    if bits == 8:
        body = (arr + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        u = (arr & 0xFFFFFF).astype(np.uint32)
        raw = np.empty((len(arr), 3), dtype=np.uint8)
        raw[:, 0] = u & 0xFF
        raw[:, 1] = (u >> 8) & 0xFF
        raw[:, 2] = (u >> 16) & 0xFF
        body = raw.tobytes()
    else:
        body = arr.astype(_DTYPES[bits]).tobytes()
    balign = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * balign, balign, bits)
    data_hdr = b"data" + struct.pack("<I", len(body))
    riff_body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + data_hdr + body
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def resample_wav(b: bytes, target_rate: int):
    """Nearest-neighbor integer resample of a PCM WAV payload to
    ``target_rate``: output frame j copies input frame
    (j * src_rate) // target_rate, preserving channels and bit depth —
    the exact-arithmetic resampler (no filter, no floats), so results
    are bit-stable and SQL-checkable.  Returns re-encoded WAV bytes,
    or None if the payload doesn't decode (quarantine passthrough lives
    in the caller)."""
    got = decode_wav(b)
    if got is None or target_rate < 1:
        return None
    ch = got["channels"]
    src_rate = got["sample_rate"]
    frames = got["num_frames"]
    samples = got["samples"].reshape(frames, ch) if frames else got[
        "samples"
    ].reshape(0, ch)
    out_frames = frames * target_rate // src_rate
    idx = (np.arange(out_frames, dtype=np.int64) * src_rate) // target_rate
    out = samples[idx].reshape(-1)
    return encode_wav(out, ch, target_rate, got["bit_depth"])


def resample_audio(
    df: DataFrame,
    target_rate: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, payload) -> (media_id, payload) with every decodable
    WAV payload resampled to ``target_rate`` (nearest-neighbor,
    channel- and depth-preserving); undecodable payloads pass through
    UNCHANGED (quarantine-not-crash, the resize_real contract).  One
    narrow Arrow stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = b"" if payload is None else bytes(payload)
                out = resample_wav(b, target_rate)
                ids.append(media_id)
                payloads.append(b if out is None else out)
            yield pd.DataFrame({id_col: ids, payload_col: payloads})

    return df.mapInPandas(batches, f"{id_col} long, {payload_col} binary")


AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, codec string, channels int, sample_rate int, "
    "bit_depth int, num_frames bigint, duration_ms bigint, "
    "mean_abs_milli bigint, peak_milli bigint"
)


def wav_feature_frame(ids, payloads) -> pd.DataFrame:
    """One Arrow batch of decoded WAV feature rows — the
    ``decode_audio_features`` batch body, shared so fused single-stage
    pipelines (synthesize/resample/decode in ONE ``mapInPandas``) run
    the exact same decode+stats path without shipping the payload
    bytes back across the JVM boundary between stages (guide §4.1:
    you control how many columns cross, and a payload that is consumed
    in the same task should cross zero times)."""
    out: dict[str, list] = {
        "media_id": [],
        "codec": [],
        "channels": [],
        "sample_rate": [],
        "bit_depth": [],
        "num_frames": [],
        "duration_ms": [],
        "mean_abs_milli": [],
        "peak_milli": [],
    }
    for media_id, payload in zip(ids, payloads):
        got = decode_wav(b"" if payload is None else bytes(payload))
        out["media_id"].append(media_id)
        if got is None or got["num_frames"] == 0:
            codec = "wav" if got is not None else None
            out["codec"].append(codec)
            out["channels"].append(got["channels"] if got else None)
            out["sample_rate"].append(got["sample_rate"] if got else None)
            out["bit_depth"].append(got["bit_depth"] if got else None)
            out["num_frames"].append(0 if got else None)
            out["duration_ms"].append(0 if got else None)
            out["mean_abs_milli"].append(None)
            out["peak_milli"].append(None)
            continue
        full_scale = 1 << (got["bit_depth"] - 1)
        samples = got["samples"]
        n = samples.size
        abs_sum = int(np.abs(samples).sum())
        out["codec"].append("wav")
        out["channels"].append(got["channels"])
        out["sample_rate"].append(got["sample_rate"])
        out["bit_depth"].append(got["bit_depth"])
        out["num_frames"].append(got["num_frames"])
        out["duration_ms"].append(
            got["num_frames"] * 1000 // got["sample_rate"]
        )
        out["mean_abs_milli"].append(1000 * abs_sum // (n * full_scale))
        out["peak_milli"].append(
            1000 * int(np.abs(samples).max()) // full_scale
        )
    return pd.DataFrame(out).astype(
        {
            "media_id": "int64",
            "channels": "Int32",
            "sample_rate": "Int32",
            "bit_depth": "Int32",
            "num_frames": "Int64",
            "duration_ms": "Int64",
            "mean_abs_milli": "Int64",
            "peak_milli": "Int64",
        }
    )


def decode_audio_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode + feature extraction for RIFF PCM WAV
    payloads — Arrow-batched ``mapInPandas``, the audio twin of
    ``multimodal.decode_real_features``.  Non-WAV / corrupt payloads
    yield a NULL-codec row rather than an error (quarantine-not-crash).
    All emitted statistics are exact integers, so results are
    partition-order and partitioning invariant."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield wav_feature_frame(pdf[id_col], pdf[payload_col])

    return df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
