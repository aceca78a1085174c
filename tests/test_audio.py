"""WAV/RIFF PCM decode (operators/audio.py) — pure-stdlib path.

The in-repo encoder (encode_wav) writes canonical PCM WAV; decoding
must invert it exactly (integer PCM is lossless), so round-trips are
bit-exact.  Python's stdlib ``wave`` module serves as an independent
second oracle for the 8/16/32-bit container layout.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from netflix_data_ingestion_spark.operators.audio import (
    _PCM_GUID,
    decode_audio_features,
    decode_wav,
    encode_wav,
)


def _sine_samples(n: int, bits: int, channels: int) -> np.ndarray:
    full = (1 << (bits - 1)) - 1
    t = np.arange(n * channels)
    return (np.sin(t * 0.37) * full * 0.8).astype(np.int64)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_bit_exact(bits, channels):
    samples = _sine_samples(100, bits, channels)
    b = encode_wav(samples, channels, 8000, bits)
    got = decode_wav(b)
    assert got is not None
    assert got["channels"] == channels
    assert got["sample_rate"] == 8000
    assert got["bit_depth"] == bits
    assert got["num_frames"] == 100
    assert np.array_equal(got["samples"], samples)


def test_stdlib_wave_module_agrees():
    """Independent container oracle: a file written by Python's stdlib
    ``wave`` module decodes to the same samples."""
    samples = _sine_samples(64, 16, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(samples.astype("<i2").tobytes())
    got = decode_wav(buf.getvalue())
    assert got is not None
    assert got["sample_rate"] == 44100
    assert got["num_frames"] == 64
    assert np.array_equal(got["samples"], samples)


def test_unknown_chunks_and_odd_padding_skipped():
    """RIFF chunk walk: junk chunks of ODD size (padded per spec)
    before and after fmt/data must be skipped."""
    core = encode_wav(_sine_samples(10, 16, 1), 1, 8000, 16)
    # rebuild: RIFF | junk(3, padded) | fmt | data | junk2
    fmt_off = core.index(b"fmt ")
    inner = core[fmt_off:]  # fmt + data chunks
    junk1 = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
    junk2 = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b"WAVE" + junk1 + inner + junk2
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_wav(raw)
    assert got is not None and got["num_frames"] == 10


def test_wave_format_extensible_pcm():
    samples = _sine_samples(20, 16, 2)
    core = encode_wav(samples, 2, 16000, 16)
    # swap the 16-byte fmt chunk for a 40-byte EXTENSIBLE one
    fmt_off = core.index(b"fmt ")
    old_fmt = core[fmt_off + 8 : fmt_off + 8 + 16]
    ext = (
        old_fmt[:0]
        + struct.pack("<H", 0xFFFE)
        + old_fmt[2:]
        + struct.pack("<HHI", 22, 16, 0x3)
        + _PCM_GUID
    )
    data_part = core[fmt_off + 8 + 16 :]
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(ext)) + ext + data_part
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_wav(raw)
    assert got is not None
    assert got["bit_depth"] == 16
    assert np.array_equal(got["samples"], samples)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],  # truncated inside fmt
        lambda b: b"RIFX" + b[4:],  # big-endian container
        lambda b: b"",  # empty
        lambda b: b[:8] + b"AVI " + b[12:],  # not WAVE
        lambda b: b[:-5],  # data chunk shorter than declared
    ],
)
def test_corrupt_payloads_quarantine(mutate):
    core = encode_wav(_sine_samples(10, 16, 1), 1, 8000, 16)
    assert decode_wav(mutate(core)) is None


def test_unsupported_formats_quarantine():
    core = encode_wav(_sine_samples(10, 16, 1), 1, 8000, 16)
    fmt_off = core.index(b"fmt ")

    def patch_fmt(field_off: int, value: int, width: str) -> bytes:
        pos = fmt_off + 8 + field_off
        return (
            core[:pos] + struct.pack(width, value)
            + core[pos + struct.calcsize(width) :]
        )

    assert decode_wav(patch_fmt(0, 3, "<H")) is None  # float PCM
    assert decode_wav(patch_fmt(0, 6, "<H")) is None  # A-law
    assert decode_wav(patch_fmt(2, 0, "<H")) is None  # zero channels
    assert decode_wav(patch_fmt(14, 12, "<H")) is None  # 12-bit depth


def test_bomb_cap_declines():
    """A data chunk declaring more samples than the cap must
    quarantine (the declared size IS the allocation driver)."""
    from netflix_data_ingestion_spark.operators import audio

    old = audio.BOMB_CAP_SAMPLES
    audio.BOMB_CAP_SAMPLES = 1000
    try:
        b = encode_wav(np.zeros(2000, dtype=np.int64), 1, 8000, 16)
        assert audio.decode_wav(b) is None
        ok = encode_wav(np.zeros(900, dtype=np.int64), 1, 8000, 16)
        assert audio.decode_wav(ok) is not None
    finally:
        audio.BOMB_CAP_SAMPLES = old


def test_decode_audio_features_exact_stats(spark):
    """Spark-side feature extraction: exact integer stats vs a Python
    oracle, plus NULL-codec quarantine rows for junk, all in one
    Arrow-batched pass over a multi-partition frame."""
    payloads = []
    oracle = {}
    for media_id, (bits, channels, rate, n) in enumerate(
        [(8, 1, 8000, 50), (16, 2, 44100, 100), (24, 1, 16000, 33), (32, 2, 48000, 7)],
        start=1,
    ):
        samples = _sine_samples(n, bits, channels)
        payloads.append((media_id, bytearray(encode_wav(samples, channels, rate, bits))))
        full = 1 << (bits - 1)
        oracle[media_id] = {
            "channels": channels,
            "sample_rate": rate,
            "bit_depth": bits,
            "num_frames": n,
            "duration_ms": n * 1000 // rate,
            "mean_abs_milli": 1000 * int(np.abs(samples).sum())
            // (samples.size * full),
            "peak_milli": 1000 * int(np.abs(samples).max()) // full,
        }
    payloads.append((99, bytearray(b"not a wav at all")))
    payloads.append((100, None))
    df = spark.createDataFrame(
        payloads, "media_id long, payload binary"
    ).repartition(4)
    rows = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert len(rows) == 6
    for media_id, want in oracle.items():
        got = rows[media_id]
        assert got["codec"] == "wav"
        for k, v in want.items():
            assert got[k] == v, (media_id, k)
    assert rows[99]["codec"] is None and rows[99]["mean_abs_milli"] is None
    assert rows[100]["codec"] is None


def test_resample_wav_exact_mapping():
    """Nearest-neighbor frame math pinned: out[j] = in[(j*src)//dst],
    down AND up, preserving channels and depth."""
    from netflix_data_ingestion_spark.operators.audio import resample_wav

    samples = _sine_samples(100, 16, 2)
    b = encode_wav(samples, 2, 16000, 16)
    down = decode_wav(resample_wav(b, 8000))
    assert down["num_frames"] == 50 and down["sample_rate"] == 8000
    src = samples.reshape(100, 2)
    want = src[[(j * 16000) // 8000 for j in range(50)]].reshape(-1)
    assert np.array_equal(down["samples"], want)
    up = decode_wav(resample_wav(b, 24000))
    assert up["num_frames"] == 150
    want_up = src[[(j * 16000) // 24000 for j in range(150)]].reshape(-1)
    assert np.array_equal(up["samples"], want_up)
    ident = decode_wav(resample_wav(b, 16000))
    assert np.array_equal(ident["samples"], samples)


def test_resample_wav_quarantines_and_empty():
    from netflix_data_ingestion_spark.operators.audio import resample_wav

    assert resample_wav(b"junk", 8000) is None
    empty = encode_wav(np.zeros(0, dtype=np.int64), 1, 8000, 16)
    out = decode_wav(resample_wav(empty, 4000))
    assert out is not None and out["num_frames"] == 0


def test_resample_audio_passthrough(spark):
    """Undecodable payloads pass through byte-identical; decodable ones
    come back at the target rate."""
    from netflix_data_ingestion_spark.operators.audio import (
        resample_audio,
    )

    wav = encode_wav(_sine_samples(64, 16, 1), 1, 32000, 16)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: bytes(r["payload"])
            for r in resample_audio(df, 8000).collect()}
    assert rows[2] == b"not audio"
    got = decode_wav(rows[1])
    assert got["sample_rate"] == 8000 and got["num_frames"] == 16


def test_fused_resample_query_matches_operator_composition(spark, sf_dir):
    """The q_multimodal_audio_resample FUSED stage (synth -> resample ->
    decode in one mapInPandas) inlines resample_audio's quarantine
    contract; pin it against the public operator composition
    decode_audio_features(resample_audio(synth)) so the fused body
    cannot drift from the operators unnoticed (the hash-checked oracle
    only sees the fused form)."""
    from netflix_data_ingestion_spark.operators.audio import (
        resample_audio,
    )
    from netflix_data_ingestion_spark.plans.contract import REGISTRY

    fn, _ = REGISTRY["multimodal_audio_resample"]
    fused = [tuple(r) for r in fn(spark, sf_dir).collect()]

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    rows = []
    for r in docs:
        t = r["text"] or ""
        base = (
            np.frombuffer(
                t.encode("utf-32-le", "surrogatepass"), dtype="<u4"
            ).astype(np.int64)
            % 256
        ) - 128
        bits = (8, 16, 24, 32)[int(r["doc_id"]) % 4]
        rate = 8000 * (1 + int(r["doc_id"]) % 3)
        rows.append(
            (
                int(r["doc_id"]),
                bytearray(encode_wav(base << (bits - 8), 1, rate, bits)),
            )
        )
    syn = spark.createDataFrame(rows, "media_id long, payload binary")
    composed = [
        tuple(r)
        for r in decode_audio_features(resample_audio(syn, 8000))
        .orderBy("media_id")
        .collect()
    ]
    assert fused == composed
