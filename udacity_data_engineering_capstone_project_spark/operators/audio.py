"""Audio column support (north-star extension: multimodal training
data). Stdlib-only, same design as the image tier in `multimodal`:
opaque ``binary`` payloads, real RIFF/WAVE header parsing, PCM16
feature extraction as Arrow-batched `mapInPandas` stages (numpy across
each payload's samples — no per-sample Python).

Compressed codecs (mp3/opus) would plug into the same stages via
ffmpeg when available; WAV/PCM is fully implemented here.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def parse_wav_meta(b: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_frames) from RIFF/WAVE
    bytes; raises ValueError for non-WAV payloads. Walks the chunk list
    (fmt may be followed by LIST/fact chunks before data)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sample_rate = channels = bits = None
    n_data = None
    i = 12
    while i + 8 <= len(b):
        ctype = b[i : i + 4]
        (length,) = struct.unpack("<I", b[i + 4 : i + 8])
        if ctype == b"fmt ":
            # a malformed/truncated fmt chunk must surface as the
            # documented ValueError, not struct.error — one corrupt
            # payload would otherwise fail the whole Spark task
            if i + 24 > len(b) or length < 16:
                raise ValueError("truncated fmt chunk")
            channels, sample_rate = struct.unpack("<HI", b[i + 10 : i + 16])
            (bits,) = struct.unpack("<H", b[i + 22 : i + 24])
        elif ctype == b"data":
            n_data = length
        i += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or n_data is None:
        raise ValueError("missing fmt/data chunk")
    if channels == 0 or bits == 0 or bits % 8 or sample_rate == 0:
        raise ValueError("malformed fmt fields")
    n_frames = n_data // (channels * bits // 8)
    return sample_rate, channels, bits, n_frames


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Synthesize a mono PCM16 WAV from an int16 sample array — the
    audio-corpus generator for tests/benchmarks."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _pcm16_view(b: bytes) -> np.ndarray:
    """The data chunk of a PCM16 WAV as an int16 numpy view."""
    i = 12
    while i + 8 <= len(b):
        ctype = b[i : i + 4]
        (length,) = struct.unpack("<I", b[i + 4 : i + 8])
        if ctype == b"data":
            return np.frombuffer(b, dtype="<i2", offset=i + 8, count=length // 2)
        i += 8 + length + (length & 1)
    raise ValueError("missing data chunk")


def decode_audio_meta(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Header-level decode: (id, sample_rate, channels, bits, n_frames,
    duration_ms). Unrecognized payloads yield nulls."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("sample_rate", LongType()),
            StructField("channels", LongType()),
            StructField("bits", LongType()),
            StructField("n_frames", LongType()),
            StructField("duration_ms", LongType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, ch, bits, nf = parse_wav_meta(bytes(payload))
                    rows.append((int(rid), sr, ch, bits, nf, nf * 1000 // sr))
                except (ValueError, struct.error, ZeroDivisionError):
                    rows.append((int(rid), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "channels", "bits", "n_frames",
                         "duration_ms"],
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, schema)


def audio_features(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """PCM16 feature extraction per payload, numpy-vectorized inside
    Arrow batches: RMS level, peak amplitude (normalized to [-1, 1]),
    zero-crossing rate — the triage features a speech/music corpus
    filter runs before expensive ASR/embedding stages.

    Output: (id, rms r6, peak r6, zero_crossing_rate r6); non-WAV
    payloads yield nulls.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("rms", DoubleType()),
            StructField("peak", DoubleType()),
            StructField("zero_crossing_rate", DoubleType()),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    s = _pcm16_view(bytes(payload)).astype(np.float64) / 32768.0
                    if len(s) == 0:
                        rows.append((int(rid), 0.0, 0.0, 0.0))
                        continue
                    rms = round(float(math.sqrt(np.mean(s * s))), 6)
                    peak = round(float(np.max(np.abs(s))), 6)
                    zcr = round(
                        float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))), 6
                    )
                    rows.append((int(rid), rms, peak, zcr))
                except (ValueError, struct.error):
                    rows.append((int(rid), None, None, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "rms", "peak", "zero_crossing_rate"]
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, schema)


def synthesize_wav(df: DataFrame, id_col: str, sample_rate: int = 16000) -> DataFrame:
    """Deterministic per-row WAV synthesis — the audio-corpus generator
    for end-to-end checks (the audio twin of `multimodal.synthesize_png`).

    Each row becomes a real mono PCM16 WAV whose features have CLOSED
    FORMS in the row id, so a SQL oracle can verify the full
    decode/extract path byte-for-byte:

    - n_frames   n = 150 + id % 50
    - amplitude  A = 1001 + (id % 200) * 14  (odd by construction)
    - waveform: first n//2 samples +A, the rest -A (one sign crossing)

    Therefore rms = peak = A/32768 (exact in binary: A odd and < 2^12,
    so the 6-decimal rounding never lands on an exact half — Python's
    bankers rounding and SQL half-away-from-zero agree), and
    zero_crossing_rate = 1/(n-1) with n-1 in [149, 198] — a range that
    excludes every denominator (128, 640, ...) whose reciprocal has an
    exact 5 in the 7th decimal place.
    """
    schema = StructType(
        [StructField(id_col, LongType()), StructField("payload", BinaryType())]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                n = 150 + rid % 50
                amp = 1001 + (rid % 200) * 14
                samples = np.full(n, -amp, dtype=np.int16)
                samples[: n // 2] = amp
                rows.append((rid, encode_wav(samples, sample_rate)))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return df.select(id_col).mapInPandas(_gen, schema)
