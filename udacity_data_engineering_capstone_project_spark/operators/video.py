"""Video column support (north-star extension: multimodal training
data). Same design as the image (`multimodal`) and audio (`audio`)
tiers: opaque ``binary`` payloads, real container parsing with stdlib
only, decode / frame-sample / feature-extract as Arrow-batched
`mapInPandas` stages.

The container is real RIFF/AVI with uncompressed 24-bit DIB frames
(bottom-up BGR scanlines, 4-byte row padding — the actual 'DIB '
fourcc format): `encode_avi` writes it, `parse_avi_meta` reads the
header, and `sample_video_frames` seeks straight to the selected
``00db`` chunks so a k-frame sample decodes k frames, not the whole
stream. Compressed codecs (h264/vp9) would plug into the same stages
via ffmpeg when available; the Spark plumbing (schema, batching,
partition parallelism, stride sampling) is the production shape.
"""

from __future__ import annotations

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

from .multimodal import encode_png


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """A RIFF chunk: fourcc + little-endian size + data, word-aligned."""
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(subtype: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", subtype + data)


def _dib_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 -> DIB bytes: bottom-up rows, BGR order,
    each row padded to a 4-byte boundary."""
    h, w, _ = frame.shape
    stride = _dib_stride(w)
    bgr = frame[::-1, :, ::-1]  # flip rows, swap channels
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _dib_to_frame(data: bytes, width: int, height: int) -> np.ndarray:
    """DIB bytes -> RGB (h, w, 3) uint8 (inverse of `_frame_to_dib`)."""
    stride = _dib_stride(width)
    rows = np.frombuffer(data, dtype=np.uint8, count=height * stride).reshape(
        height, stride
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Synthesize an uncompressed RIFF/AVI from an RGB uint8 array of
    shape (n_frames, height, width, 3) — the video-corpus generator
    for tests/benchmarks (the video twin of `audio.encode_wav`)."""
    n, h, w, _ = frames.shape
    frame_bytes = _dib_stride(w) * h
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<10I16x", usec, frame_bytes * fps, 0, 0x10, n, 0, 1, frame_bytes, w, h
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes, 0, frame_bytes,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(
        b"movi", b"".join(_chunk(b"00db", _frame_to_dib(f)) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_meta(b: bytes) -> tuple[int, int, int, int]:
    """(width, height, usec_per_frame, n_frames) from the avih header
    of RIFF/AVI bytes; raises ValueError for non-AVI payloads."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    i = 12
    while i + 8 <= len(b):
        fourcc = b[i : i + 4]
        (length,) = struct.unpack("<I", b[i + 4 : i + 8])
        if fourcc == b"LIST" and b[i + 8 : i + 12] == b"hdrl":
            j = i + 12
            while j + 8 <= i + 8 + length:
                if b[j : j + 4] == b"avih":
                    usec, _, _, _, n = struct.unpack("<5I", b[j + 8 : j + 28])
                    w, h = struct.unpack("<II", b[j + 40 : j + 48])
                    return w, h, usec, n
                (sub,) = struct.unpack("<I", b[j + 4 : j + 8])
                j += 8 + sub + (sub & 1)
        i += 8 + length + (length & 1)
    raise ValueError("missing avih header")


def _frame_chunks(b: bytes) -> list[tuple[int, int]]:
    """(offset, length) of every ``00db`` frame chunk inside the movi
    LIST — the seek table that lets a sampler decode only the frames
    it needs."""
    i = 12
    out: list[tuple[int, int]] = []
    while i + 8 <= len(b):
        fourcc = b[i : i + 4]
        (length,) = struct.unpack("<I", b[i + 4 : i + 8])
        if fourcc == b"LIST" and b[i + 8 : i + 12] == b"movi":
            j = i + 12
            while j + 8 <= i + 8 + length:
                (sub,) = struct.unpack("<I", b[j + 4 : j + 8])
                if b[j : j + 4] == b"00db":
                    out.append((j + 8, sub))
                j += 8 + sub + (sub & 1)
            return out
        i += 8 + length + (length & 1)
    return out


def _sample_indices(n_frames: int, n_samples: int) -> list[int]:
    """Evenly-spaced frame indices (first and last always included),
    deterministic integer arithmetic — no float linspace."""
    if n_frames <= 0:
        return []
    k = min(n_samples, n_frames)
    if k == 1:
        return [0]
    return sorted({i * (n_frames - 1) // (k - 1) for i in range(k)})


def synthesize_avi(
    df: DataFrame, id_col: str, fps: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """Deterministic per-row AVI synthesis — the video-corpus generator
    for end-to-end checks. Each row becomes a real uncompressed AVI
    whose geometry and pixels are pure functions of the id:

    - n_frames = 3 + id % 6, width = 8 + id % 5, height = 6 + (3*id) % 5
    - pixel (x, y, channel c) of frame f = (id + 11*f + 3*x + 7*y + 5*c) % 256

    so any downstream decode (meta, frame sample, features) can be
    verified against an exact local recompute.
    """
    schema = StructType(
        [StructField(id_col, LongType()), StructField(payload_col, BinaryType())]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                rows.append((rid, encode_avi(synthetic_frames(rid), fps)))
            yield pd.DataFrame(rows, columns=[id_col, payload_col])

    return df.select(id_col).mapInPandas(_gen, schema)


def synthetic_frames(rid: int) -> np.ndarray:
    """The frame array `synthesize_avi` encodes for a given id — shared
    with tests so decode paths are checked against the exact source."""
    n = 3 + rid % 6
    w = 8 + rid % 5
    h = 6 + (3 * rid) % 5
    f, y, x, c = np.ogrid[:n, :h, :w, :3]
    return ((rid + 11 * f + 3 * x + 7 * y + 5 * c) % 256).astype(np.uint8)


def decode_video_meta(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Header-level decode via Arrow-batched mapInPandas: (id, width,
    height, fps, n_frames, duration_ms). Unrecognized payloads yield
    nulls. Header-only — no frame bytes are touched."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("fps", DoubleType()),
            StructField("n_frames", LongType()),
            StructField("duration_ms", LongType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, usec, n = parse_avi_meta(bytes(payload))
                    fps = round(1_000_000 / usec, 6) if usec else None
                    rows.append((int(rid), w, h, fps, n, n * usec // 1000))
                except ValueError:
                    rows.append((int(rid), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "fps", "n_frames",
                         "duration_ms"],
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, schema)


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    n_samples: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Uniform frame sampling — the stage a vision-LM pipeline runs to
    turn each video into k image rows. Seeks directly to the selected
    ``00db`` chunks (fixed-size frames make the chunk walk a seek
    table), decodes ONLY those frames, and re-encodes each as a PNG so
    the output rows flow into the existing image tier
    (`decode_image_meta`, `resize_image`, `image_dhash`).

    Output: (id, frame_index, t_ms, width, height, payload PNG);
    non-AVI payloads yield zero rows.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_index", LongType()),
            StructField("t_ms", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField(payload_col, BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                # the frame decode sits under the same per-row guard as
                # the header parse: a truncated movi chunk must skip the
                # row (docstring contract), not kill the Spark task
                try:
                    w, h, usec, n = parse_avi_meta(b)
                    chunks = _frame_chunks(b)
                    row_frames = []
                    for idx in _sample_indices(min(n, len(chunks)), n_samples):
                        off, length = chunks[idx]
                        frame = _dib_to_frame(b[off : off + length], w, h)
                        row_frames.append(
                            (int(rid), idx, idx * usec // 1000, w, h,
                             encode_png(w, h, frame.tobytes(), 3))
                        )
                except (ValueError, struct.error):
                    continue
                rows.extend(row_frames)
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_index", "t_ms", "width", "height",
                         payload_col],
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, schema)


def video_features(
    df: DataFrame,
    id_col: str,
    max_frames: int = 8,
    payload_col: str = "payload",
) -> DataFrame:
    """Triage features per video, numpy-vectorized inside Arrow
    batches: mean brightness (0-255 across sampled frames) and motion
    (mean absolute pixel delta between consecutive sampled frames) —
    the static-clip / scene-change filters a video corpus runs before
    expensive captioning or embedding stages.

    Output: (id, n_frames, mean_brightness r6, motion r6); non-AVI
    payloads yield nulls.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_frames", LongType()),
            StructField("mean_brightness", DoubleType()),
            StructField("motion", DoubleType()),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                # same per-row guard as sample_video_frames: corrupt
                # headers OR truncated frame chunks yield a null row
                try:
                    w, h, _, n = parse_avi_meta(b)
                    chunks = _frame_chunks(b)
                    idxs = _sample_indices(min(n, len(chunks)), max_frames)
                    frames = np.stack(
                        [
                            _dib_to_frame(b[off : off + ln], w, h).astype(np.float64)
                            for off, ln in (chunks[i] for i in idxs)
                        ]
                    )
                except (ValueError, struct.error):
                    rows.append((int(rid), None, None, None))
                    continue
                brightness = round(float(frames.mean()), 6)
                motion = (
                    round(float(np.abs(np.diff(frames, axis=0)).mean()), 6)
                    if len(frames) > 1
                    else 0.0
                )
                rows.append((int(rid), n, brightness, motion))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_frames", "mean_brightness", "motion"]
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, schema)
