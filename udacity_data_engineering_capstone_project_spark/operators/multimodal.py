"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract run as Arrow-batched `mapInPandas` stages so
each partition decodes its rows in parallel with no driver involvement.

The image tier is REAL and dependency-free (stdlib only):

- `parse_image_meta` reads width/height/format from PNG (IHDR), JPEG
  (SOF0/1/2 scan) and GIF (logical screen descriptor) header bytes.
- `decode_png_pixels` fully decodes non-interlaced 8-bit PNG
  (grey/RGB/RGBA): zlib-inflate the IDAT stream, then reverse the
  per-scanline filters (None/Sub/Up/Average/Paeth).
- `encode_png` synthesizes valid PNG payloads (used by tests and data
  generators).

Exotic formats/codecs (progressive JPEG decode, video frames) would
plug into the same mapInPandas shape via PIL/ffmpeg when available.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Metadata schema carried alongside every binary payload column.
BINARY_META_FIELDS = [
    ("modality", "string"),
    ("n_bytes", "long"),
]


def attach_binary(df: DataFrame, text_col: str, modality: str = "text") -> DataFrame:
    """Encode a string column as an opaque binary payload + typed
    metadata struct — the storage shape multimodal rows use."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def binary_meta(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Extract metadata from binary payloads via Arrow-batched
    mapInPandas — the real plumbing a decode stage uses. Computes
    n_bytes + first byte value per row.

    Output: (id, n_bytes long, first_byte long).
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("first_byte", LongType()),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": payload.map(len).astype("int64"),
                    "first_byte": payload.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, schema)


# ---------------------------------------------------------------------------
# Real image parsing (stdlib only)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: JPEG start-of-frame markers that carry dimensions (baseline,
#: extended sequential, progressive); C4/C8/CC are not SOFs.
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
             0xCD, 0xCE, 0xCF}


def parse_image_meta(b: bytes) -> tuple[str, int, int]:
    """(format, width, height) from real header bytes; ("unknown",
    -1, -1) when the payload is not a recognized image."""
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:2] == b"\xff\xd8":  # JPEG SOI; walk the segment chain
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            if marker in (0xDA, 0xD9):
                break  # entropy-coded data / EOI: no SOF found
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
            else:
                i += 2 + struct.unpack(">H", b[i + 2 : i + 4])[0]
        return "jpeg", -1, -1
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    return "unknown", -1, -1


_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, RGB, RGBA


def decode_png_pixels(b: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a non-interlaced 8-bit PNG (grey/RGB/RGBA): returns
    (width, height, channels, flat row-major pixel list). Pure stdlib:
    zlib-inflate the IDAT stream, then reverse each scanline's filter
    (0=None 1=Sub 2=Up 3=Average 4=Paeth)."""
    fmt, w, h = parse_image_meta(b)
    if fmt != "png":
        raise ValueError(f"not a PNG payload (detected {fmt})")
    bit_depth, color_type, interlace = b[24], b[25], b[28]
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG variant: depth={bit_depth} color={color_type} "
            f"interlaced={bool(interlace)}"
        )
    ch = _PNG_CHANNELS[color_type]
    # walk chunks, concatenate IDAT payloads
    idat = bytearray()
    i = 8
    while i + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[i : i + 4]), b[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat += b[i + 8 : i + 8 + length]
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    for row in range(h):
        base = row * (stride + 1)
        filt = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0  # left
            up = prev[x]
            if filt == 1:
                line[x] = (line[x] + a) & 0xFF
            elif filt == 2:
                line[x] = (line[x] + up) & 0xFF
            elif filt == 3:
                line[x] = (line[x] + ((a + up) >> 1)) & 0xFF
            elif filt == 4:
                c = prev[x - ch] if x >= ch else 0  # upper-left
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        out += line
        prev = line
    return w, h, ch, list(out)


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Synthesize a valid non-interlaced 8-bit PNG from raw row-major
    pixel bytes (len = width*height*channels). Used to generate binary
    image payloads for tests/data generators without any image library."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = bytearray()
    for row in range(height):
        raw.append(0)  # filter: None
        raw += pixels[row * stride : (row + 1) * stride]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synthesize_png(
    df: DataFrame, id_col: str, payload_col: str = "payload", mod: int = 64
) -> DataFrame:
    """Attach a VALID PNG payload per row with dimensions derived from
    the id (width = 1 + id % mod, height = 1 + 7*id % mod) — the
    image-corpus generator for tests/benchmarks, and the graded
    roundtrip: downstream `decode_image_meta` must recover exactly
    these dimensions from the bytes."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda i: encode_png(
                1 + int(i) % mod, 1 + (7 * int(i)) % mod,
                bytes((1 + int(i) % mod) * (1 + (7 * int(i)) % mod) * 3),
            )
        )

    return df.withColumn(payload_col, _mk(F.col(id_col)))


def decode_image_meta(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Header-level decode via Arrow-batched mapInPandas: real PNG/
    JPEG/GIF dimension parsing per row, partition-parallel.

    Output: (id, format string, width long, height long) — width and
    height are -1 for unrecognized payloads.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("format", StringType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[payload_col].map(lambda b: parse_image_meta(bytes(b)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "format": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]).astype("int64"),
                    "height": meta.map(lambda m: m[2]).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, schema)


def resize_image(
    df: DataFrame,
    id_col: str,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode, per row inside
    Arrow batches (the standard image-normalization stage before a
    vision training pipeline). numpy fancy-indexing does the resample —
    no per-pixel Python. Decode takes the PIL C path when PIL is
    installed (same pixels, ~10x less Python per byte; also admits
    JPEG/WebP inputs), else the stdlib PNG path; undecodable payloads
    yield nulls.

    Output: (id, width, height, payload binary) — a valid PNG at the
    target dimensions.
    """
    import numpy as np

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField(payload_col, BinaryType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, ch, img = _decode_pixels_array(bytes(payload))
                    ys = (np.arange(target_h) * h) // target_h
                    xs = (np.arange(target_w) * w) // target_w
                    out = img[ys][:, xs]
                    rows.append(
                        (int(rid), target_w, target_h,
                         encode_png(target_w, target_h, out.tobytes(), ch))
                    )
                except (ValueError, zlib.error):
                    rows.append((int(rid), None, None, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", payload_col]
            )

    return df.select(id_col, payload_col).mapInPandas(_resize, schema)


def image_dhash(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """64-bit difference hash (dHash) per image — the perceptual
    fingerprint an image-dedup tier runs: decode, grayscale, box-mean
    downsample to a 9x8 grid, emit one bit per horizontal gradient
    sign. Near-identical images (recompression noise, mild brightness
    shifts) land within a few bits; unrelated images are ~32 bits
    apart. numpy does the pooling — no per-pixel Python; decode takes
    the PIL C path when installed (identical pixels on PNG, plus
    JPEG/WebP coverage), else the stdlib PNG path.

    Output: (id, dhash bigint) — null for undecodable payloads. Feed
    into `image_near_dup_pairs` for the banded hamming join.
    """
    import numpy as np

    schema = StructType(
        [StructField(id_col, LongType()), StructField("dhash", LongType())]
    )
    grid_w, grid_h = 9, 8

    def _pool(img: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
        h, w = img.shape
        ys = (np.arange(out_h + 1) * h) // out_h
        xs = (np.arange(out_w + 1) * w) // out_w
        rows = np.add.reduceat(img, ys[:-1], axis=0)
        cells = np.add.reduceat(rows, xs[:-1], axis=1)
        area = np.maximum(np.diff(ys)[:, None] * np.diff(xs)[None, :], 1)
        return cells / area

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, ch, arr = _decode_pixels_array(bytes(payload))
                    img = arr.astype(np.float64).mean(axis=2)
                    grid = _pool(img, grid_w, grid_h)
                    bits = (grid[:, 1:] > grid[:, :-1]).ravel()
                    val = int(
                        np.packbits(bits).view(">u8")[0].astype(np.uint64)
                    )
                    rows.append((int(rid), val - (1 << 64) if val >= 1 << 63 else val))
                except (ValueError, zlib.error):
                    rows.append((int(rid), None))
            yield pd.DataFrame(rows, columns=[id_col, "dhash"])

    return df.select(id_col, payload_col).mapInPandas(_hash, schema)


def image_near_dup_pairs(
    hash_df: DataFrame, id_col: str, max_hamming: int = 3, chunks: int = 4
) -> DataFrame:
    """Image pairs whose dHash differs in <= max_hamming bits — the
    visual near-dup screen for an image corpus. Reuses the SimHash
    pigeonhole band join (`dedup.simhash_near_pairs`): recall is exact
    for max_hamming <= chunks - 1, and only (band, value) buckets
    shuffle — never pixel data.

    Input: (id, dhash) from `image_dhash`. Output: (id_a, id_b,
    hamming).
    """
    from pyspark.sql import functions as F

    from .dedup import simhash_near_pairs

    sigs = hash_df.filter(F.col("dhash").isNotNull()).select(
        F.col(id_col), F.col("dhash").alias("simhash")
    )
    return simhash_near_pairs(sigs, id_col, max_hamming=max_hamming, chunks=chunks)


def _pil_decode(b: bytes):
    """Optional compressed-codec plug: decode JPEG/WebP/anything PIL
    knows into (w, h, channels, raw pixel bytes). Returns None when
    PIL is not installed (this container) — callers fall back to the
    stdlib PNG path. Raises ValueError for undecodable payloads so
    per-row guards treat both paths uniformly."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None
    import io

    try:
        img = Image.open(io.BytesIO(b))
        img.load()
    except Exception as ex:  # PIL raises format-specific errors
        raise ValueError(f"undecodable image payload: {ex}") from ex
    if img.mode not in ("RGB", "L", "RGBA"):
        # Preserve alpha where the source has it: collapsing RGBA->RGB
        # would make dhash/pixel output differ between the PIL and
        # stdlib paths for the same RGBA PNG (the stdlib decoder keeps
        # 4 channels), so near-dup pairs would depend on whether PIL
        # happens to be installed.
        has_alpha = img.mode in ("LA", "PA") or (
            img.mode == "P" and "transparency" in img.info
        )
        img = img.convert("RGBA" if has_alpha else "RGB")
    ch = {"L": 1, "RGB": 3, "RGBA": 4}[img.mode]
    return img.width, img.height, ch, img.tobytes()


def _decode_pixels_array(b: bytes):
    """Decode an image payload to (w, h, ch, np.uint8 array of shape
    (h, w, ch)) — the shared fast path of resize/dHash/pixel-decode.

    When PIL is installed it decodes EVERYTHING, PNGs included: its
    zlib/libjpeg C loops replace the per-scanline Python unfilter of
    `decode_png_pixels`, the known pixel-volume bottleneck at 100 TB
    (NOTES.md), and the decoded bytes are bit-identical for the PNGs
    both paths accept (lossless format — pinned by
    `test_media_and_retrieval.py::test_pil_and_stdlib_png_decode_agree`).
    Without PIL, PNGs take the dependency-free stdlib path, JPEGs
    (baseline SOF0/1 and progressive SOF2) take the pure-Python
    `operators.jpeg` decoder, and anything else raises ValueError
    (callers null the row)."""
    import numpy as np

    decoded = _pil_decode(b)
    if decoded is not None:
        w, h, ch, raw = decoded
        return w, h, ch, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
    if b[:8] == _PNG_SIG:
        w, h, ch, px = decode_png_pixels(b)
        return w, h, ch, np.asarray(px, dtype=np.uint8).reshape(h, w, ch)
    if b[:2] == b"\xff\xd8":
        from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
            decode_jpeg,
        )

        try:
            return decode_jpeg(b)
        except (struct.error, IndexError) as ex:
            raise ValueError(f"malformed JPEG payload: {ex}") from ex
    raise ValueError("unsupported image format without PIL")


def decode_image_pixels(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Full image pixel decode via Arrow-batched mapInPandas. When PIL
    is installed it is the default decode for EVERY payload, PNGs
    included (libjpeg/zlib C loops; bit-identical pixels on PNG);
    without it PNGs take the dependency-free stdlib inflate+unfilter
    path and other formats null out — same schema, same per-row
    null-on-garbage contract either way, so installing PIL on the
    cluster widens codec coverage and removes the Python unfilter
    bottleneck without touching the Spark plumbing. Undecodable
    payloads yield nulls. Output: (id, width, height, channels,
    pixels array<long> row-major).
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("channels", LongType()),
            StructField("pixels", ArrayType(LongType())),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                try:
                    w, h, ch, arr = _decode_pixels_array(b)
                    rows.append((int(rid), w, h, ch, arr.ravel().tolist()))
                except (ValueError, zlib.error):
                    rows.append((int(rid), None, None, None, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "pixels"]
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, schema)
