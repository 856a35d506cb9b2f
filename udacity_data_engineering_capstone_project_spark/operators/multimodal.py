"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, `mapInPandas`
signature, partitioning — is real and tested; the actual media decode
is STUBBED (image/audio libraries are not available in this
environment): `decode_image_meta` computes a DETERMINISTIC FAKE
(width/height derived from the byte stream) and `decode_image_pixels`
raises NotImplementedError, marking exactly where a real decoder
(PIL/ffmpeg) plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
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


def decode_image_meta(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """STUB decode: derive fake (width, height) deterministically from
    the payload bytes. Replace `_fake_dims` with a real decoder (PIL)
    when the library is available — the Spark plumbing (Arrow batches,
    schema, partition-parallel decode) is already correct.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )

    def _fake_dims(b: bytes) -> tuple[int, int]:
        # DETERMINISTIC FAKE: stand-in for image header parsing.
        if not b:
            return 0, 0
        return 16 + b[0] % 64, 16 + b[-1] % 64

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(_fake_dims)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, schema)


def decode_image_pixels(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Real pixel decode — requires an image library not present in this
    environment."""
    raise NotImplementedError(
        "pixel decode requires PIL/cv2; plug a decoder into the "
        "mapInPandas pattern used by decode_image_meta"
    )
