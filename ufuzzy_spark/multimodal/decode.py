"""Multimodal column plumbing — binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing (schemas, mapInPandas batch
shape, partition sizing) is real and tested; the actual codec calls
are STUBBED behind ``_decode_image_stub`` because no image/audio
libraries exist in this container — swap the stub for PIL/ffmpeg in a
real deployment (the UDF signature and batching do not change).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_sha1", StringType()),
        StructField("thumb", BinaryType()),  # resized payload (stub)
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[str, int, int]:
    """STUB decode: deterministic fake (format, width, height) derived
    from the payload hash. Replace with PIL.Image.open in deployment.
    """
    h = hashlib.sha1(payload).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    fmt = ("jpeg", "png", "webp")[h[2] % 3]
    return fmt, width, height


def _resize_stub(payload: bytes, max_dim: int) -> bytes:
    """STUB resize: truncate payload deterministically (stand-in for a
    real thumbnail encode). Keeps the bytes-in/bytes-out contract."""
    return payload[: max_dim * 16]


def decode_images(
    df: DataFrame, url_col: str = "url", bytes_col: str = "payload",
    thumb_max_dim: int = 128,
) -> DataFrame:
    """mapInPandas decode/feature pass over binary payloads.

    Arrow-batched; each batch stays columnar. At 100 TB the input
    should be repartitioned by size (maxPartitionBytes) so one batch
    of payloads fits executor memory — metadata-only output shrinks
    the stage's shuffle to ~nothing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bytes_col]
            metas = [
                _decode_image_stub(bytes(p)) if p is not None else ("unknown", 0, 0)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "format": [m[0] for m in metas],
                    "width": np.array([m[1] for m in metas], dtype=np.int32),
                    "height": np.array([m[2] for m in metas], dtype=np.int32),
                    "n_bytes": np.array(
                        [len(p) if p is not None else 0 for p in payloads],
                        dtype=np.int32,
                    ),
                    "content_sha1": [
                        hashlib.sha1(bytes(p)).hexdigest() if p is not None else ""
                        for p in payloads
                    ],
                    "thumb": [
                        _resize_stub(bytes(p), thumb_max_dim)
                        if p is not None
                        else None
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one row per (url, frame_idx) to
    decode. The explode is native; actual frame extraction is the
    stubbed decode above. Demonstrates the fan-out schema."""
    n_frames = (F.length("payload") / 1024).cast("int")  # stub duration proxy
    return df.select(
        "url",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames, F.lit(1)) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
