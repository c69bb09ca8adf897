"""Multimodal column plumbing — binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing (schemas, mapInPandas batch
shape, partition sizing) is real and tested, and so is the metadata
decode: ``parse_image_header`` reads format/width/height straight
from the container headers (PNG IHDR, JPEG SOF markers, GIF logical
screen, WebP VP8/VP8L/VP8X, BMP DIB) in pure Python — no image
library needed. Only PIXEL decoding (the thumbnail re-encode) still
needs a codec; ``_resize_stub`` stands in for it and is the one
remaining stub, clearly marked.
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


def _be(b: bytes) -> int:
    return int.from_bytes(b, "big")


def _le(b: bytes) -> int:
    return int.from_bytes(b, "little")


def parse_image_header(payload: bytes) -> tuple[str, int, int]:
    """Real container-header decode: (format, width, height).

    Pure Python over the leading bytes — PNG (IHDR), JPEG (SOF0-15
    marker walk), GIF (logical screen descriptor), WebP (VP8 keyframe
    / VP8L bitstream / VP8X canvas), BMP (DIB header). Unknown or
    truncated payloads return ("unknown", 0, 0) rather than raising.
    """
    p = payload
    try:
        # PNG: 8-byte magic, IHDR chunk is always first
        if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            return "png", _be(p[16:20]), _be(p[20:24])

        # GIF: 6-byte version + little-endian logical screen w/h
        if p[:6] in (b"GIF87a", b"GIF89a"):
            return "gif", _le(p[6:8]), _le(p[8:10])

        # BMP: 'BM' + DIB header (BITMAPINFOHEADER at offset 14)
        if p[:2] == b"BM" and len(p) >= 26:
            return "bmp", _le(p[18:22]), abs(int.from_bytes(p[22:26], "little", signed=True))

        # JPEG: walk marker segments to the first SOFn frame header
        if p[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    i += 1
                    continue
                marker = p[i + 1]
                if marker == 0xFF:
                    i += 1  # fill byte — next byte may be the marker
                    continue
                if marker == 0x00:
                    i += 2  # stuffed 0xFF00 data byte, not a marker
                    continue
                if marker in (0xDA, 0xD9):
                    break  # SOS/EOI: entropy data / end — no SOF ahead
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers, no length
                    continue
                seg_len = _be(p[i + 2 : i + 4])
                if seg_len < 2:
                    break  # malformed length — bail rather than misparse
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return "jpeg", _be(p[i + 7 : i + 9]), _be(p[i + 5 : i + 7])
                i += 2 + seg_len

        # WebP: RIFF container, first chunk tag picks the bitstream
        if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
            tag = p[12:16]
            if tag == b"VP8 " and p[23:26] == b"\x9d\x01\x2a":
                return "webp", _le(p[26:28]) & 0x3FFF, _le(p[28:30]) & 0x3FFF
            if tag == b"VP8L" and p[20] == 0x2F:
                bits = _le(p[21:25])
                return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
            if tag == b"VP8X":
                return "webp", _le(p[24:27]) + 1, _le(p[27:30]) + 1
    except (IndexError, ValueError):
        pass
    return "unknown", 0, 0


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
                parse_image_header(bytes(p)) if p is not None else ("unknown", 0, 0)
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
