"""Generate the multimodal image fixture + its expected table.

The `image_metadata` driver entry runs ufuzzy_spark.multimodal.decode
over fixtures/images.parquet (url, payload); its DuckDB oracle is
fixtures/images_expected.parquet. The expected values here come from
GENERATOR INTENT — the dimensions each container was built with and
BMP-size arithmetic for the thumbnail — not from the decode code under
test, so the oracle is independent (the single_error fixture pattern).

tests/test_entry_parity.py regenerates both in-memory and fails if the
checked-in parquets are stale.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIX_DIR = Path(__file__).resolve().parent.parent / "fixtures"
THUMB_MAX_DIM = 128  # decode_images default


def png_rgb(px: np.ndarray) -> bytes:
    """Minimal 8-bit truecolor PNG writer (filter 0 rows)."""
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def bmp_rgb(px: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BMP writer."""
    h, w, _ = px.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
        + body
    )


def gif_header(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def jpeg_header(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    # padded with fill bytes before SOF to exercise the 0xFF-skip path
    sof0 = b"\xff\xff\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 3)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def webp_vp8l(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)
    body = b"\x2f" + struct.pack("<I", bits)[:4]
    return (
        b"RIFF"
        + struct.pack("<I", 12 + len(body))
        + b"WEBPVP8L"
        + struct.pack("<I", len(body))
        + body
    )


def bmp_thumb_size(w: int, h: int) -> int:
    """Expected thumbnail byte size by BMP arithmetic (54-byte header
    + 4-aligned rows), for a nearest-neighbor stride downsample."""
    step = max(1, (max(w, h) + THUMB_MAX_DIM - 1) // THUMB_MAX_DIM)
    tw = (w + step - 1) // step
    th = (h + step - 1) // step
    return 54 + ((tw * 3 + 3) // 4) * 4 * th


def build_rows() -> tuple[list[dict], list[dict]]:
    rng = np.random.RandomState(1234)
    payloads: list[dict] = []
    expected: list[dict] = []

    def add(url, payload, fmt, w, h, thumb_n):
        payloads.append({"url": url, "payload": payload})
        expected.append(
            {
                "url": url,
                "format": fmt,
                "width": w,
                "height": h,
                "n_bytes": len(payload),
                "content_sha1": hashlib.sha1(payload).hexdigest(),
                "thumb_n_bytes": thumb_n,
            }
        )

    # pixel-decodable: PNG + BMP at sizes straddling the thumb stride
    for i, (w, h) in enumerate([(17, 23), (64, 48), (300, 150), (1, 1)]):
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        add(f"img://png/{i}", png_rgb(px), "png", w, h, bmp_thumb_size(w, h))
        add(f"img://bmp/{i}", bmp_rgb(px), "bmp", w, h, bmp_thumb_size(w, h))
    # header-only formats (entropy decode needs a codec): NULL thumb
    add("img://gif/0", gif_header(320, 200), "gif", 320, 200, None)
    add("img://jpeg/0", jpeg_header(1920, 1080), "jpeg", 1920, 1080, None)
    add("img://webp/0", webp_vp8l(800, 600), "webp", 800, 600, None)
    # junk / truncated
    add("img://junk/0", bytes(rng.randint(1, 255, 97, dtype=np.uint8)), "unknown", 0, 0, None)
    add("img://junk/1", b"\x89PNG\r\n\x1a\n", "unknown", 0, 0, None)
    return payloads, expected


def main() -> None:
    payloads, expected = build_rows()
    FIX_DIR.mkdir(exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(
            payloads,
            schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
        ),
        FIX_DIR / "images.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist(
            expected,
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("format", pa.string()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("n_bytes", pa.int32()),
                    ("content_sha1", pa.string()),
                    ("thumb_n_bytes", pa.int32()),
                ]
            ),
        ),
        FIX_DIR / "images_expected.parquet",
    )
    print(f"wrote {len(payloads)} payloads -> {FIX_DIR}/images.parquet")


if __name__ == "__main__":
    main()
