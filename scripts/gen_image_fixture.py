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


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Spec-conformant GIF LZW encoder (greedy longest-match), written
    independently of the decoder under test: emits clear first, grows
    the code width when the NEXT code could exceed it, and clears when
    the table hits 4096."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out_bits.append((clear, width))
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width))
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4096:
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        out_bits.append((table[run], width))
    out_bits.append((end, width))
    big = pos = 0
    for code, wd in out_bits:
        big |= code << pos
        pos += wd
    return big.to_bytes((pos + 7) // 8, "little")


def gif_palette(px_idx: "np.ndarray", palette: "np.ndarray",
                interlace: bool = False) -> bytes:
    """Single-frame GIF89a writer: global color table (padded to a
    power of two), optional interlaced row order, real LZW data in
    255-byte sub-blocks."""
    h, w = px_idx.shape
    n_pal = len(palette)
    pal_bits = max(1, (n_pal - 1).bit_length())
    pal = np.zeros((2 ** pal_bits, 3), dtype=np.uint8)
    pal[:n_pal] = palette
    mcs = max(2, pal_bits)
    rows = px_idx
    if interlace:
        order = np.concatenate(
            [np.arange(o, h, s) for o, s in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        rows = px_idx[order]
    lzw = _gif_lzw_encode(rows.tobytes(), mcs)
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                0x40 if interlace else 0)
        + bytes([mcs]) + blocks + b"\x00\x3b"
    )


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
    # GIF: REAL LZW frames (round 4) — plain and interlaced, palette
    # sizes straddling a code-width boundary; thumb size by the same
    # BMP arithmetic (decoded canvas = logical screen)
    for i, (w, h, n_colors, inter) in enumerate(
        [(150, 90, 256, False), (40, 33, 5, True)]
    ):
        palette = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
        idx = rng.randint(0, n_colors, size=(h, w)).astype(np.uint8)
        add(
            f"img://gif/{i}",
            gif_palette(idx, palette, interlace=inter),
            "gif", w, h, bmp_thumb_size(w, h),
        )
    # header-only / truncated GIF (no frame): NULL thumb
    add("img://gif/hdr", gif_header(320, 200), "gif", 320, 200, None)
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
