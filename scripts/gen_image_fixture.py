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


_JZZ = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# cos(k*pi/16) for k = 0..8 as exact double literals. Hardcoded (not
# np.cos) so the fixture bytes are identical on every host: glibc's
# vectorized cos is ifunc-dispatched per CPU and can differ in the
# last ulp, which — through the quantizer's round() — flipped entropy
# bytes between two VMs of the same image (tests/test_entry_parity.py
# ::test_image_fixture_fresh caught it).
_COS16 = (
    1.0,
    0.9807852804032304,
    0.9238795325112867,
    0.8314696123025452,
    0.7071067811865476,
    0.5555702330196022,
    0.38268343236508984,
    0.19509032201612833,
    0.0,
)


def _cos16(m: int) -> float:
    """cos(m * pi / 16) by exact symmetry reduction onto _COS16."""
    m %= 32
    if m > 16:
        m = 32 - m
    return -_COS16[16 - m] if m > 8 else _COS16[m]


# _JPEG_A[u][x] = c(u)/2 * cos((2x+1) u pi / 16), plain Python floats
_JPEG_A = [
    [
        (_COS16[4] if u == 0 else 1.0) / 2.0 * _cos16((2 * x + 1) * u)
        for x in range(8)
    ]
    for u in range(8)
]


def _dct2_quant(f, qn):
    """8x8 forward DCT + quantization, bit-deterministic across hosts.

    Scalar Python-float accumulation in a fixed order: BLAS matmul
    (the previous `A @ f @ A.T`) dispatches on CPU features and its
    reduction order/FMA use varies between hosts, so quantized
    coefficients sitting near a rounding tie flipped between VMs.
    IEEE-754 scalar ops are exact functions of their inputs, so this
    path produces identical bytes everywhere. round-half-even matches
    the np.round the encoder previously used.
    """
    g = [[float(f[y][x]) - 128.0 for x in range(8)] for y in range(8)]
    # t = A @ g  (t[u][x] = sum_y A[u][y] * g[y][x])
    t = [
        [
            sum(_JPEG_A[u][y] * g[y][x] for y in range(8))
            for x in range(8)
        ]
        for u in range(8)
    ]
    # F = t @ A.T; quantize
    out = np.zeros((8, 8), np.int32)
    for u in range(8):
        for v in range(8):
            acc = sum(t[u][y] * _JPEG_A[v][y] for y in range(8))
            out[u, v] = int(round(acc / float(qn[u][v])))
    return out


class _JBitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad the final byte with 1-bits (T.81)


def jpeg_baseline(
    planes: list,
    samps: list,
    qts: list,
    w: int,
    h: int,
    dri: int = 0,
) -> tuple[bytes, list]:
    """Independent baseline JPEG encoder (ITU-T T.81) — the oracle for
    decode._jpeg_baseline, written from the spec, not from the decoder.

    ``planes[i]`` is a float/int array already padded to the MCU grid:
    shape (mcuy*8*v_i, mcux*8*h_i) for sampling factors ``samps[i] =
    (h_i, v_i)``; ``qts[i]`` is that component's 64-entry natural-order
    quant table (DQT id = component index). Huffman tables are minimal
    valid canonical tables (all 12 DC symbols at 5 bits, all 162 AC
    run/size symbols at 8 bits — the k-th symbol's canonical code is
    just k). ``dri`` > 0 emits restart markers every ``dri`` MCUs.

    Returns (payload, quantized coefficient blocks per plane) — the
    coefficients let the test reconstruct expected pixels with a slow
    direct cosine-sum IDCT, independent of the decoder's matrix IDCT.
    """
    n_comp = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qblocks = []
    for pl, (sh_, sv_), qt in zip(planes, samps, qts):
        ph, pw = mcuy * 8 * sv_, mcux * 8 * sh_
        assert pl.shape == (ph, pw), (pl.shape, (ph, pw))
        qn = np.asarray(qt, np.float64).reshape(8, 8)
        qb = np.zeros((ph // 8, pw // 8, 8, 8), np.int32)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                f = pl[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                qb[by, bx] = _dct2_quant(
                    np.asarray(f, np.float64), qn
                )
        qblocks.append(qb)

    dc_syms = bytes(range(12))
    ac_syms = bytes(
        [0x00]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
        + [0xF0]
    )
    dc_code = {sym: (5, k) for k, sym in enumerate(dc_syms)}
    ac_code = {sym: (8, k) for k, sym in enumerate(ac_syms)}

    bw = _JBitWriter()
    preds = [0] * n_comp
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * n_comp
        my, mx = divmod(m, mcux)
        for ci in range(n_comp):
            sh_, sv_ = samps[ci]
            for by in range(sv_):
                for bx in range(sh_):
                    blk = qblocks[ci][my * sv_ + by, mx * sh_ + bx]
                    zz = blk.reshape(64)[list(_JZZ)]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    s = abs(diff).bit_length()
                    ln, code = dc_code[s]
                    bw.put(code, ln)
                    if s:
                        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_code[0xF0]
                            bw.put(code, ln)
                            run -= 16
                        s = abs(v).bit_length()
                        ln, code = ac_code[(run << 4) | s]
                        bw.put(code, ln)
                        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        ln, code = ac_code[0x00]
                        bw.put(code, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate(qts):
        zz_q = np.asarray(qt, np.int64)[list(_JZZ)]  # DQT is zigzag order
        out += (
            b"\xff\xdb"
            + struct.pack(">H", 3 + 64)
            + bytes([tq])
            + bytes(int(x) & 0xFF for x in zz_q)
        )
    sof = bytearray(struct.pack(">BHHB", 8, h, w, n_comp))
    for ci, (sh_, sv_) in enumerate(samps):
        sof += bytes([ci + 1, (sh_ << 4) | sv_, ci])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dc_counts = bytes([0, 0, 0, 0, 12] + [0] * 11)
    ac_counts = bytes([0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8)
    for tc, counts, syms in ((0, dc_counts, dc_syms), (1, ac_counts, ac_syms)):
        body = bytes([tc << 4]) + counts + syms  # table id 0, shared
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytearray([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out + b"\xff\xd9"
    return bytes(out), qblocks


def jpeg_gray(px: "np.ndarray", qt=None, dri: int = 0) -> bytes:
    """Encode an (h, w) uint8 grayscale image: edge-pad to the 8x8
    grid, quant table defaults to all-ones (lossless-after-rounding)."""
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(
        px.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"
    )
    payload, _ = jpeg_baseline(
        [plane], [(1, 1)], [np.ones(64, np.int64) if qt is None else qt], w, h,
        dri=dri,
    )
    return payload


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
    # baseline JPEG: REAL entropy decode (round 5) — grayscale with
    # restart markers, and 4:2:0 color; thumb size by the same BMP
    # arithmetic (decode crops the MCU padding back to w x h)
    jg = rng.randint(0, 256, size=(45, 37)).astype(np.uint8)
    add(
        "img://jpeg/gray", jpeg_gray(jg, dri=3), "jpeg", 37, 45,
        bmp_thumb_size(37, 45),
    )
    w420, h420 = 60, 42  # mcu grid 4x3 -> Y 48x64, chroma 24x32
    ypl = rng.randint(0, 256, size=(48, 64)).astype(np.float64)
    cbp = rng.randint(64, 192, size=(24, 32)).astype(np.float64)
    crp = rng.randint(64, 192, size=(24, 32)).astype(np.float64)
    qt1 = np.ones(64, np.int64)
    qt2 = np.full(64, 2, np.int64)
    jc, _ = jpeg_baseline(
        [ypl, cbp, crp], [(2, 2), (1, 1), (1, 1)], [qt1, qt2, qt2],
        w420, h420,
    )
    add(
        "img://jpeg/c420", jc, "jpeg", w420, h420,
        bmp_thumb_size(w420, h420),
    )
    # header-only / truncated GIF (no frame): NULL thumb
    add("img://gif/hdr", gif_header(320, 200), "gif", 320, 200, None)
    # header-only JPEG (no scan data): still an honest NULL thumb
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
