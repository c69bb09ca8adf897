"""Generate the multimodal audio/video fixture + its expected table.

The `media_metadata` driver entry runs ufuzzy_spark.multimodal.media
over fixtures/media.parquet (url, payload); its DuckDB oracle is
fixtures/media_expected.parquet. Expected values come from GENERATOR
INTENT — the rates/durations/dimensions each container was built
with, and NumPy arithmetic over the synthesized PCM — not from the
decode code under test (the gen_image_fixture pattern).

tests/test_entry_parity.py regenerates both in-memory and fails if
the checked-in parquets are stale.
"""

from __future__ import annotations

import hashlib
import struct
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIX_DIR = Path(__file__).resolve().parent.parent / "fixtures"


def wav_pcm16(rate: int, ch: int, samples: np.ndarray) -> bytes:
    """Minimal RIFF/WAVE writer; samples is (frames, ch) int16."""
    data = samples.astype("<i2").tobytes()
    block = 2 * ch
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
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


def flac_streaminfo(
    rate: int, ch: int, bits: int, total: int, block: int = 4096
) -> bytes:
    """Header-only fLaC: STREAMINFO (type 0, marked last block).
    ``block`` sets min/max blocksize — encoders with real frames must
    pass their actual blocksize (RFC 9639 requires it to match)."""
    packed = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    body = (
        struct.pack(">HH", block, block)
        + b"\x00" * 6  # min/max frame size unknown
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of raw samples: unset
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


# table-driven CRCs (poly 0x07 / 0x8005, init 0) — deliberately a
# DIFFERENT implementation from multimodal/flac.py's bitwise loops so
# the fixture generator shares no code with the decoder under test
_C8 = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _C8.append(_c)
_C16 = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _C16.append(_c)


def _crc8_tab(data: bytes) -> int:
    c = 0
    for b in data:
        c = _C8[c ^ b]
    return c


def _crc16_tab(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _C16[(c >> 8) ^ b]
    return c


class _BitWriter:
    """MSB-first bit packer (FLAC frame encoder support)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _flac_residual(w: _BitWriter, res: list[int], order: int,
                   blocksize: int, porder: int = 0,
                   escape_raw: int | None = None) -> None:
    """Rice-code a residual vector (method 0, 4-bit params). Each
    partition picks the cost-optimal parameter by integer scan, or
    writes an escape-to-raw partition when escape_raw is set."""
    w.write(0, 2)
    w.write(porder, 4)
    pos = 0
    for part in range(1 << porder):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        chunk = res[pos : pos + n]
        pos += n
        if escape_raw is not None:
            assert all(-(1 << (escape_raw - 1)) <= v < (1 << (escape_raw - 1))
                       for v in chunk)
            w.write(0xF, 4)
            w.write(escape_raw, 5)
            for v in chunk:
                w.write(v, escape_raw)
            continue
        zz = [(v << 1) ^ (v >> 63) for v in chunk]  # arithmetic shift: -1/0
        k = min(range(15), key=lambda kk: sum(1 + kk + (u >> kk) for u in zz))
        w.write(k, 4)
        for u in zz:
            w.unary(u >> k)
            w.write(u, k)
    assert pos == len(res)


def _flac_subframe(w: _BitWriter, samples: list[int], bits: int,
                   spec: tuple, blocksize: int) -> None:
    """Encode one subframe. spec: ('constant',) | ('verbatim',) |
    ('fixed', order[, porder[, escape_raw]]) |
    ('lpc', coefs, shift, precision) | ('wasted', k, inner_spec)."""
    wasted = 0
    if spec[0] == "wasted":
        wasted, spec = spec[1], spec[2]
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
    bits -= wasted
    fixed_coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                   4: [4, -6, 4, -1]}

    w.write(0, 1)
    if spec[0] == "constant":
        assert len(set(samples)) == 1
        w.write(0, 6)
    elif spec[0] == "verbatim":
        w.write(1, 6)
    elif spec[0] == "fixed":
        w.write(8 + spec[1], 6)
    else:
        w.write(32 + len(spec[1]) - 1, 6)
    if wasted:
        w.write(1, 1)
        w.unary(wasted - 1)
    else:
        w.write(0, 1)

    if spec[0] == "constant":
        w.write(samples[0], bits)
    elif spec[0] == "verbatim":
        for s in samples:
            w.write(s, bits)
    elif spec[0] == "fixed":
        order = spec[1]
        porder = spec[2] if len(spec) > 2 else 0
        escape = spec[3] if len(spec) > 3 else None
        coefs = fixed_coefs[order]
        for s in samples[:order]:
            w.write(s, bits)
        res = [
            samples[i] - sum(c * samples[i - 1 - j]
                             for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _flac_residual(w, res, order, blocksize, porder, escape)
    else:  # lpc
        _, coefs, shift, prec = spec
        order = len(coefs)
        for s in samples[:order]:
            w.write(s, bits)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c, prec)
        res = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
               >> shift)
            for i in range(order, blocksize)
        ]
        _flac_residual(w, res, order, blocksize, 0, None)


def flac_encode(rate: int, samples: np.ndarray,
                frame_specs: list[dict], block: int) -> bytes:
    """Real FLAC encoder (fixed blocksize, 16-bit): STREAMINFO + one
    frame per spec. samples is (total_frames, ch) int16 with
    total == len(frame_specs) * block. Each spec: {'assign':
    'indep'|'ls'|'rs'|'ms', 'subs': [subframe spec per STORED
    channel]} — see _flac_subframe. Decoded output must be
    bit-identical to `samples` (FLAC is lossless)."""
    crc8, crc16 = _crc8_tab, _crc16_tab

    total, ch = samples.shape
    assert total == len(frame_specs) * block
    out = bytearray(flac_streaminfo(rate, ch, 16, total, block))
    assign_code = {"indep": ch - 1, "ls": 8, "rs": 9, "ms": 10}
    for fno, spec in enumerate(frame_specs):
        blk = samples[fno * block : (fno + 1) * block].astype(np.int64)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        hdr.write(7, 4)  # blocksize-1 as 16 bits at header end
        hdr.write(0, 4)  # sample rate from STREAMINFO
        hdr.write(assign_code[spec["assign"]], 4)
        hdr.write(0b100, 3)  # 16-bit samples
        hdr.write(0, 1)  # reserved
        assert fno < 0x80
        hdr.write(fno, 8)  # UTF-8 coded frame number (1 byte)
        hdr.write(block - 1, 16)
        frame = _BitWriter()
        frame.out = bytearray(hdr.out)
        frame.out.append(crc8(bytes(hdr.out)))

        if spec["assign"] == "indep":
            stored = [(blk[:, c].tolist(), 16) for c in range(ch)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = (left - right).tolist()
            if spec["assign"] == "ls":
                stored = [(left.tolist(), 16), (side, 17)]
            elif spec["assign"] == "rs":
                stored = [(side, 17), (right.tolist(), 16)]
            else:
                stored = [(((left + right) >> 1).tolist(), 16), (side, 17)]
        for (sig, bits), sub in zip(stored, spec["subs"]):
            _flac_subframe(frame, sig, bits, sub, block)
        frame.align()
        body = bytes(frame.out)
        out += body + crc16(body).to_bytes(2, "big")
    return bytes(out)


def mp3_cbr(
    kbps_idx: int, audio_bytes: int, id3_pad: int, stereo: bool
) -> bytes:
    """ID3v2 tag + one MPEG1 Layer III frame header + CBR filler."""
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F,
         (id3_pad >> 7) & 0x7F, id3_pad & 0x7F]
    ) + b"\x00" * id3_pad
    hdr = bytes(
        [0xFF, 0xFB, (kbps_idx << 4) | (0 << 2), 0x00 if stereo else 0xC0]
    )
    return id3 + hdr + b"\x00" * (audio_bytes - 4)


def ogg_page0(packet: bytes) -> bytes:
    """Minimal Ogg page 0 wrapping one id-header packet (<256 B)."""
    return (
        b"OggS" + b"\x00\x02"  # version 0, BOS flag
        + b"\x00" * 8  # granule
        + struct.pack("<II", 0xFEED, 0)  # serial, page seq
        + b"\x00" * 4  # crc (unchecked by the parser)
        + bytes([1, len(packet)])  # one lacing segment
        + packet
    )


def ogg_data_page(granule: int, seq: int, eos: bool = True) -> bytes:
    """Ogg continuation/final page carrying a granule position (total
    samples at that page — the duration source)."""
    body = b"\x11" * 10  # opaque packet bytes (no OggS false sync)
    return (
        b"OggS" + bytes([0, 0x04 if eos else 0x00])
        + struct.pack("<q", granule)
        + struct.pack("<II", 0xFEED, seq)
        + b"\x00" * 4
        + bytes([1, len(body)])
        + body
    )


def mp3_xing(kbps_idx: int, n_frames: int, stereo: bool,
             audio_bytes: int) -> bytes:
    """MPEG1 Layer III frame with a Xing VBR tag (frame count set) at
    the post-side-info offset (32 B stereo / 17 B mono)."""
    hdr = bytes([0xFF, 0xFB, kbps_idx << 4, 0x00 if stereo else 0xC0])
    side = 32 if stereo else 17
    xing = b"Xing" + struct.pack(">I", 1) + struct.pack(">I", n_frames)
    return hdr + b"\x00" * side + xing + b"\x00" * audio_bytes


def vorbis_id(rate: int, ch: int) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([ch])
        + struct.pack("<I", rate) + b"\x00" * 16 + b"\x01"
    )


def opus_head(rate: int, ch: int) -> bytes:
    return (
        b"OpusHead" + bytes([1, ch]) + struct.pack("<H", 312)
        + struct.pack("<I", rate) + struct.pack("<H", 0) + b"\x00"
    )


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def mp4_moov(timescale: int, duration: int, w: int, h: int) -> bytes:
    """ftyp + moov(mvhd v0, trak(tkhd v0)) — offsets per ISO 14496-12."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0))
    mvhd_body = bytearray(100)
    mvhd_body[12:16] = struct.pack(">I", timescale)
    mvhd_body[16:20] = struct.pack(">I", duration)
    tkhd_body = bytearray(84)
    tkhd_body[76:80] = struct.pack(">I", w << 16)  # 16.16 fixed
    tkhd_body[80:84] = struct.pack(">I", h << 16)
    moov = _box(
        b"moov",
        _box(b"mvhd", bytes(mvhd_body)) + _box(b"trak", _box(b"tkhd", bytes(tkhd_body))),
    )
    return ftyp + moov


def build_rows() -> tuple[list[dict], list[dict]]:
    rng = np.random.RandomState(4321)
    payloads: list[dict] = []
    expected: list[dict] = []

    def add(url, payload, fmt, dur, rate, ch, w, h, n_samp, peak):
        payloads.append({"url": url, "payload": payload})
        expected.append(
            {
                "url": url,
                "format": fmt,
                "duration_ms": dur,
                "sample_rate": rate,
                "channels": ch,
                "width": w,
                "height": h,
                "n_bytes": len(payload),
                "content_sha1": hashlib.sha1(payload).hexdigest(),
                "pcm_n_samples": n_samp,
                "pcm_peak": peak,
            }
        )

    # WAV PCM16 (the real-decode path): sine + noise at three shapes
    for i, (rate, ch, frames, amp) in enumerate(
        [(8000, 1, 1600, 12000), (44100, 2, 4410, 28000), (16000, 1, 1, 7)]
    ):
        t = np.arange(frames * ch, dtype=np.float64).reshape(frames, ch)
        sig = np.round(amp * np.sin(t / 7.0)) + rng.randint(
            -3, 4, size=(frames, ch)
        )
        sig = np.clip(sig, -32768, 32767).astype(np.int16)
        add(
            f"med://wav/{i}", wav_pcm16(rate, ch, sig), "wav",
            frames * 1000 // rate, rate, ch, 0, 0,
            frames, int(np.abs(sig.astype(np.int64)).max()),
        )

    # FLAC STREAMINFO (metadata-only: codec gap -> NULL pcm)
    add("med://flac/0", flac_streaminfo(48000, 2, 16, 480000), "flac",
        480000 * 1000 // 48000, 48000, 2, 0, 0, None, None)
    add("med://flac/1", flac_streaminfo(96000, 8, 24, 123456789), "flac",
        123456789 * 1000 // 96000, 96000, 8, 0, 0, None, None)

    # FLAC with REAL encoded frames (round 5): decode_flac must
    # reproduce the synthesized samples bit-exactly (lossless).
    # Integer-only synthesis — no transcendentals — per the
    # cross-host fixture-determinism rule (CLAUDE.md).
    blk = 192
    n2 = 2 * blk
    saw = (np.arange(n2, dtype=np.int64) * 37) % 2000 - 1000
    mono = np.clip(
        saw + rng.randint(-50, 51, size=n2), -32768, 32767
    ).astype(np.int16).reshape(-1, 1)
    flac2 = flac_encode(
        8000, mono,
        [{"assign": "indep", "subs": [("fixed", 2)]},
         {"assign": "indep", "subs": [("verbatim",)]}],
        blk,
    )
    add("med://flac/2", flac2, "flac", n2 * 1000 // 8000, 8000, 1, 0, 0,
        n2, int(np.abs(mono.astype(np.int64)).max()))

    blk3 = 256
    n3 = 3 * blk3
    t3 = np.arange(n3, dtype=np.int64)
    left = (t3 * 53) % 4000 - 2000 + rng.randint(-20, 21, size=n3)
    right = (t3 * 29) % 3000 - 1500 + rng.randint(-20, 21, size=n3)
    right[2 * blk3 :] = 777  # constant tail -> CONSTANT subframe valid
    st = np.stack([left, right], axis=1).astype(np.int16)
    flac3 = flac_encode(
        44100, st,
        [
            # left/side: LPC (coefs through the quantized-coef path) +
            # fixed with a 2-partition residual
            {"assign": "ls", "subs": [("lpc", [2, -1], 0, 5),
                                      ("fixed", 1, 1)]},
            # mid/side and side/right exercise both other decorrelations
            {"assign": "ms", "subs": [("fixed", 2), ("fixed", 1)]},
            {"assign": "rs", "subs": [("verbatim",), ("constant",)]},
        ],
        blk3,
    )
    add("med://flac/3", flac3, "flac", n3 * 1000 // 44100, 44100, 2, 0, 0,
        n3, int(np.abs(st.astype(np.int64)).max()))

    # wasted bits (all samples x4) + escape-to-raw residual partition
    base = ((np.arange(blk, dtype=np.int64) * 11) % 500 - 250) * 4
    w4 = base.astype(np.int16).reshape(-1, 1)
    flac4 = flac_encode(
        16000, w4,
        [{"assign": "indep",
          "subs": [("wasted", 2, ("fixed", 1, 0, 12))]}],
        blk,
    )
    add("med://flac/4", flac4, "flac", blk * 1000 // 16000, 16000, 1, 0, 0,
        blk, int(np.abs(base).max()))

    # corrupt frame body (bit flip before the frame CRC-16): metadata
    # still parses from STREAMINFO, pcm honestly NULL
    bad = bytearray(flac2)
    bad[-3] ^= 0x40
    add("med://flac/5", bytes(bad), "flac", n2 * 1000 // 8000, 8000, 1,
        0, 0, None, None)

    # MP3: idx 9 = 128 kbps MPEG1 L3 @44100; CBR estimate over
    # post-ID3 bytes (audio_bytes * 8 // kbps ms — documented estimate)
    add("med://mp3/0", mp3_cbr(9, 32000, 217, stereo=True), "mp3",
        32000 * 8 // 128, 44100, 2, 0, 0, None, None)
    add("med://mp3/1", mp3_cbr(14, 4000, 0, stereo=False), "mp3",
        4000 * 8 // 320, 44100, 1, 0, 0, None, None)

    # OGG page 0 only: Vorbis / Opus identification headers — granule
    # of the single page is 0, so duration honestly reads 0
    add("med://ogg/0", ogg_page0(vorbis_id(44100, 2)), "ogg",
        0, 44100, 2, 0, 0, None, None)
    add("med://ogg/1", ogg_page0(opus_head(48000, 1)), "ogg",
        0, 48000, 1, 0, 0, None, None)
    # OGG with a final data page (round 4): duration = last-page
    # granule / rate (Vorbis) or (granule - preskip) / 48k (Opus;
    # opus_head above writes preskip 312)
    add("med://ogg/2",
        ogg_page0(vorbis_id(44100, 2)) + ogg_data_page(441000, 1), "ogg",
        441000 * 1000 // 44100, 44100, 2, 0, 0, None, None)
    add("med://ogg/3",
        ogg_page0(opus_head(48000, 1)) + ogg_data_page(48312, 1), "ogg",
        (48312 - 312) * 1000 // 48000, 48000, 1, 0, 0, None, None)
    # MP3 with a Xing VBR tag (round 4): exact frame count wins over
    # the CBR byte estimate (1152 samples/frame at MPEG1 L3)
    add("med://mp3/2", mp3_xing(9, 383, True, 20000), "mp3",
        383 * 1152 * 1000 // 44100, 44100, 2, 0, 0, None, None)
    add("med://mp3/3", mp3_xing(9, 77, False, 3000), "mp3",
        77 * 1152 * 1000 // 44100, 44100, 1, 0, 0, None, None)

    # MP4: mvhd timescale/duration + tkhd 16.16 canvas
    add("med://mp4/0", mp4_moov(600, 3000, 640, 360), "mp4",
        3000 * 1000 // 600, 0, 0, 640, 360, None, None)
    add("med://mp4/1", mp4_moov(90000, 2700000, 1920, 1080), "mp4",
        2700000 * 1000 // 90000, 0, 0, 1920, 1080, None, None)

    # junk / truncated
    add("med://junk/0", bytes(rng.randint(1, 255, 61, dtype=np.uint8)),
        "unknown", 0, 0, 0, 0, 0, None, None)
    add("med://junk/1", b"RIFF\x04\x00\x00\x00WAVE", "wav",
        0, 0, 0, 0, 0, None, None)  # no fmt/data chunks -> zeros, no pcm
    return payloads, expected


def main() -> None:
    payloads, expected = build_rows()
    FIX_DIR.mkdir(exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(
            payloads,
            schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
        ),
        FIX_DIR / "media.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist(
            expected,
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("format", pa.string()),
                    ("duration_ms", pa.int64()),
                    ("sample_rate", pa.int32()),
                    ("channels", pa.int32()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("n_bytes", pa.int32()),
                    ("content_sha1", pa.string()),
                    ("pcm_n_samples", pa.int64()),
                    ("pcm_peak", pa.int32()),
                ]
            ),
        ),
        FIX_DIR / "media_expected.parquet",
    )
    print(f"wrote {len(payloads)} payloads -> {FIX_DIR}/media.parquet")


if __name__ == "__main__":
    main()
