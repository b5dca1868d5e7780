"""Synthetic NDPI fixture with a JPEG level wider than 65535 px.

Real Hamamatsu levels beyond JPEG's 16-bit SOF dimension limit store zeros
in the SOF and rely on restart markers for decodability (the convention
native/ndpihuge.cpp reconstructs; the reference reads such files through
OpenSlide, src/stamp/preprocessing/__init__.py:43-56).

A >65500-px-wide JPEG cannot be produced by any stock encoder (libjpeg
refuses the dimensions), so this builder synthesizes one the same way the
format itself guarantees decodability: every restart chunk is an
independent entropy segment with fresh DC predictors, so the big image's
stream is the concatenation of the entropy segments of independently
Pillow-encoded chunk tiles, joined by RSTn markers, under one header whose
DRI equals the chunk MCU count and whose SOF dimensions are zeroed.  All
tiles share quant/Huffman tables because Pillow writes the standard
(non-optimized) tables at a fixed quality.

The stream is wrapped as the single strip of a little-endian classic TIFF
with the true dimensions in ImageWidth/ImageLength — the NDPI layout.
A second, ordinary-sized JPEG directory provides the thumbnail level.
"""

import io
import struct

import numpy as np
from PIL import Image

_SHORT, _LONG, _RATIONAL = 3, 4, 5

# chunk geometry: 4:4:4 → 8-px MCUs; 32 MCUs per restart interval
CHUNK_W, CHUNK_H = 256, 8
RESTART_INTERVAL = CHUNK_W // 8


def _encode_tile(rgb: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(rgb).save(
        buf, format="JPEG", quality=92, subsampling=0, streamtype=0
    )
    return buf.getvalue()


def _split_jpeg(data: bytes) -> tuple[bytes, bytes]:
    """(header through SOS payload, entropy bytes without EOI)."""
    pos = 2
    while pos + 4 <= len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker == 0xDA:  # SOS
            head_end = pos + 2 + seg_len
            assert data[-2:] == b"\xff\xd9"
            return data[:head_end], data[head_end:-2]
        pos += 2 + seg_len
    raise AssertionError("no SOS in tile JPEG")


def _patch_header(head: bytes, dri_mcus: int) -> bytes:
    """Zero the SOF dims (the NDPI >65535-px convention) and insert a DRI
    segment before SOS."""
    out = bytearray(head)
    pos = 2
    sof_at = sos_at = None
    while pos + 4 <= len(out):
        marker = out[pos + 1]
        seg_len = struct.unpack(">H", bytes(out[pos + 2 : pos + 4]))[0]
        if marker in (0xC0, 0xC1):
            sof_at = pos
        if marker == 0xDA:
            sos_at = pos
            break
        pos += 2 + seg_len
    assert sof_at is not None and sos_at is not None
    out[sof_at + 5 : sof_at + 9] = b"\x00\x00\x00\x00"  # height, width := 0
    dri = struct.pack(">BBHH", 0xFF, 0xDD, 4, dri_mcus)
    return bytes(out[:sos_at]) + dri + bytes(out[sos_at:])


def build_huge_jpeg(
    width: int, height: int, tile_fn
) -> tuple[bytes, np.ndarray]:
    """JPEG stream of a width×height image assembled from CHUNK_W×CHUNK_H
    Pillow-encoded chunks; returns (stream, expected RGB as PIL decodes the
    per-chunk JPEGs)."""
    assert width % CHUNK_W == 0 and height % CHUNK_H == 0
    cols, rows = width // CHUNK_W, height // CHUNK_H
    expected = np.empty((height, width, 3), np.uint8)
    header = None
    entropy_parts = []
    for cy in range(rows):
        for cx in range(cols):
            rgb = tile_fn(cx, cy)
            data = _encode_tile(rgb)
            head, entropy = _split_jpeg(data)
            if header is None:
                header = head
            expected[
                cy * CHUNK_H : (cy + 1) * CHUNK_H,
                cx * CHUNK_W : (cx + 1) * CHUNK_W,
            ] = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            entropy_parts.append(entropy)
    stream = bytearray(_patch_header(header, RESTART_INTERVAL))
    for i, part in enumerate(entropy_parts):
        stream += part
        if i + 1 < len(entropy_parts):
            stream += bytes([0xFF, 0xD0 + (i % 8)])  # RSTn joins chunks
    stream += b"\xff\xd9"
    return bytes(stream), expected


def _ifd(entries, next_off) -> bytes:
    out = struct.pack("<H", len(entries))
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHII", tag, typ, count, value)
    return out + struct.pack("<I", next_off)


def write_huge_ndpi(path, *, width: int = 66048, height: int = 32):
    """Write the fixture; returns the expected level-0 RGB array.

    Default geometry: 66048 = 258 chunks of 256 px — past the 65535 SOF
    limit — by 4 MCU rows; ~1k chunks, < 1 MiB on disk.
    """
    rng = np.random.default_rng(42)

    def tile_fn(cx, cy):
        # block-constant tiles survive JPEG nearly exactly and make every
        # chunk distinct, so a misindexed chunk is caught immediately
        base = rng.integers(30, 225, 3)
        t = np.full((CHUNK_H, CHUNK_W, 3), base, np.uint8)
        t[:, : CHUNK_W // 2] = (base + 25) % 256
        return t

    stream, expected = build_huge_jpeg(width, height, tile_fn)

    # thumbnail level: ordinary JPEG directory (aspect matches level 0,
    # width back under the SOF limit so stock decoders handle it)
    w1, h1 = width // 4, height // 4
    thumb = np.full((h1, w1, 3), (90, 140, 190), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(thumb).save(buf, format="JPEG", quality=95)
    thumb_jpeg = buf.getvalue()

    ifd0_off = 16
    arrays0 = ifd0_off + 2 + 11 * 12 + 4
    bps0 = arrays0  # BitsPerSample [8,8,8]
    xres0 = arrays0 + 6
    strip0 = arrays0 + 14
    entries0 = [
        (256, _LONG, 1, width),
        (257, _LONG, 1, height),
        (258, _SHORT, 3, bps0),
        (259, _SHORT, 1, 7),  # JPEG
        (262, _SHORT, 1, 6),  # YCbCr (libjpeg output is RGB either way)
        (273, _LONG, 1, strip0),
        (277, _SHORT, 1, 3),
        (278, _LONG, 1, height),  # single strip
        (279, _LONG, 1, len(stream)),
        (282, _RATIONAL, 1, xres0),
        (296, _SHORT, 1, 3),  # centimeter
    ]
    ifd1_off = strip0 + len(stream) + (len(stream) & 1)  # keep offsets even
    arrays1 = ifd1_off + 2 + 10 * 12 + 4
    bps1 = arrays1
    strip1 = arrays1 + 6
    entries1 = [
        (256, _LONG, 1, w1),
        (257, _LONG, 1, h1),
        (258, _SHORT, 3, bps1),
        (259, _SHORT, 1, 7),
        (262, _SHORT, 1, 6),  # YCbCr JFIF strip, like real NDPI levels
        (273, _LONG, 1, strip1),
        (277, _SHORT, 1, 3),
        (278, _LONG, 1, h1),
        (279, _LONG, 1, len(thumb_jpeg)),
        (296, _SHORT, 1, 3),
    ]
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", ifd0_off))
        f.seek(ifd0_off)
        f.write(_ifd(entries0, ifd1_off))
        f.seek(bps0)
        f.write(struct.pack("<HHH", 8, 8, 8))
        f.seek(xres0)
        f.write(struct.pack("<II", 20000, 1))  # 20000 px/cm = 0.5 µm/px
        f.seek(strip0)
        f.write(stream)
        f.seek(ifd1_off)
        f.write(_ifd(entries1, 0))
        f.seek(bps1)
        f.write(struct.pack("<HHH", 8, 8, 8))
        f.seek(strip1)
        f.write(thumb_jpeg)
    return expected


def write_big_huge_ndpi(path, *, width: int = 66048, height: int = 16):
    """Sparse ≥4 GiB NDPI whose level 0 is a huge restart-marker JPEG
    stored *above* the 4 GiB boundary with wrapped 32-bit offsets — the
    combination real high-magnification Hamamatsu scans are in, exercising
    native/ndpi.cpp's read_huge (offset fixups + jpegrt reconstruction
    together).  Returns the expected level-0 RGB array.

    Layout: window 0 holds the header + IFD A (ordinary-JPEG thumbnail);
    IFD A's next-IFD pointer stores wrapped low bits that reconstruct to
    window 1, where IFD B (level 0) and its single huge-JPEG strip live.
    """
    window = 1 << 32
    rng = np.random.default_rng(7)

    def tile_fn(cx, cy):
        base = rng.integers(30, 225, 3)
        t = np.full((CHUNK_H, CHUNK_W, 3), base, np.uint8)
        t[:, CHUNK_W // 2 :] = (base + 40) % 256
        return t

    stream, expected = build_huge_jpeg(width, height, tile_fn)

    w1, h1 = width // 4, height // 4
    thumb = np.full((h1, w1, 3), (60, 170, 110), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(thumb).save(buf, format="JPEG", quality=95)
    thumb_jpeg = buf.getvalue()

    ifd_a_off = 16
    arrays_a = ifd_a_off + 2 + 9 * 12 + 4
    bps_a = arrays_a
    strip_a = arrays_a + 6
    entries_a = [
        (256, _LONG, 1, w1),
        (257, _LONG, 1, h1),
        (258, _SHORT, 3, bps_a),
        (259, _SHORT, 1, 7),
        (262, _SHORT, 1, 6),
        (273, _LONG, 1, strip_a),
        (277, _SHORT, 1, 3),
        (278, _LONG, 1, h1),
        (279, _LONG, 1, len(thumb_jpeg)),
    ]
    # stored wrapped value 8 < IFD A's own offset 16 → reader bumps a window
    ifd_b_real = window + 8
    arrays_b = ifd_b_real + 2 + 11 * 12 + 4
    bps_b = arrays_b
    xres_b = arrays_b + 6
    strip_b = window + 0x10000
    entries_b = [
        (256, _LONG, 1, width),
        (257, _LONG, 1, height),
        (258, _SHORT, 3, bps_b % window),
        (259, _SHORT, 1, 7),  # JPEG, single strip, zeroed SOF dims
        (262, _SHORT, 1, 6),
        (273, _LONG, 1, strip_b % window),
        (277, _SHORT, 1, 3),
        (278, _LONG, 1, height),
        (279, _LONG, 1, len(stream)),
        (282, _RATIONAL, 1, xres_b % window),
        (296, _SHORT, 1, 3),
    ]
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", ifd_a_off))
        f.seek(ifd_a_off)
        f.write(_ifd(entries_a, ifd_b_real % window))
        f.seek(bps_a)
        f.write(struct.pack("<HHH", 8, 8, 8))
        f.seek(strip_a)
        f.write(thumb_jpeg)
        f.seek(ifd_b_real)
        f.write(_ifd(entries_b, 0))
        f.seek(bps_b)
        f.write(struct.pack("<HHH", 8, 8, 8))
        f.seek(xres_b)
        f.write(struct.pack("<II", 20000, 1))  # 0.5 µm/px
        f.seek(strip_b)
        f.write(stream)
    return expected
