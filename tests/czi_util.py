"""Synthetic Zeiss CZI (ZISRAW) fixture for the native reader.

Writes a minimal-but-conformant single-file ZISRAW container the way the
public spec lays it out (and libCZI reads it): a ZISRAWFILE header segment
pointing at a ZISRAWDIRECTORY of DV entries, one ZISRAWSUBBLOCK segment
per mosaic tile, and a ZISRAWMETADATA segment carrying the Scaling XML.
Covers the decode matrix native/czi.cpp implements:

  * Bgr24 uncompressed, Bgr24 zstd0, Gray16 zstd1 with the hi/lo-byte
    deinterleave flag, Bgr24 JPEG (stock Pillow encoder)
  * a 2× pyramid subblock (logical size = 2 × stored size)
  * an extra-channel (C=1) subblock that must be *excluded* by the
    first-plane selection
  * optionally a JPEG-XR subblock to exercise the named-error resilience

zstd compression is done through ctypes against the same libzstd the
native reader links.
"""

import ctypes
import ctypes.util
import io
import struct

import numpy as np
from PIL import Image

PIX_GRAY8, PIX_GRAY16, PIX_BGR24 = 0, 1, 3
COMP_NONE, COMP_JPEG, COMP_JPEGXR, COMP_ZSTD0, COMP_ZSTD1 = 0, 1, 4, 5, 6

_zstd = ctypes.CDLL(ctypes.util.find_library("zstd") or "libzstd.so.1")
_zstd.ZSTD_compressBound.restype = ctypes.c_size_t
_zstd.ZSTD_compress.restype = ctypes.c_size_t


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    bound = _zstd.ZSTD_compressBound(ctypes.c_size_t(len(data)))
    out = ctypes.create_string_buffer(bound)
    n = _zstd.ZSTD_compress(
        out, ctypes.c_size_t(bound), data, ctypes.c_size_t(len(data)), level
    )
    assert not _zstd.ZSTD_isError(ctypes.c_size_t(n))
    return out.raw[:n]


def _segment(sid: bytes, data: bytes) -> bytes:
    """32-byte-aligned segment: 16-char id, allocated/used sizes, data."""
    alloc = (len(data) + 31) & ~31
    return (
        sid.ljust(16, b"\x00")
        + struct.pack("<qq", alloc, len(data))
        + data
        + b"\x00" * (alloc - len(data))
    )


def _dv_entry(
    *,
    pixel_type: int,
    file_pos: int,
    compression: int,
    dims: list[tuple[bytes, int, int, int]],
) -> bytes:
    """DirectoryEntryDV: (name, start, size, stored_size) per dimension."""
    out = b"DV" + struct.pack("<iqii", pixel_type, file_pos, 0, compression)
    out += b"\x00" * 6  # PyramidType + spares (reader derives from sizes)
    out += struct.pack("<i", len(dims))
    for name, start, size, stored in dims:
        out += name.ljust(4, b"\x00") + struct.pack("<iifi", start, size, 0.0, stored)
    return out


def _subblock_segment(entry: bytes, payload: bytes) -> bytes:
    fixed = struct.pack("<iiq", 0, 0, len(payload))  # no metadata/attachment
    fill = max(256, 16 + len(entry)) - 16 - len(entry)
    return _segment(b"ZISRAWSUBBLOCK", fixed + entry + b"\x00" * fill + payload)


def _encode(rgb: np.ndarray, pixel_type: int, compression: int) -> tuple[bytes, np.ndarray]:
    """(payload bytes, expected RGB after the reader's round trip)."""
    h, w = rgb.shape[:2]
    if compression == COMP_JPEG:
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="JPEG", quality=95)
        back = np.asarray(Image.open(buf).convert("RGB"))
        return buf.getvalue(), back
    if pixel_type == PIX_BGR24:
        stored = rgb[:, :, ::-1].tobytes()
        expected = rgb
    elif pixel_type == PIX_GRAY8:
        gray = rgb[:, :, 0]
        stored = gray.tobytes()
        expected = np.repeat(gray[:, :, None], 3, axis=2)
    elif pixel_type == PIX_GRAY16:
        gray16 = (rgb[:, :, 0].astype(np.uint16) << 8) | 0x7F
        stored = gray16.astype("<u2").tobytes()
        expected = np.repeat(rgb[:, :, :1], 3, axis=2)
    else:
        raise AssertionError(pixel_type)
    if compression == COMP_NONE:
        return stored, expected
    if compression == COMP_ZSTD0:
        return zstd_compress(stored), expected
    if compression == COMP_ZSTD1:
        if pixel_type == PIX_GRAY16:  # hi/lo byte split before compression
            words = np.frombuffer(stored, np.uint8).reshape(-1, 2)
            planar = words[:, 0].tobytes() + words[:, 1].tobytes()
            return b"\x03\x01\x01" + zstd_compress(planar), expected
        return b"\x01" + zstd_compress(stored), expected
    raise AssertionError(compression)


BLOCK_W, BLOCK_H = 96, 64


def write_czi(
    path,
    *,
    with_jpegxr: bool = False,
    jpegxr_corrupt: bool = False,
    origin=(-1280, 512),
):
    """Write the fixture; returns (expected level-0 RGB, expected mpp).

    Level 0 is a 2×2 Bgr24/Gray16 mosaic (uncompressed, zstd0, zstd1+hilo,
    JPEG — one compression per tile); one 2×-downsampled zstd0 pyramid
    block spans the image; a C=1 block full of garbage must be ignored.
    Mosaic starts are offset by `origin` to exercise origin normalization.
    """
    rng = np.random.default_rng(11)
    ox, oy = origin
    w, h = 2 * BLOCK_W, 2 * BLOCK_H
    expected = np.empty((h, w, 3), np.uint8)

    specs = [
        (0, 0, PIX_BGR24, COMP_NONE),
        (1, 0, PIX_BGR24, COMP_ZSTD0),
        (0, 1, PIX_GRAY16, COMP_ZSTD1),
        (1, 1, PIX_BGR24, COMP_JPEG),
    ]
    segments: list[bytes] = []
    dir_entries: list[bytes] = []
    pos = 0

    def emit(seg: bytes) -> int:
        nonlocal pos
        at = pos
        segments.append(seg)
        pos += len(seg)
        return at

    # file header placeholder (fixed 512-byte data block), patched at the end
    emit(_segment(b"ZISRAWFILE", b"\x00" * 512))

    for m, (bx, by, pt, comp) in enumerate(specs):
        tile = np.full((BLOCK_H, BLOCK_W, 3), rng.integers(40, 210, 3), np.uint8)
        tile[::7] = ((tile[::7].astype(int) + 35) % 256).astype(np.uint8)
        if pt == PIX_GRAY16:  # grayscale content for the gray block
            tile[:] = tile[:, :, :1]
        payload, back = _encode(tile, pt, comp)
        expected[
            by * BLOCK_H : (by + 1) * BLOCK_H, bx * BLOCK_W : (bx + 1) * BLOCK_W
        ] = back
        dims = [
            (b"X", ox + bx * BLOCK_W, BLOCK_W, BLOCK_W),
            (b"Y", oy + by * BLOCK_H, BLOCK_H, BLOCK_H),
            (b"C", 0, 1, 1),
            (b"M", m, 1, 1),
        ]
        entry = _dv_entry(pixel_type=pt, file_pos=0, compression=comp, dims=dims)
        at = emit(_subblock_segment(entry, payload))
        dir_entries.append(
            _dv_entry(pixel_type=pt, file_pos=at, compression=comp, dims=dims)
        )

    # 2× pyramid block spanning the mosaic (stored w×h at half size)
    pyr = np.asarray(
        Image.fromarray(expected).resize((w // 2, h // 2), Image.Resampling.BILINEAR)
    )
    payload, pyr_back = _encode(pyr, PIX_BGR24, COMP_ZSTD0)
    dims = [
        (b"X", ox, w, w // 2),
        (b"Y", oy, h, h // 2),
        (b"C", 0, 1, 1),
    ]
    entry = _dv_entry(
        pixel_type=PIX_BGR24, file_pos=0, compression=COMP_ZSTD0, dims=dims
    )
    at = emit(_subblock_segment(entry, payload))
    dir_entries.append(
        _dv_entry(pixel_type=PIX_BGR24, file_pos=at, compression=COMP_ZSTD0, dims=dims)
    )

    # C=1 garbage block at the origin — first-plane selection must skip it
    garbage = np.zeros((BLOCK_H, BLOCK_W, 3), np.uint8)
    payload, _ = _encode(garbage, PIX_BGR24, COMP_NONE)
    dims = [
        (b"X", ox, BLOCK_W, BLOCK_W),
        (b"Y", oy, BLOCK_H, BLOCK_H),
        (b"C", 1, 1, 1),
    ]
    entry = _dv_entry(
        pixel_type=PIX_BGR24, file_pos=0, compression=COMP_NONE, dims=dims
    )
    at = emit(_subblock_segment(entry, payload))
    dir_entries.append(
        _dv_entry(pixel_type=PIX_BGR24, file_pos=at, compression=COMP_NONE, dims=dims)
    )

    if with_jpegxr or jpegxr_corrupt:
        # JPEG-XR block over tile (0,0): either a real payload from the
        # in-repo T.832 encoder (decoded content overlays the tile) or a
        # corrupt one (named per-block error, renders background).
        dims = [
            (b"X", ox, BLOCK_W, BLOCK_W),
            (b"Y", oy, BLOCK_H, BLOCK_H),
            (b"C", 0, 1, 1),
            (b"M", 99, 1, 1),
        ]
        if jpegxr_corrupt:
            payload = b"\x00" * 64
        else:
            try:
                from tests.jxr_util import jxr_encode
            except ImportError:
                from jxr_util import jxr_encode
            tile = np.zeros((BLOCK_H, BLOCK_W, 3), np.uint8)
            tile[:, :, 0] = np.linspace(10, 245, BLOCK_W, dtype=np.uint8)
            tile[:, :, 1] = np.linspace(245, 10, BLOCK_H, dtype=np.uint8)[:, None]
            tile[::5, :, 2] = 200
            payload = jxr_encode(tile, internal_clr=3, qp=0)  # lossless 444
            expected[:BLOCK_H, :BLOCK_W] = tile
        entry = _dv_entry(
            pixel_type=PIX_BGR24, file_pos=0, compression=COMP_JPEGXR, dims=dims
        )
        at = emit(_subblock_segment(entry, payload))
        dir_entries.append(
            _dv_entry(
                pixel_type=PIX_BGR24, file_pos=at, compression=COMP_JPEGXR, dims=dims
            )
        )

    mpp = 0.25  # 2.5e-7 m
    xml = (
        "<ImageDocument><Metadata><Scaling><Items>"
        '<Distance Id="X"><Value>2.5E-07</Value></Distance>'
        '<Distance Id="Y"><Value>2.5E-07</Value></Distance>'
        "</Items></Scaling></Metadata></ImageDocument>"
    ).encode()
    meta_pos = emit(
        _segment(
            b"ZISRAWMETADATA",
            struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml,
        )
    )

    dir_data = struct.pack("<i", len(dir_entries)) + b"\x00" * 124
    for e in dir_entries:
        dir_data += e
    dir_pos = emit(_segment(b"ZISRAWDIRECTORY", dir_data))

    # patch the real header into segment 0
    head = bytearray(512)
    struct.pack_into("<ii", head, 0, 1, 0)  # major/minor
    struct.pack_into("<q", head, 52, dir_pos)
    struct.pack_into("<q", head, 60, meta_pos)
    segments[0] = _segment(b"ZISRAWFILE", bytes(head))

    with open(path, "wb") as f:
        for seg in segments:
            f.write(seg)
    return expected, mpp
