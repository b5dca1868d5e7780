"""Synthetic ≥4 GiB Hamamatsu-NDPI fixture (sparse file).

Builds a classic little-endian TIFF whose directory chain and strip data
cross the 4 GiB boundary, storing every offset as its *wrapped* low 32
bits — exactly the situation real >4 GiB NDPI scanner files are in (the
convention native/ndpi.cpp reconstructs).  The file is sparse: only a few
hundred KiB of real data, but ``os.stat().st_size`` > 4 GiB, which is what
routes it to the offset-reconstructing backend.

Layout (exercising both fixup branches):
  * header + IFD A (the smaller pyramid level) in the first 4 GiB window;
    its strip data follows it in the same window (no-bump branch).
  * IFD A's next-IFD pointer stores a value *smaller than its own offset*
    → reconstructs into the second window (bump branch).
  * IFD B (level 0) and its strips live above 4 GiB; their stored offsets
    are the wrapped low bits (no-bump branch within window 1).
"""

import io
import struct

import numpy as np
from PIL import Image

WINDOW = 1 << 32

# TIFF tag/type constants
_SHORT, _LONG, _RATIONAL = 3, 4, 5


def level0_pixels(width: int = 128, height: int = 96) -> np.ndarray:
    """Deterministic RGB test pattern for the level-0 image."""
    ys, xs = np.mgrid[0:height, 0:width]
    return np.stack(
        [(xs * 3 + ys) % 256, ys % 256, (xs ^ ys) % 256], axis=-1
    ).astype(np.uint8)


def _ifd(entries: list[tuple[int, int, int, int]], next_off_stored: int) -> bytes:
    """Serialize an IFD from (tag, type, count, value) entries."""
    out = struct.pack("<H", len(entries))
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHII", tag, typ, count, value)
    return out + struct.pack("<I", next_off_stored)


def write_big_ndpi(path) -> np.ndarray:
    """Write the sparse fixture; returns the expected level-0 RGB array."""
    rgb0 = level0_pixels()
    h0, w0 = rgb0.shape[:2]
    rows_per_strip = h0 // 2
    strips0 = [
        rgb0[:rows_per_strip].tobytes(),
        rgb0[rows_per_strip:].tobytes(),
    ]

    # level 1: solid color, JPEG-compressed (exercises the JPEG strip path)
    w1, h1 = w0 // 2, h0 // 2
    rgb1 = np.full((h1, w1, 3), (120, 130, 140), np.uint8)
    jpeg1 = io.BytesIO()
    Image.fromarray(rgb1).save(jpeg1, format="JPEG", quality=95)
    strip1 = jpeg1.getvalue()

    with open(path, "wb") as f:
        # --- window 0: header, IFD A (level 1), its arrays + strip -------
        ifd_a_off = 16
        # IFD A has 10 entries (120 B) + count/next (6 B)
        arrays_a = ifd_a_off + 2 + 10 * 12 + 4
        bps_off = arrays_a  # BitsPerSample [8,8,8]
        xres_off = arrays_a + 8  # RATIONAL (8 bytes)
        strip1_off = arrays_a + 16

        entries_a = [
            (256, _LONG, 1, w1),
            (257, _LONG, 1, h1),
            (258, _SHORT, 3, bps_off),
            (259, _SHORT, 1, 7),  # JPEG
            (262, _SHORT, 1, 2),  # RGB
            (273, _LONG, 1, strip1_off),
            (277, _SHORT, 1, 3),
            (278, _LONG, 1, h1),
            (279, _LONG, 1, len(strip1)),
            (296, _SHORT, 1, 3),  # unit: cm
        ]
        # next IFD really lives at WINDOW + 8; stored wrapped as 8 (< 16,
        # the referencing directory's offset → reader must bump a window)
        ifd_b_real = WINDOW + 8
        f.write(b"II*\x00" + struct.pack("<I", ifd_a_off))
        f.seek(ifd_a_off)
        f.write(_ifd(entries_a, ifd_b_real % WINDOW))
        f.seek(bps_off)
        f.write(struct.pack("<HHH", 8, 8, 8))
        f.seek(xres_off)
        f.write(struct.pack("<II", 10000, 1))  # unused for level 1
        f.seek(strip1_off)
        f.write(strip1)

        # --- window 1: IFD B (level 0), arrays, two strips ---------------
        # IFD B has 11 entries (132 B) + count/next (6 B)
        arrays_b = ifd_b_real + 2 + 11 * 12 + 4
        bps_b = arrays_b
        xres_b = arrays_b + 8
        offsets_arr = arrays_b + 16  # two LONGs
        counts_arr = arrays_b + 24
        strip0_a = WINDOW + 0x10000
        strip0_b = WINDOW + 0x20000

        entries_b = [
            (256, _LONG, 1, w0),
            (257, _LONG, 1, h0),
            (258, _SHORT, 3, bps_b % WINDOW),
            (259, _SHORT, 1, 1),  # uncompressed
            (262, _SHORT, 1, 2),
            (273, _LONG, 2, offsets_arr % WINDOW),
            (277, _SHORT, 1, 3),
            (278, _LONG, 1, rows_per_strip),
            (279, _LONG, 2, counts_arr % WINDOW),
            (282, _RATIONAL, 1, xres_b % WINDOW),
            (296, _SHORT, 1, 3),
        ]
        f.seek(ifd_b_real)
        f.write(_ifd(entries_b, 0))
        f.seek(bps_b)
        f.write(struct.pack("<HHH", 8, 8, 8))
        f.seek(xres_b)
        f.write(struct.pack("<II", 10000, 1))  # 10000 px/cm = 1 µm/px
        f.seek(offsets_arr)
        f.write(struct.pack("<II", strip0_a % WINDOW, strip0_b % WINDOW))
        f.seek(counts_arr)
        f.write(struct.pack("<II", len(strips0[0]), len(strips0[1])))
        f.seek(strip0_a)
        f.write(strips0[0])
        f.seek(strip0_b)
        f.write(strips0[1])

    return rgb0
