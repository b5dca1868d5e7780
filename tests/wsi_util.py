"""Test helper: write a minimal tiled TIFF with Aperio-style JPEG2000 tiles.

PIL cannot write tiled multi-codec TIFFs, so this builds a classic
little-endian TIFF by hand: one IFD, RGB, tile grid, compression 33005
(Aperio J2K RGB), each tile a lossless raw j2k codestream.
"""

import io
import struct

import numpy as np
from PIL import Image


def write_j2k_tiff(path, arr: np.ndarray, tile: int = 128, compression: int = 33005):
    h, w, _ = arr.shape
    tiles = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            t = np.zeros((tile, tile, 3), np.uint8)
            sub = arr[ty : ty + tile, tx : tx + tile]
            t[: sub.shape[0], : sub.shape[1]] = sub
            b = io.BytesIO()
            Image.fromarray(t).save(
                b, "JPEG2000", no_jp2=True, quality_mode="lossless"
            )
            tiles.append(b.getvalue())
    n = len(tiles)
    ifd_entries = 11
    ifd_size = 2 + ifd_entries * 12 + 4
    data_start = 8 + ifd_size
    bps_off = data_start
    toff_off = bps_off + 6
    tbc_off = toff_off + 4 * n
    tile_start = tbc_off + 4 * n
    offsets = []
    pos = tile_start
    for t in tiles:
        offsets.append(pos)
        pos += len(t)

    out = io.BytesIO()
    out.write(b"II*\x00")
    out.write(struct.pack("<I", 8))

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI4s", tag, typ, cnt, val)

    def long_val(v):
        return struct.pack("<I", v)

    def short_val(v):
        return struct.pack("<HH", v, 0)

    entries = [
        entry(256, 3, 1, short_val(w)),  # ImageWidth
        entry(257, 3, 1, short_val(h)),  # ImageLength
        entry(258, 3, 3, long_val(bps_off)),  # BitsPerSample
        entry(259, 3, 1, short_val(compression)),
        entry(262, 3, 1, short_val(2)),  # Photometric RGB
        entry(277, 3, 1, short_val(3)),  # SamplesPerPixel
        entry(284, 3, 1, short_val(1)),  # PlanarConfig
        entry(322, 3, 1, short_val(tile)),  # TileWidth
        entry(323, 3, 1, short_val(tile)),  # TileLength
        entry(324, 4, n, long_val(toff_off)),  # TileOffsets
        entry(325, 4, n, long_val(tbc_off)),  # TileByteCounts
    ]
    out.write(struct.pack("<H", len(entries)))
    for e in entries:
        out.write(e)
    out.write(struct.pack("<I", 0))
    out.write(struct.pack("<HHH", 8, 8, 8))
    for o in offsets:
        out.write(struct.pack("<I", o))
    for t in tiles:
        out.write(struct.pack("<I", len(t)))
    for t in tiles:
        out.write(t)
    with open(path, "wb") as fp:
        fp.write(out.getvalue())
