"""Synthetic Leica SCN fixture.

Hand-rolls a classic little-endian TIFF shaped like a Leica SC400/AT2
export: the first directory carries the collection XML in
ImageDescription, a low-resolution macro overview covers the whole
collection, and one or more "main" images sit at view offsets inside it,
each with a 2-level pyramid.  Dimensions in the XML are nanometers;
``ifd`` attributes index the TIFF directory chain — exactly the contract
native/scn.cpp implements (and OpenSlide's leica driver defines).

Directories are tiled, Deflate-compressed RGB (real scanners emit JPEG
tiles — both reach the same libtiff RGBA read path).  Uncompressed tiles
are deliberately avoided: libtiff 4.5.0's COMPRESSION_NONE fast path in
no-mmap ("rm") mode rejects the read with "Invalid tile byte count ...
Expected 768, got 1024" even for well-formed files.
"""

import struct
import zlib

import numpy as np

_SHORT, _LONG, _ASCII = 3, 4, 2
_TILE = 16

SCN_NS = "http://www.leica-microsystems.com/scn/2010/10/01"


def _downsample2(arr: np.ndarray) -> np.ndarray:
    h, w = arr.shape[:2]
    h2, w2 = h // 2 * 2, w // 2 * 2
    a = arr[:h2, :w2].astype(np.uint32)
    return (
        (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2] + 2) // 4
    ).astype(np.uint8)


class _TiffBuilder:
    def __init__(self) -> None:
        self.buf = bytearray(struct.pack("<2sHI", b"II", 42, 0))
        self._ifd_link_pos = 4  # where the next-IFD offset gets patched in

    def _append(self, data: bytes) -> int:
        if len(self.buf) % 2:  # TIFF offsets must be word-aligned
            self.buf += b"\0"
        off = len(self.buf)
        self.buf += data
        return off

    def add_dir(
        self,
        arr: np.ndarray,
        description: str | None = None,
        resolution_px_per_cm: float | None = None,
    ) -> int:
        """Append one tiled directory; returns its directory index.

        ``arr`` is (h, w, 3) uint8 for RGB or (h, w) uint8 for grayscale
        (min-is-black, the layout multiplexed QPTIFF bands use).
        """
        gray = arr.ndim == 2
        spp = 1 if gray else 3
        h, w = arr.shape[:2]
        tiles_x = -(-w // _TILE)
        tiles_y = -(-h // _TILE)
        pad_shape = (tiles_y * _TILE, tiles_x * _TILE) + (() if gray else (3,))
        padded = np.full(pad_shape, 255, np.uint8)
        padded[:h, :w] = arr

        offsets, counts = [], []
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                tile = zlib.compress(
                    padded[
                        ty * _TILE : (ty + 1) * _TILE,
                        tx * _TILE : (tx + 1) * _TILE,
                    ].tobytes()
                )
                offsets.append(self._append(tile))
                counts.append(len(tile))

        offs_off = self._append(struct.pack(f"<{len(offsets)}I", *offsets))
        cnts_off = self._append(struct.pack(f"<{len(counts)}I", *counts))

        entries = [
            (256, _LONG, 1, w),
            (257, _LONG, 1, h),
            (259, _SHORT, 1, 8),  # Deflate (zlib)
            (262, _SHORT, 1, 1 if gray else 2),  # min-is-black / RGB
            (277, _SHORT, 1, spp),
            (284, _SHORT, 1, 1),
            (322, _LONG, 1, _TILE),
            (323, _LONG, 1, _TILE),
            (324, _LONG, len(offsets), offs_off),
            (325, _LONG, len(counts), cnts_off),
        ]
        if gray:
            entries.append((258, _SHORT, 1, 8))
        else:
            bits_off = self._append(struct.pack("<3H", 8, 8, 8))
            entries.append((258, _SHORT, 3, bits_off))
        if resolution_px_per_cm is not None:
            # XResolution/YResolution as RATIONALs, ResolutionUnit = cm
            num = int(round(resolution_px_per_cm * 1000))
            rat = self._append(struct.pack("<2I", num, 1000))
            rat2 = self._append(struct.pack("<2I", num, 1000))
            entries.append((282, 5, 1, rat))
            entries.append((283, 5, 1, rat2))
            entries.append((296, _SHORT, 1, 3))
        if description is not None:
            raw = description.encode() + b"\0"
            entries.append((270, _ASCII, len(raw), self._append(raw)))

        ifd = struct.pack("<H", len(entries))
        for tag, typ, count, value in sorted(entries):
            ifd += struct.pack("<HHII", tag, typ, count, value)
        ifd += struct.pack("<I", 0)
        ifd_off = self._append(ifd)
        struct.pack_into("<I", self.buf, self._ifd_link_pos, ifd_off)
        self._ifd_link_pos = ifd_off + 2 + 12 * len(entries)
        self._n_dirs = getattr(self, "_n_dirs", 0) + 1
        return self._n_dirs - 1

    def write(self, path) -> None:
        with open(path, "wb") as f:
            f.write(self.buf)


def write_scn(
    path,
    mains: list[dict],
    *,
    collection_nm: tuple[int, int] = (20_000_000, 20_000_000),
    macro_px: int = 64,
    extra_xml: str = "",
) -> None:
    """Write a synthetic SCN file.

    Each entry of ``mains``: {"arr": HxWx3 uint8 level-0 pixels,
    "offset_nm": (x, y), "nm_per_px": float}.  A macro overview covering
    the whole collection is emitted first (its directory carries the XML),
    followed by each main image's 2-level pyramid.
    """
    b = _TiffBuilder()

    # reserve dir 0 for the macro; XML must reference later dirs, so build
    # the image XML fragments as we append directories
    macro_arr = np.full((macro_px, macro_px, 3), 230, np.uint8)
    cw, ch = collection_nm

    # plan directory indices: dir 0 = macro, then 2 per main image
    fragments = []
    for i, m in enumerate(mains):
        arr = m["arr"]
        h, w = arr.shape[:2]
        nm_per_px = m["nm_per_px"]
        ox, oy = m["offset_nm"]
        view_w = int(round(w * nm_per_px))
        view_h = int(round(h * nm_per_px))
        ifd0 = 1 + 2 * i
        l1 = _downsample2(arr)
        fragments.append(
            f'<image name="image_{i}">'
            f'<view sizeX="{view_w}" sizeY="{view_h}" '
            f'offsetX="{ox}" offsetY="{oy}"/>'
            f'<pixels sizeX="{w}" sizeY="{h}">'
            f'<dimension sizeX="{w}" sizeY="{h}" r="0" ifd="{ifd0}"/>'
            f'<dimension sizeX="{l1.shape[1]}" sizeY="{l1.shape[0]}" '
            f'r="1" ifd="{ifd0 + 1}"/>'
            f"</pixels></image>"
        )

    macro_fragment = (
        '<image name="macro">'
        f'<view sizeX="{cw}" sizeY="{ch}" offsetX="0" offsetY="0"/>'
        f'<pixels sizeX="{macro_px}" sizeY="{macro_px}">'
        f'<dimension sizeX="{macro_px}" sizeY="{macro_px}" r="0" ifd="0"/>'
        "</pixels></image>"
    )
    xml = (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f'<scn xmlns="{SCN_NS}">'
        f'<collection sizeX="{cw}" sizeY="{ch}">'
        + macro_fragment
        + "".join(fragments)
        + extra_xml
        + "</collection></scn>"
    )

    b.add_dir(macro_arr, description=xml)
    for m in mains:
        b.add_dir(m["arr"])
        b.add_dir(_downsample2(m["arr"]))
    b.write(path)
