"""Test helper: write a synthetic 3DHISTECH MIRAX (.mrxs) slide.

Builds the multi-file container the native reader (native/mirax.cpp)
understands: a stub ``<name>.mrxs`` file plus a ``<name>/`` directory with
``Slidedat.ini``, ``Index.dat`` and ``Data*.dat`` files holding JPEG tiles
and (optionally) a camera position buffer.

The generated profile mirrors the documented MIRAX layout: camera grid
IMAGENUMBER_X/Y split into ``divisions``² stored tiles per camera, overlap
between cameras, hierarchical index records of (image_index, offset, length,
fileno) data pages, and a VIMSLIDE_POSITION_BUFFER of 9-byte
(flag, int32 x, int32 y) camera entries.  Tiles are written in
``tile_format`` — JPEG (quality 100, no chroma subsampling, so
constant-color tiles decode bit-exactly), PNG or BMP24 (both lossless).
"""

import io
import struct
import zlib
from pathlib import Path

import numpy as np
from PIL import Image


def _tile_bytes(arr: np.ndarray, fmt: str) -> bytes:
    buf = io.BytesIO()
    if fmt == "JPEG":
        Image.fromarray(arr).save(buf, "JPEG", quality=100, subsampling=0)
    elif fmt == "PNG":
        Image.fromarray(arr).save(buf, "PNG")
    elif fmt == "BMP24":
        Image.fromarray(arr).save(buf, "BMP")  # 24-bit BI_RGB, bottom-up
    else:
        raise ValueError(f"unsupported fixture tile format {fmt!r}")
    return buf.getvalue()


def canvas_size(
    n_cams_x: int, n_cams_y: int, tile: int, divisions: int, overlap: int
) -> tuple[int, int]:
    """Level-0 extent implied by a regular camera grid."""
    cam = tile * divisions
    return (
        (n_cams_x - 1) * (cam - overlap) + cam,
        (n_cams_y - 1) * (cam - overlap) + cam,
    )


def write_mirax(
    path: Path,
    arr: np.ndarray,
    *,
    tile: int = 64,
    divisions: int = 1,
    overlap: int = 0,
    position_buffer: bool = True,
    zlib_positions: bool = False,
    camera_jitter: dict[tuple[int, int], tuple[int, int]] | None = None,
    n_levels: int = 2,
    mpp: float = 0.25,
    fill_bgr: int = 0xFFFFFF,
    drop_tiles: set[tuple[int, int]] | None = None,
    tile_format: str = "JPEG",
) -> None:
    """Write ``arr`` (H×W×3 uint8 covering the camera-grid extent) as a
    synthetic .mrxs slide at ``path`` (e.g. ``tmp/slide.mrxs``)."""
    path = Path(path)
    assert path.suffix == ".mrxs"
    datadir = path.with_suffix("")
    datadir.mkdir(parents=True, exist_ok=True)

    h, w, _ = arr.shape
    cam = tile * divisions
    adv = cam - overlap
    n_cams_x = max(1, (w - overlap + adv - 1) // adv)
    n_cams_y = max(1, (h - overlap + adv - 1) // adv)
    nx, ny = n_cams_x * divisions, n_cams_y * divisions
    camera_jitter = camera_jitter or {}
    drop_tiles = drop_tiles or set()

    # camera positions (level-0 px)
    cam_pos = {}
    for cy in range(n_cams_y):
        for cx in range(n_cams_x):
            jx, jy = camera_jitter.get((cx, cy), (0, 0))
            cam_pos[(cx, cy)] = (cx * adv + jx, cy * adv + jy)

    def tile_anchor(tx: int, ty: int) -> tuple[int, int]:
        px, py = cam_pos[(tx // divisions, ty // divisions)]
        return px + (tx % divisions) * tile, py + (ty % divisions) * tile

    def crop(ax: int, ay: int, size: int, ds: int) -> np.ndarray:
        """Fill-padded crop of ``size*ds`` square at (ax, ay), downsampled."""
        fill = (fill_bgr >> 16 & 0xFF, fill_bgr >> 8 & 0xFF, fill_bgr & 0xFF)
        out = np.empty((size * ds, size * ds, 3), np.uint8)
        out[..., 0], out[..., 1], out[..., 2] = fill[0], fill[1], fill[2]
        x1, y1 = min(ax + size * ds, w), min(ay + size * ds, h)
        if x1 > ax and y1 > ay:
            out[: y1 - ay, : x1 - ax] = arr[ay:y1, ax:x1]
        if ds == 1:
            return out
        img = Image.fromarray(out).resize((size, size), Image.Resampling.BILINEAR)
        return np.asarray(img)

    # ---- data files: tiles per level, then the position buffer ------------
    data_files: list[bytes] = []
    level_entries: list[list[tuple[int, int, int, int]]] = []
    for lvl in range(n_levels):
        concat = 2**lvl
        gnx = (nx + concat - 1) // concat
        gny = (ny + concat - 1) // concat
        blob = io.BytesIO()
        entries = []
        for gy in range(gny):
            for gx in range(gnx):
                if lvl == 0 and (gx, gy) in drop_tiles:
                    continue
                ax, ay = tile_anchor(gx * concat, gy * concat)
                jpg = _tile_bytes(crop(ax, ay, tile, concat), tile_format)
                # index on the LEVEL-0 image grid at every zoom level (the
                # OpenSlide .mrxs convention the native reader decodes)
                index0 = (gy * concat) * nx + (gx * concat)
                entries.append((index0, blob.tell(), len(jpg), lvl))
                blob.write(jpg)
        data_files.append(blob.getvalue())
        level_entries.append(entries)

    pos_fileno = None
    if position_buffer:
        buf = io.BytesIO()
        for cy in range(n_cams_y):
            for cx in range(n_cams_x):
                px, py = cam_pos[(cx, cy)]
                buf.write(struct.pack("<Bii", 1, px, py))
        raw = buf.getvalue()
        if zlib_positions:
            raw = zlib.compress(raw)
        pos_fileno = len(data_files)
        data_files.append(raw)

    fnames = [f"Data{i:04d}.dat" for i in range(len(data_files))]
    for name, blob in zip(fnames, data_files):
        (datadir / name).write_bytes(blob)

    # ---- Index.dat ---------------------------------------------------------
    slide_id = "0123456789ABCDEF0123456789ABCDEF"
    out = io.BytesIO()
    out.write(b"01.02")
    out.write(slide_id.encode())
    header_end = out.tell() + 8  # two root pointers follow

    n_hier_records = n_levels
    n_nonhier_records = 1 if position_buffer else 0
    hier_root = header_end
    nonhier_root = hier_root + 4 * n_hier_records
    records_start = nonhier_root + 4 * n_nonhier_records

    # each record: (0, page_ptr) header then one page
    record_ptrs = []
    pages = io.BytesIO()

    def add_record(entry_ints: list[tuple[int, ...]]) -> int:
        rec_at = records_start + pages.tell()
        page_at = rec_at + 8
        pages.write(struct.pack("<ii", 0, page_at))
        pages.write(struct.pack("<ii", len(entry_ints), 0))
        for e in entry_ints:
            pages.write(struct.pack(f"<{len(e)}i", *e))
        return rec_at

    for lvl in range(n_levels):
        record_ptrs.append(
            add_record([(i, off, ln, fno) for i, off, ln, fno in level_entries[lvl]])
        )
    nonhier_ptrs = []
    if position_buffer:
        blob = data_files[pos_fileno]
        nonhier_ptrs.append(add_record([(0, len(blob), pos_fileno)]))

    out.write(struct.pack("<ii", hier_root, nonhier_root))
    for p in record_ptrs:
        out.write(struct.pack("<i", p))
    for p in nonhier_ptrs:
        out.write(struct.pack("<i", p))
    out.write(pages.getvalue())
    (datadir / "Index.dat").write_bytes(out.getvalue())

    # ---- Slidedat.ini -------------------------------------------------------
    lines = [
        "[GENERAL]",
        "SLIDE_VERSION = 1.9",
        f"SLIDE_ID = {slide_id}",
        f"IMAGENUMBER_X = {nx}",
        f"IMAGENUMBER_Y = {ny}",
        f"CameraImageDivisionsPerSide = {divisions}",
        "",
        "[HIERARCHICAL]",
        "HIER_COUNT = 1",
        "HIER_0_NAME = Slide zoom level",
        f"HIER_0_COUNT = {n_levels}",
        "INDEXFILE = Index.dat",
        f"NONHIER_COUNT = {1 if position_buffer else 0}",
    ]
    for lvl in range(n_levels):
        lines += [
            f"HIER_0_VAL_{lvl} = ZoomLevel_{lvl}",
            f"HIER_0_VAL_{lvl}_SECTION = LAYER_0_LEVEL_{lvl}_SECTION",
        ]
    if position_buffer:
        name = "StitchingIntensityLayer" if zlib_positions else "VIMSLIDE_POSITION_BUFFER"
        lines += [
            f"NONHIER_0_NAME = {name}",
            "NONHIER_0_COUNT = 1",
            "NONHIER_0_VAL_0 = PositionBuffer",
        ]
    lines += [
        "",
        "[DATAFILE]",
        f"FILE_COUNT = {len(fnames)}",
    ]
    lines += [f"FILE_{i} = {n}" for i, n in enumerate(fnames)]
    for lvl in range(n_levels):
        lines += [
            "",
            f"[LAYER_0_LEVEL_{lvl}_SECTION]",
            f"DIGITIZER_WIDTH = {cam}",
            f"DIGITIZER_HEIGHT = {cam}",
            f"OVERLAP_X = {float(overlap * 2**lvl)}",
            f"OVERLAP_Y = {float(overlap * 2**lvl)}",
            f"IMAGE_FORMAT = {tile_format}",
            f"IMAGE_FILL_COLOR_BGR = {fill_bgr}",
            f"MICROMETER_PER_PIXEL_X = {mpp * 2**lvl}",
            f"MICROMETER_PER_PIXEL_Y = {mpp * 2**lvl}",
            f"IMAGE_CONCAT_FACTOR = {2**lvl}",
        ]
    # UTF-8 BOM + CRLF like real scanners
    (datadir / "Slidedat.ini").write_bytes(
        b"\xef\xbb\xbf" + "\r\n".join(lines).encode() + b"\r\n"
    )

    # stub .mrxs file (real scanners put a BMP preview here; content unused)
    path.write_bytes(b"BM" + b"\x00" * 62)
