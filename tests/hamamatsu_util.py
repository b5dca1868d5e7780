"""Synthetic Hamamatsu VMS/VMU fixtures (native/vms.cpp, native/jpegrt.cpp).

The reference reads both formats through OpenSlide (reference
src/stamp/preprocessing/__init__.py:43-56).  These builders emit the same
on-disk shape real scanners produce:

* ``write_vms`` — an INI stub with a ``[Virtual Microscope Specimen]``
  section next to a grid of restart-marker baseline JPEGs (DRI segment +
  RSTn markers every ``restart_interval`` MCUs) and a low-res MapFile.
  Written with Pillow's ``restart_marker_blocks`` so the entropy stream is
  produced by a stock encoder, not by the code under test.
* ``write_vmu`` — an INI stub with an ``[Uncompressed Virtual Microscope
  Specimen]`` section next to an NGR raster ("GN" magic, LE int32
  width/height/column-width at offsets 4/8/12, pixel-data offset at 24,
  16-bit LE RGB samples in vertical strips of ``column_width`` pixels).
"""

import numpy as np
from PIL import Image


def cell_pixels(w: int, h: int, seed: int) -> np.ndarray:
    """Smooth deterministic RGB pattern (JPEG-friendly, seam-revealing)."""
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xs * 2 + ys + 37 * seed) % 256,
            (ys * 3 + 11 * seed) % 256,
            (xs + ys * 2 + 73 * seed) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def save_rt_jpeg(path, rgb: np.ndarray, restart_interval: int) -> None:
    """Baseline 4:4:4 JPEG with a DRI restart interval (8×8-px MCUs)."""
    Image.fromarray(rgb).save(
        path,
        format="JPEG",
        quality=95,
        subsampling=0,  # 4:4:4 → MCU is 8×8 px
        restart_marker_blocks=restart_interval,
    )


def write_vms(
    dirpath,
    *,
    cols: int = 2,
    rows: int = 2,
    cell_w: int = 128,
    cell_h: int = 64,
    restart_interval: int = 4,
    mpp: float = 0.46,
) -> tuple[str, np.ndarray]:
    """Build a ``cols``×``rows`` VMS specimen; returns (stub path, the
    PIL-decoded mosaic the reader should reproduce)."""
    dirpath = str(dirpath)
    lines = [
        "[Virtual Microscope Specimen]",
        "NoLayers=1",
        f"NoJpegColumns={cols}",
        f"NoJpegRows={rows}",
        "SourceLens=20",
    ]
    mosaic = np.empty((rows * cell_h, cols * cell_w, 3), np.uint8)
    for r in range(rows):
        for c in range(cols):
            fname = f"cell_{c}_{r}.jpg"
            rgb = cell_pixels(cell_w, cell_h, seed=r * cols + c)
            save_rt_jpeg(f"{dirpath}/{fname}", rgb, restart_interval)
            # decode back with PIL so the expectation shares the lossy step
            decoded = np.asarray(
                Image.open(f"{dirpath}/{fname}").convert("RGB")
            )
            mosaic[
                r * cell_h : (r + 1) * cell_h, c * cell_w : (c + 1) * cell_w
            ] = decoded
            if c == 0 and r == 0:
                key = "ImageFile"
            elif r == 0:
                key = f"ImageFile({c})"  # real single-row stubs omit ,0
            else:
                key = f"ImageFile({c},{r})"
            lines.append(f"{key}={fname}")

    # low-res overview → pyramid level 1
    map_img = Image.fromarray(mosaic).resize(
        (cols * cell_w // 4, rows * cell_h // 4), Image.Resampling.BILINEAR
    )
    map_img.save(f"{dirpath}/map.jpg", format="JPEG", quality=95)
    lines.append("MapFile=map.jpg")

    # PhysicalWidth is the specimen width in nanometres
    lines.append(f"PhysicalWidth={mpp * cols * cell_w * 1000:.0f}")
    stub = f"{dirpath}/slide.vms"
    with open(stub, "w", newline="\r\n") as f:  # scanners write CRLF
        f.write("\n".join(lines) + "\n")
    return stub, mosaic


def write_vmu(
    dirpath,
    *,
    width: int = 96,
    height: int = 40,
    column_width: int = 32,
    mpp: float = 0.23,
) -> tuple[str, np.ndarray]:
    """Build a VMU specimen over an NGR raster; returns (stub path, the
    exact 8-bit RGB the reader should reproduce)."""
    assert width % column_width == 0
    dirpath = str(dirpath)
    rgb = cell_pixels(width, height, seed=5)

    data_off = 256  # anything ≥ header size works; real files use ~4 KiB
    hdr = bytearray(data_off)
    hdr[0:4] = b"GN\x01\x00"
    hdr[4:8] = int(width).to_bytes(4, "little")
    hdr[8:12] = int(height).to_bytes(4, "little")
    hdr[12:16] = int(column_width).to_bytes(4, "little")
    hdr[24:28] = int(data_off).to_bytes(4, "little")

    # vertical strips of column_width px, row-major inside each strip,
    # 16-bit LE samples with the payload in the high byte
    samples = np.empty(
        (width // column_width, height, column_width, 3), np.uint16
    )
    for s in range(width // column_width):
        samples[s] = rgb[:, s * column_width : (s + 1) * column_width].astype(
            np.uint16
        ) << 8
    with open(f"{dirpath}/image.ngr", "wb") as f:
        f.write(bytes(hdr))
        f.write(samples.astype("<u2").tobytes())

    stub = f"{dirpath}/slide.vmu"
    with open(stub, "w", newline="\r\n") as f:
        f.write(
            "[Uncompressed Virtual Microscope Specimen]\n"
            "ImageFile=image.ngr\n"
            f"PhysicalWidth={mpp * width * 1000:.0f}\n"
        )
    return stub, rgb
