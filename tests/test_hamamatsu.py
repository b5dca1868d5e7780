"""Hamamatsu VMS/VMU reader tests (native/vms.cpp, native/jpegrt.cpp).

The reference opens these through OpenSlide (reference
src/stamp/preprocessing/__init__.py:43-56).  Fixtures are synthetic
(tests/hamamatsu_util.py): real restart-marker JPEGs written by Pillow's
encoder for VMS, an NGR raster for VMU — so the random-access chunk
decoder is validated against a stock encoder's output, and the NGR path
against exact pixels.
"""

import numpy as np
import pytest

from hamamatsu_util import write_vms, write_vmu


@pytest.fixture(scope="module")
def native():
    from stamp_tpu.preprocessing.wsi import _load_native

    lib = _load_native()
    if lib is None:
        pytest.skip("native reader not built")
    return lib


@pytest.fixture(scope="module")
def vms_slide(tmp_path_factory, native):
    d = tmp_path_factory.mktemp("vms")
    stub, mosaic = write_vms(d)
    return stub, mosaic


def test_vms_opens_with_metadata(vms_slide):
    from stamp_tpu.preprocessing.wsi import CTiffSlide, open_slide

    stub, mosaic = vms_slide
    slide = open_slide(stub)
    assert isinstance(slide, CTiffSlide)
    assert slide.dimensions == (mosaic.shape[1], mosaic.shape[0])
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(
        0.46, rel=1e-6
    )
    assert "VMS" in slide.properties["tiff.ImageDescription"]


def test_vms_full_read_matches_pil(vms_slide):
    """The restart-chunk decoder must reproduce a stock decoder's output.
    Both sides decode the same entropy bytes; only IDCT rounding may
    differ between Pillow's bundled libjpeg and the system one."""
    from stamp_tpu.preprocessing.wsi import open_slide

    stub, mosaic = vms_slide
    slide = open_slide(stub)
    h, w = mosaic.shape[:2]
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    assert np.abs(full.astype(int) - mosaic.astype(int)).max() <= 3


def test_vms_subregions_consistent(vms_slide):
    """Random-access reads must equal the same window of the full read
    bit-exactly — this is what catches chunk-index or blit errors."""
    from stamp_tpu.preprocessing.wsi import open_slide

    stub, mosaic = vms_slide
    slide = open_slide(stub)
    h, w = mosaic.shape[:2]
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    # windows crossing chunk seams (chunk is 32×8 px), the JPEG-cell seam
    # at x=128 / y=64, and the slide edge
    for x, y, rw, rh in [
        (0, 0, 33, 9),
        (30, 6, 40, 10),
        (120, 60, 20, 10),  # crosses both cell seams
        (100, 30, 60, 50),
        (w - 10, h - 5, 20, 10),  # runs past the edge → white fill
    ]:
        win = np.asarray(
            slide.read_region((x, y), 0, (rw, rh)).convert("RGB")
        )
        vis_w, vis_h = min(rw, w - x), min(rh, h - y)
        np.testing.assert_array_equal(
            win[:vis_h, :vis_w], full[y : y + vis_h, x : x + vis_w]
        )
        assert np.all(win[vis_h:] == 255) and np.all(win[:, vis_w:] == 255)


def test_vms_map_file_is_thumbnail_level(vms_slide):
    from stamp_tpu.preprocessing.wsi import open_slide

    stub, mosaic = vms_slide
    slide = open_slide(stub)
    thumb = np.asarray(slide.get_thumbnail((64, 32)).convert("RGB"))
    assert thumb.shape[2] == 3 and max(thumb.shape[:2]) <= 64
    # thumbnail comes from the MapFile: content must resemble the mosaic
    ref = np.asarray(
        __import__("PIL.Image", fromlist=["Image"])
        .fromarray(mosaic)
        .resize((thumb.shape[1], thumb.shape[0]))
    )
    assert np.abs(thumb.astype(int) - ref.astype(int)).mean() < 16


def test_vms_band_restart_interval(tmp_path, native):
    """Restart interval ≥ MCUs/row (a multiple of it) → full-width band
    chunks, the second geometry real scanners emit."""
    from stamp_tpu.preprocessing.wsi import open_slide

    # 64 px wide 4:4:4 → 8 MCUs/row; RI=16 → bands of 2 MCU rows
    stub, mosaic = write_vms(
        tmp_path, cols=1, rows=1, cell_w=64, cell_h=48, restart_interval=16
    )
    slide = open_slide(stub)
    full = np.asarray(slide.read_region((0, 0), 0, (64, 48)).convert("RGB"))
    assert np.abs(full.astype(int) - mosaic.astype(int)).max() <= 3
    win = np.asarray(slide.read_region((5, 13), 0, (20, 10)).convert("RGB"))
    np.testing.assert_array_equal(win, full[13:23, 5:25])


def test_vmu_exact_pixels(tmp_path, native):
    """NGR is uncompressed → byte-exact reads, including strip seams."""
    from stamp_tpu.preprocessing.wsi import CTiffSlide, open_slide

    stub, rgb = write_vmu(tmp_path)
    slide = open_slide(stub)
    assert isinstance(slide, CTiffSlide)
    h, w = rgb.shape[:2]
    assert slide.dimensions == (w, h)
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(
        0.23, rel=1e-6
    )
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    np.testing.assert_array_equal(full, rgb)
    # window crossing the strip seam at x=32 and the bottom edge
    win = np.asarray(slide.read_region((28, 35), 0, (10, 10)).convert("RGB"))
    np.testing.assert_array_equal(win[:5], rgb[35:40, 28:38])
    assert np.all(win[5:] == 255)


def test_vms_missing_cell_fails_with_reason(tmp_path, native):
    from stamp_tpu.preprocessing.wsi import UnsupportedFormatError, open_slide

    stub, _ = write_vms(tmp_path, cols=1, rows=1)
    import os

    os.remove(f"{tmp_path}/cell_0_0.jpg")
    with pytest.raises(UnsupportedFormatError, match="cell_0_0"):
        open_slide(stub)


def test_czi_still_fails_fast(tmp_path):
    from stamp_tpu.preprocessing.wsi import UnsupportedFormatError, open_slide

    p = tmp_path / "slide.czi"
    p.write_bytes(b"ZISRAWFILE" + b"\x00" * 64)
    with pytest.raises(UnsupportedFormatError, match="czi"):
        open_slide(p)
