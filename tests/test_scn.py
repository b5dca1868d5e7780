"""Leica SCN vendor semantics (native/scn.cpp).

The reference reads .scn through OpenSlide's leica driver
(/root/reference/src/stamp/preprocessing/__init__.py:43-56); these tests
pin the semantics that generic-TIFF reading gets wrong: macro exclusion,
main-image placement in collection space, XML-derived mpp, and loud
errors for malformed/fluorescence collections.
"""

import numpy as np
import pytest

from scn_util import _downsample2, write_scn
from stamp_tpu.preprocessing.wsi import CTiffSlide


def _pattern(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def _rgb(slide, xy, size):
    return np.array(slide.read_region(xy, 0, size))[:, :, :3]


def test_scn_single_main_image(tmp_path):
    """One main image: the macro is excluded, level 0 is the main image's
    pixels, and mpp comes from the XML view/pixel sizes."""
    arr = _pattern(100, 120, 0)  # not a tile multiple: exercises edge tiles
    path = tmp_path / "slide.scn"
    write_scn(
        path,
        [{"arr": arr, "offset_nm": (3_000_000, 4_000_000), "nm_per_px": 250.0}],
    )
    slide = CTiffSlide(path)
    assert slide.dimensions == (120, 100)
    # 250 nm/px = 0.25 µm/px
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(
        0.25, rel=1e-6
    )
    np.testing.assert_array_equal(_rgb(slide, (0, 0), (120, 100)), arr)
    # out-of-bounds reads fill white
    region = _rgb(slide, (100, 80), (40, 40))
    np.testing.assert_array_equal(region[:20, :20], arr[80:, 100:])
    assert (region[20:, :] == 255).all()
    assert (region[:, 20:] == 255).all()


def test_scn_levels(tmp_path):
    """Rank-1 dimensions are exposed as pyramid levels."""
    arr = _pattern(96, 96, 1)
    path = tmp_path / "slide.scn"
    write_scn(path, [{"arr": arr, "offset_nm": (0, 0), "nm_per_px": 500.0}])
    slide = CTiffSlide(path)
    assert slide.level_count == 2
    assert slide.level_dimensions[1] == (48, 48)
    thumb = np.array(slide.get_thumbnail((48, 48)).convert("RGB"))
    np.testing.assert_array_equal(thumb, _downsample2(arr))


def test_scn_two_main_images_stitched(tmp_path):
    """Two grid-aligned main images compose onto one collection plane with
    a white gap between them (the glass), like OpenSlide's leica stitch."""
    a = _pattern(64, 64, 2)
    c = _pattern(64, 64, 3)
    nmpp = 1000.0
    path = tmp_path / "slide.scn"
    write_scn(
        path,
        [
            {"arr": a, "offset_nm": (1_000_000, 2_000_000), "nm_per_px": nmpp},
            # 32 px gap to the right of image a
            {"arr": c, "offset_nm": (1_096_000, 2_000_000), "nm_per_px": nmpp},
        ],
    )
    slide = CTiffSlide(path)
    # canvas = union of the two views: (64 + 32 + 64) x 64 px
    assert slide.dimensions == (160, 64)
    full = _rgb(slide, (0, 0), (160, 64))
    np.testing.assert_array_equal(full[:, :64], a)
    assert (full[:, 64:96] == 255).all()  # the gap is background
    np.testing.assert_array_equal(full[:, 96:], c)


def test_scn_fluorescence_rejected_loudly(tmp_path):
    arr = _pattern(32, 32, 4)
    path = tmp_path / "slide.scn"
    write_scn(
        path,
        [{"arr": arr, "offset_nm": (0, 0), "nm_per_px": 250.0}],
        extra_xml=(
            '<image name="fl"><view sizeX="8000" sizeY="8000" '
            'offsetX="1000" offsetY="1000"/>'
            '<pixels sizeX="32" sizeY="32">'
            '<dimension sizeX="32" sizeY="32" r="0" c="0" ifd="1"/>'
            "</pixels></image>"
        ),
    )
    with pytest.raises(RuntimeError, match="fluorescence"):
        CTiffSlide(path)


def test_scn_malformed_xml_is_named(tmp_path):
    arr = _pattern(32, 32, 5)
    path = tmp_path / "slide.scn"
    write_scn(path, [{"arr": arr, "offset_nm": (0, 0), "nm_per_px": 250.0}])
    blob = path.read_bytes()
    # truncate the collection XML mid-element
    broken = blob.replace(b"</collection></scn>", b"</collection></scnX")
    path.write_bytes(broken)
    with pytest.raises(RuntimeError, match="SCN"):
        CTiffSlide(path)


def test_scn_missing_ifd_is_named(tmp_path):
    arr = _pattern(32, 32, 6)
    path = tmp_path / "slide.scn"
    write_scn(path, [{"arr": arr, "offset_nm": (0, 0), "nm_per_px": 250.0}])
    blob = path.read_bytes()
    path.write_bytes(blob.replace(b'r="1" ifd="2"', b'r="1" ifd="9"'))
    with pytest.raises(RuntimeError, match="IFD"):
        CTiffSlide(path)
