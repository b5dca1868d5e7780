"""Ventana BIF vendor semantics (native/bif.cpp).

The reference reads .bif through OpenSlide's ventana driver
(/root/reference/src/stamp/preprocessing/__init__.py:43-56).  These tests
pin what generic-TIFF reading gets wrong: mpp from the iScan XML (BIF
files carry no generic resolution tags), auxiliary-image exclusion, and
the loud refusal of unstitched multi-AOI mosaics whose raw directory grid
would yield silently wrong level-0 geometry.
"""

import numpy as np
import pytest

from bif_util import write_bif
from scn_util import _downsample2
from stamp_tpu.preprocessing.wsi import CTiffSlide


def _pattern(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_bif_reads_and_mpp_from_iscan(tmp_path):
    arr = _pattern(96, 128, 0)
    path = tmp_path / "slide.bif"
    write_bif(path, arr, mpp=0.465)
    slide = CTiffSlide(path)
    assert slide.dimensions == (128, 96)
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(0.465)
    region = np.array(slide.read_region((0, 0), 0, (128, 96)))[:, :, :3]
    np.testing.assert_array_equal(region, arr)


def test_bif_excludes_thumbnail_and_label(tmp_path):
    arr = _pattern(96, 128, 1)
    path = tmp_path / "slide.bif"
    write_bif(path, arr)
    slide = CTiffSlide(path)
    # pyramid = level 0 + level 1 only; Thumbnail (32×32) and Label (24×24)
    # must not appear as levels
    assert slide.level_count == 2
    assert slide.level_dimensions == ((128, 96), (64, 48))
    thumb = np.array(slide.get_thumbnail((64, 48)).convert("RGB"))
    np.testing.assert_array_equal(thumb, _downsample2(arr))


def test_bif_multi_aoi_unstitched_rejected_loudly(tmp_path):
    arr = _pattern(64, 64, 2)
    path = tmp_path / "slide.bif"
    write_bif(path, arr, n_aois=4, overlap=60.0)
    with pytest.raises(RuntimeError, match="multi-AOI"):
        CTiffSlide(path)


def test_bif_multi_aoi_zero_overlap_reads(tmp_path):
    """Stitched exports report multiple AOIs but zero joint overlap — the
    raw grid is then the true geometry and must read normally."""
    arr = _pattern(64, 64, 3)
    path = tmp_path / "slide.bif"
    write_bif(path, arr, n_aois=4, overlap=0.0)
    slide = CTiffSlide(path)
    region = np.array(slide.read_region((0, 0), 0, (64, 64)))[:, :, :3]
    np.testing.assert_array_equal(region, arr)
