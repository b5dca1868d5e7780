"""Akoya QPTIFF vendor semantics (native/qptiff.cpp).

The reference reads .qptiff through OpenSlide's generic path
(/root/reference/src/stamp/preprocessing/__init__.py:43-56).  These tests
pin what generic-TIFF reading gets wrong: the same-aspect Thumbnail
directory must be excluded by its ImageType marker (aspect filtering
cannot catch it), and multiplexed immunofluorescence exports — one
grayscale directory per band — must be refused loudly instead of reading
an arbitrary band as the slide.
"""

import numpy as np
import pytest

from qptiff_util import write_qptiff_brightfield, write_qptiff_multiplexed
from scn_util import _downsample2
from stamp_tpu.preprocessing.wsi import CTiffSlide


def _pattern(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_qptiff_brightfield_reads_with_mpp(tmp_path):
    arr = _pattern(96, 128, 0)
    path = tmp_path / "slide.qptiff"
    write_qptiff_brightfield(path, arr, mpp=0.5)
    slide = CTiffSlide(path)
    assert slide.dimensions == (128, 96)
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(
        0.5, rel=1e-3
    )
    region = np.array(slide.read_region((0, 0), 0, (128, 96)))[:, :, :3]
    np.testing.assert_array_equal(region, arr)


def test_qptiff_thumbnail_and_auxiliaries_excluded(tmp_path):
    arr = _pattern(96, 128, 1)
    path = tmp_path / "slide.qptiff"
    write_qptiff_brightfield(path, arr)
    slide = CTiffSlide(path)
    # pyramid = FullResolution + ReducedResolution only; the Thumbnail has
    # the same aspect ratio and would survive any aspect filter
    assert slide.level_count == 2
    assert slide.level_dimensions == ((128, 96), (64, 48))
    thumb = np.array(slide.get_thumbnail((64, 48)).convert("RGB"))
    np.testing.assert_array_equal(thumb, _downsample2(arr))


def test_qptiff_multiplexed_if_rejected_loudly(tmp_path):
    path = tmp_path / "slide.qptiff"
    write_qptiff_multiplexed(path)
    with pytest.raises(RuntimeError, match="multiplexed"):
        CTiffSlide(path)
