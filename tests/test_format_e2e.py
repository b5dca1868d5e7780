"""End-to-end `extract_` over the round-3 native-reader formats.

The per-format reader tests (test_czi.py, test_hamamatsu.py, test_ndpi.py)
prove exact decode; this drives the same fixtures through the full
extraction pipeline — suffix routing, MPP extraction from vendor metadata,
supertile region reads, tiling, and h5 output — in one mixed-format cohort,
the way `stamp preprocess` sees a real slide folder (reference behavior:
src/stamp/preprocessing/__init__.py:263-336, one glob over all supported
extensions, fail-safe per slide).
"""

import h5py
import numpy as np
import pytest

from stamp_tpu.preprocessing.extract import extract_
from stamp_tpu.types import Microns, TilePixels

from bif_util import write_bif
from czi_util import write_czi
from hamamatsu_util import write_vms
from ndpi_util import write_big_ndpi
from qptiff_util import write_qptiff_brightfield
from scn_util import write_scn

# Small enough that every fixture fits at least two tiles:
#   CZI    192×128 px @ 0.25 µm/px →  48×32 µm
#   VMS    256×128 px @ 0.46 µm/px → ~118×59 µm
#   NDPI   128×96  px @ 1.0  µm/px → 128×96 µm
_TILE_UM = Microns(24.0)
_TILE_PX = TilePixels(16)


@pytest.fixture(scope="module")
def mixed_cohort(tmp_path_factory):
    """One directory holding a CZI mosaic, a VMS specimen, and a big-offset
    NDPI, each in its own subfolder (recursive glob must find all three)."""
    root = tmp_path_factory.mktemp("mixed_wsi")
    sizes_um = {}

    czi_dir = root / "zeiss"
    czi_dir.mkdir()
    expected, mpp = write_czi(czi_dir / "mosaic.czi", with_jpegxr=True)
    h, w = expected.shape[:2]
    sizes_um["mosaic"] = (w * mpp, h * mpp)

    vms_dir = root / "hamamatsu"
    vms_dir.mkdir()
    _, mosaic = write_vms(vms_dir, mpp=0.46)
    h, w = mosaic.shape[:2]
    sizes_um["slide"] = (w * 0.46, h * 0.46)

    ndpi_dir = root / "ndpi"
    ndpi_dir.mkdir()
    rgb0 = write_big_ndpi(ndpi_dir / "big.ndpi")  # reports mpp 1.0
    h, w = rgb0.shape[:2]
    sizes_um["big"] = (float(w), float(h))

    scn_dir = root / "leica"
    scn_dir.mkdir()
    rng = np.random.default_rng(11)
    # 96×80 px @ 1000 nm/px = 96×80 µm; macro excluded by the scn backend
    scn_arr = rng.integers(0, 255, (80, 96, 3), np.uint8)
    write_scn(
        scn_dir / "collection.scn",
        [{"arr": scn_arr, "offset_nm": (2_000_000, 3_000_000), "nm_per_px": 1000.0}],
    )
    sizes_um["collection"] = (96.0, 80.0)

    bif_dir = root / "ventana"
    bif_dir.mkdir()
    # 72×104 px @ 1.0 µm/px (ScanRes attr); thumbnail/label dirs excluded
    bif_arr = rng.integers(0, 255, (72, 104, 3), np.uint8)
    write_bif(bif_dir / "ventana.bif", bif_arr, mpp=1.0)
    sizes_um["ventana"] = (104.0, 72.0)

    qp_dir = root / "akoya"
    qp_dir.mkdir()
    # 88×112 px @ 1.0 µm/px (resolution tags); ImageType pyramid selection
    qp_arr = rng.integers(0, 255, (88, 112, 3), np.uint8)
    write_qptiff_brightfield(qp_dir / "vectra.qptiff", qp_arr, mpp=1.0)
    sizes_um["vectra"] = (112.0, 88.0)

    return root, sizes_um


@pytest.mark.slow
def test_mixed_format_cohort_extracts(mixed_cohort, tmp_path):
    root, sizes_um = mixed_cohort
    out = tmp_path / "out"
    extract_(
        wsi_dir=root,
        output_dir=out,
        wsi_list=None,
        cache_dir=None,
        cache_tiles_ext="png",
        extractor="empty",
        tile_size_px=_TILE_PX,
        tile_size_um=_TILE_UM,
        max_workers=2,
        default_slide_mpp=None,  # every format must supply its own MPP
        brightness_cutoff=None,  # filtering is covered elsewhere; keep all
        canny_cutoff=None,  # tiles so the grids below are exact
        generate_hash=True,
    )

    h5s = {p.stem: p for p in out.rglob("*.h5")}
    assert set(h5s) == set(sizes_um), "one feature file per slide"

    for stem, path in h5s.items():
        w_um, h_um = sizes_um[stem]
        with h5py.File(path) as f:
            assert f.attrs["extractor"] == "empty"
            assert f.attrs["tile_size_um"] == float(_TILE_UM)
            assert f.attrs["tile_size_px"] == int(_TILE_PX)
            coords = np.asarray(f["coords"])
        # unfiltered ⇒ the full grid of tiles whose origin is on the slide
        # (partial edge tiles included, pure-padding tiles clipped)
        nx = int(np.ceil(w_um / float(_TILE_UM)))
        ny = int(np.ceil(h_um / float(_TILE_UM)))
        assert len(coords) == nx * ny, f"{stem}: expected the full {nx}×{ny} grid"
        assert coords.min() >= 0
        assert coords[:, 0].max() < w_um
        assert coords[:, 1].max() < h_um
