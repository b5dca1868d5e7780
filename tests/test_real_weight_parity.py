"""Real-weight extraction parity vs the reference's pinned h5.

This is the reference's only executable numerical baseline
(reference tests/test_feature_extractors.py:84-169): extract the pinned TCGA
slide with CTransPath and compare coords exactly / features at atol 1e-3
against the v2.0.0.dev14 reference h5.

The harness environment has zero egress, so this test looks for the three
artifacts in the local cache and **skips cleanly** when any is missing.  In
a connected environment, run this first:

    mkdir -p ~/.cache/stamp && cd ~/.cache/stamp
    curl -LO https://github.com/KatherLab/STAMP/releases/download/2.0.0.dev14/TCGA-G4-6625-01Z-00-DX1.0fa26667-2581-4f96-a891-d78dbc3299b4.svs
    curl -LO https://github.com/KatherLab/STAMP/releases/download/2.0.0.dev14/TCGA-G4-6625-01Z-00-DX1.0fa26667-2581-4f96-a891-d78dbc3299b4-ctranspath.h5
    # + the CTransPath weights (ctranspath.pth, gdown id per the reference)
    python -m pytest tests/test_real_weight_parity.py -v

Checksums are pinned to the reference's published values, so a stale or
truncated download fails loudly instead of producing a bogus comparison.
"""

import hashlib
import os
from pathlib import Path

import h5py
import numpy as np
import pytest

from stamp_tpu.types import Microns, TilePixels

_SLIDE_NAME = "TCGA-G4-6625-01Z-00-DX1.0fa26667-2581-4f96-a891-d78dbc3299b4.svs"
_SLIDE_SHA = "9b7d2b0294524351bf29229c656cc886af028cb9e7463882289fac43c1347525"
_REF_H5_NAME = (
    "TCGA-G4-6625-01Z-00-DX1.0fa26667-2581-4f96-a891-d78dbc3299b4-ctranspath.h5"
)
_REF_H5_SHA = "f3f33b069c3ed860d2bdb7d65ca5db64936d7acee3ba1061a457a8cdb1bc67e3"


def _cache_dirs() -> list[Path]:
    dirs = []
    if env := os.environ.get("STAMP_WEIGHTS_DIR"):
        dirs.append(Path(env))
    xdg = os.environ.get("XDG_CACHE_HOME") or (Path.home() / ".cache")
    dirs.append(Path(xdg) / "stamp")
    return dirs


def _find_cached(name: str, sha256: str | None) -> Path | None:
    for d in _cache_dirs():
        p = d / name
        if p.exists():
            if sha256 is not None:
                digest = hashlib.sha256(p.read_bytes()).hexdigest()
                assert digest == sha256, (
                    f"{p} is corrupt: sha256 {digest} != pinned {sha256}"
                )
            return p
    return None


def _find_ctranspath_weights() -> Path | None:
    for d in _cache_dirs():
        if not d.is_dir():
            continue
        for pattern in ("*ctranspath*.pth", "*ctranspath*.bin"):
            hits = [p for p in d.glob(pattern) if "chief" not in p.name.lower()]
            if hits:
                return hits[0]
    return None


def test_ctranspath_real_weight_h5_parity(tmp_path: Path) -> None:
    slide = _find_cached(_SLIDE_NAME, _SLIDE_SHA)
    ref_h5 = _find_cached(_REF_H5_NAME, _REF_H5_SHA)
    weights = _find_ctranspath_weights()
    missing = [
        name
        for name, found in [
            ("TCGA slide", slide),
            ("reference h5", ref_h5),
            ("ctranspath weights", weights),
        ]
        if found is None
    ]
    if missing:
        pytest.skip(
            f"real-weight parity artifacts not cached: {missing} "
            "(zero-egress environment — see module docstring for setup)"
        )

    from stamp_tpu.preprocessing.extract import extract_

    wsi_dir = tmp_path / "wsis"
    wsi_dir.mkdir()
    (wsi_dir / "slide.svs").symlink_to(slide)

    # identical tiling parameters to the reference test
    extract_(
        wsi_dir=wsi_dir,
        wsi_list=None,
        output_dir=tmp_path / "output",
        extractor="ctranspath",
        tile_size_px=TilePixels(224),
        tile_size_um=Microns(256.0),
        max_workers=min(os.cpu_count() or 1, 16),
        brightness_cutoff=224,
        canny_cutoff=0.02,
        cache_dir=None,
        cache_tiles_ext="png",
        default_slide_mpp=None,
    )

    def _sorted_by_coords(path: Path):
        with h5py.File(path) as f:
            coords = np.asarray(f["coords"][:])
            feats = np.asarray(f["feats"][:])
        order = np.lexsort((coords[:, 1], coords[:, 0]))
        return coords[order], feats[order]

    ref_coords, ref_feats = _sorted_by_coords(ref_h5)
    got_coords, got_feats = _sorted_by_coords(
        next((tmp_path / "output").glob("*/*.h5"))
    )

    np.testing.assert_allclose(got_coords, ref_coords)
    np.testing.assert_allclose(
        got_feats.astype(np.float32), ref_feats.astype(np.float32), atol=1e-3
    )
