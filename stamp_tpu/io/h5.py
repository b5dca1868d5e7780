"""The on-disk ``.h5`` feature-file contract.

This is the single most important interoperability surface of the framework:
every pipeline stage communicates through these files.  Format parity with the
reference is exact, including the three historic coordinate layouts handled by
``get_coords`` (reference src/stamp/modeling/data.py:741-808) and the attribute
sets written by extraction (src/stamp/preprocessing/__init__.py:353-359) and
encoding (src/stamp/encoding/encoder/__init__.py:213-222).
"""

import logging
from dataclasses import dataclass
from pathlib import Path
from tempfile import NamedTemporaryFile

import h5py
import numpy as np
from packaging.version import Version

import stamp_tpu
from stamp_tpu.types import Microns, SlideMPP, TilePixels

_logger = logging.getLogger("stamp")


@dataclass
class CoordsInfo:
    coords_um: np.ndarray
    tile_size_um: Microns
    tile_size_px: TilePixels | None = None

    @property
    def mpp(self) -> SlideMPP:
        if not self.tile_size_px:
            raise RuntimeError(
                "tile size in pixels is not available. "
                "Please reextract them using `stamp preprocess`."
            )
        return SlideMPP(self.tile_size_um / self.tile_size_px)


def get_stride(coords: np.ndarray) -> float:
    """Minimum step width between any two coordinates (reference data.py:1150-1161)."""
    xs = np.unique(coords[:, 0])
    ys = np.unique(coords[:, 1])
    return float(
        min(
            np.diff(xs).min() if len(xs) > 1 else np.inf,
            np.diff(ys).min() if len(ys) > 1 else np.inf,
        )
    )


def get_coords(feature_h5: h5py.File) -> CoordsInfo:
    """Extract tile coordinates in µm, handling all historic layouts.

    Layouts (reference data.py:741-808):
      - no ``coords`` dataset at all (multiplex bypass): fake (i, 0) coords
      - STAMP v2:     attrs ``tile_size`` + ``unit == "um"``
      - current:      attrs ``tile_size_um`` (+ optional ``tile_size_px``)
      - historic:     stride ≈ 224 → coords are 224px-units of 256µm tiles
    """
    if "coords" not in feature_h5:
        feats_obj = feature_h5["patch_embeddings"]
        if not isinstance(feats_obj, h5py.Dataset):
            raise RuntimeError(
                f"{feature_h5.filename}: expected 'patch_embeddings' to be an HDF5 "
                f"dataset but got {type(feats_obj)}"
            )
        n = feats_obj.shape[0]
        coords_um = np.stack([np.arange(n), np.zeros(n)], axis=1).astype(np.float32)
        return CoordsInfo(coords_um, Microns(0.0), TilePixels(0))

    coords_obj = feature_h5["coords"]
    if not isinstance(coords_obj, h5py.Dataset):
        raise RuntimeError(
            f"{feature_h5.filename}: expected 'coords' to be an HDF5 dataset "
            f"but got {type(coords_obj)}"
        )
    coords: np.ndarray = coords_obj[:]
    tile_size_um: Microns | None = None
    tile_size_px: TilePixels | None = None
    coords_um: np.ndarray | None = None

    if (tile_size := feature_h5.attrs.get("tile_size", None)) and feature_h5.attrs.get(
        "unit", None
    ) == "um":
        # STAMP v2 format
        tile_size_um = Microns(float(tile_size))
        coords_um = coords
    elif tile_size := feature_h5.attrs.get("tile_size_um", None):
        # Newer STAMP format
        tile_size_um = Microns(float(tile_size))
        coords_um = coords
    elif (
        round(
            float(
                feature_h5.attrs.get(
                    "tile_size", get_stride(coords.astype(np.float32))
                )
            )
        )
        == 224
    ):
        # Historic STAMP format: coordinates have unit 256um/224px
        _logger.debug(
            f"{feature_h5.filename}: tile stride is roughly 224, assuming "
            "coordinates have unit 256um/224px (historic STAMP format)"
        )
        tile_size_um = Microns(256.0)
        tile_size_px = TilePixels(224)
        coords_um = coords / 224 * 256

    if (version_str := feature_h5.attrs.get("stamp_version")) and (
        extraction_version := Version(str(version_str))
    ) > Version(stamp_tpu.__version__):
        raise RuntimeError(
            "features were extracted with a newer version of stamp, please "
            f"update your stamp to at least version {extraction_version}."
        )

    if not tile_size_px and "tile_size_px" in feature_h5.attrs:
        tile_size_px = TilePixels(int(feature_h5.attrs["tile_size_px"]))

    if not tile_size_um or coords_um is None:
        raise RuntimeError(
            "unable to infer coordinates from feature file. "
            "Please reextract them using `stamp preprocess`."
        )

    # historic files may store integer pixel coordinates; the model contract
    # (and the runtime shape checks) is float µm
    coords_um = np.asarray(coords_um, dtype=np.float32)

    return CoordsInfo(coords_um, tile_size_um, tile_size_px)


def detect_feature_type(feature_dir: Path) -> str:
    """Detects feature type ('tile' / 'slide' / 'patient') from h5 attrs.

    Reference data.py:424-457.
    """
    feature_types: set[str] = set()
    files_checked = 0

    for file in feature_dir.rglob("*.h5"):
        files_checked += 1
        with h5py.File(file, "r") as h5:
            feat_type = h5.attrs.get("feat_type")
            encoder = h5.attrs.get("encoder")
            if feat_type is not None or encoder is not None:
                feature_types.add(str(feat_type))
            else:
                feature_types.add("tile")

    if files_checked == 0:
        raise RuntimeError("No .h5 feature files found in feature_dir.")

    if len(feature_types) > 1:
        raise RuntimeError(
            f"Multiple feature types detected in {feature_dir}: {feature_types}. "
            "All feature files must have the same type."
        )

    return feature_types.pop()


def read_feats(h5_path: Path | str) -> tuple[np.ndarray, CoordsInfo]:
    """Read a tile feature file → (feats [N,F] float32, coords info)."""
    with h5py.File(h5_path, "r") as h5:
        if "feats" in h5:
            feats = np.asarray(h5["feats"])
        else:
            feats = np.asarray(h5["patch_embeddings"])
        coords = get_coords(h5)
    return feats.astype(np.float32, copy=False), coords


def write_tile_feats_atomic(
    *,
    output_path: Path,
    feats: np.ndarray,
    coords_um: np.ndarray,
    extractor_id: str,
    tile_size_um: Microns,
    tile_size_px: TilePixels,
    code_hash: str,
    precision: str | None = None,
) -> None:
    """Atomically write a tile-level feature file with the reference attrs
    (reference preprocessing/__init__.py:344-366).  ``precision`` is stamped
    only for non-default numeric modes (int8 provenance)."""
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with NamedTemporaryFile(dir=output_path.parent, delete=False) as tmp:
        try:
            with h5py.File(tmp.name, "w") as h5_fp:
                h5_fp["coords"] = coords_um
                h5_fp["feats"] = feats
                h5_fp.attrs["stamp_version"] = stamp_tpu.__version__
                h5_fp.attrs["extractor"] = str(extractor_id)
                h5_fp.attrs["unit"] = "um"
                h5_fp.attrs["tile_size_um"] = tile_size_um
                h5_fp.attrs["tile_size_px"] = tile_size_px
                h5_fp.attrs["code_hash"] = code_hash
                h5_fp.attrs["feat_type"] = "tile"
                if precision is not None:
                    h5_fp.attrs["precision"] = precision
        except Exception:
            Path(tmp.name).unlink(missing_ok=True)
            raise
        Path(tmp.name).rename(output_path)


def write_pooled_feats_atomic(
    *,
    output_path: Path,
    feats: np.ndarray,
    encoder_id: str,
    precision: str,
    feat_type: str,
    code_hash: str,
    source_precision: str | None = None,
) -> None:
    """Atomically write a slide/patient-level feature file
    (reference encoding/encoder/__init__.py:203-229).  ``source_precision``
    carries the numeric mode of the *tile extraction* stage when it was
    non-default (int8 provenance survives pooling)."""
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with NamedTemporaryFile(dir=output_path.parent, delete=False) as tmp:
        try:
            with h5py.File(tmp.name, "w") as f:
                f["feats"] = feats
                f.attrs["version"] = stamp_tpu.__version__
                f.attrs["encoder"] = str(encoder_id)
                f.attrs["precision"] = str(precision)
                f.attrs["stamp_version"] = stamp_tpu.__version__
                f.attrs["code_hash"] = code_hash
                f.attrs["feat_type"] = feat_type
                if source_precision is not None:
                    f.attrs["source_precision"] = source_precision
        except Exception:
            Path(tmp.name).unlink(missing_ok=True)
            raise
        Path(tmp.name).rename(output_path)
