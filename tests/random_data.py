"""Synthetic-cohort generators for tests.

Same role and h5-attrs contract as the reference's tests/random_data.py
(feature files with correct attrs, cohorts for every task, historic-format
files for backward-compat tests), built numpy-native around one shared
cohort engine: every flavor is a ground-truth sampler plugged into
``_write_slide_cohort`` / ``_write_patient_cohort``.
"""

import io
import random
import string
from collections.abc import Sequence
from pathlib import Path
from typing import Callable, TypeAlias

import h5py
import numpy as np
import pandas as pd

import stamp_tpu
from stamp_tpu.types import FeaturePath, Microns, TilePixels

CliniPath: TypeAlias = Path
SlidePath: TypeAlias = Path
FeatureDir: TypeAlias = Path


def random_string(n: int) -> str:
    return "".join(random.choices(string.ascii_uppercase + string.digits, k=n))


def _tile_attrs(
    extractor_name: str, tile_size_um: Microns, tile_size_px: TilePixels
) -> dict:
    """The tile-feature h5 attribute contract (io/h5.py get_coords)."""
    return {
        "stamp_version": stamp_tpu.__version__,
        "extractor": str(extractor_name),
        "unit": "um",
        "tile_size_um": tile_size_um,
        "tile_size_px": tile_size_px,
    }


def create_random_feature_file(
    *,
    tmp_path: Path,
    feat_dim: int,
    min_tiles: int,
    max_tiles: int,
    tile_size_px: TilePixels = TilePixels(224),
    tile_size_um: Microns = Microns(256),
    extractor_name: str = "random-test-generator",
    feat_filename: str | None = None,
    coords: np.ndarray | None = None,
) -> FeaturePath:
    n_tiles = random.randint(min_tiles, max_tiles)
    path = tmp_path / f"{feat_filename or random_string(16)}.h5"
    feats = np.random.rand(n_tiles, feat_dim) * 1000 * tile_size_um
    feats = (feats - feats.mean()) / feats.std()
    if coords is None:
        coords = np.random.rand(n_tiles, 2).astype(np.float32)
    with h5py.File(path, "w") as h5:
        h5["feats"] = feats.astype(np.float32)
        h5["coords"] = coords
        h5.attrs.update(_tile_attrs(extractor_name, tile_size_um, tile_size_px))
    return FeaturePath(path)


def create_random_patient_level_feature_file(
    *,
    tmp_path: Path,
    feat_dim: int,
    encoder: str = "test-encoder",
    feat_filename: str | None = None,
    feat_type: str = "patient",
    precision: str = "float32",
    code_hash: str = "testhash",
    version: str | None = None,
) -> FeaturePath:
    path = tmp_path / f"{feat_filename or random_string(16)}.h5"
    version = version or stamp_tpu.__version__
    with h5py.File(path, "w") as h5:
        h5["feats"] = np.random.rand(1, feat_dim).astype(np.float32)
        h5.attrs.update({
            "version": version,
            "encoder": encoder,
            "precision": precision,
            "stamp_version": version,
            "code_hash": code_hash,
            "feat_type": feat_type,
        })
    return FeaturePath(path)


# ---------------------------------------------------------------------------
# Cohort engines: one loop, many ground-truth flavors
# ---------------------------------------------------------------------------


def _write_slide_cohort(
    dir: Path,
    *,
    n_patients: int,
    min_slides_per_patient: int,
    max_slides_per_patient: int,
    sample_ground_truth: Callable[[], tuple],
    clini_columns: Sequence[str],
    feature_file_kwargs: dict,
    float_format: str | None = None,
) -> tuple[CliniPath, SlidePath, FeatureDir]:
    """Write a clini.csv + slide.csv + per-slide tile-feature cohort; each
    patient gets one sampled ground-truth row and 1..k slides."""
    clini_path, slide_path = dir / "clini.csv", dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(exist_ok=True)

    clini_rows, slide_rows = [], []
    for _ in range(n_patients):
        patient_id = random_string(16)
        clini_rows.append((patient_id, *sample_ground_truth()))
        n_slides = random.randint(min_slides_per_patient, max_slides_per_patient)
        for _ in range(n_slides):
            h5_path = create_random_feature_file(
                tmp_path=feat_dir, **feature_file_kwargs
            )
            slide_rows.append((h5_path.relative_to(feat_dir), patient_id))

    pd.DataFrame(clini_rows, columns=["patient", *clini_columns]).to_csv(
        clini_path, index=False, float_format=float_format
    )
    pd.DataFrame(slide_rows, columns=["slide_path", "patient"]).to_csv(
        slide_path, index=False
    )
    return clini_path, slide_path, feat_dir


def _write_patient_cohort(
    dir: Path,
    *,
    n_patients: int,
    feat_dim: int,
    sample_ground_truth: Callable[[], tuple],
    clini_columns: Sequence[str],
    encoder: str = "test-encoder",
    float_format: str | None = None,
) -> tuple[CliniPath, SlidePath, FeatureDir]:
    """Patient-level cohort: one pooled feature file named after each
    patient, plus an empty slide table (patient features need none)."""
    clini_path, slide_path = dir / "clini.csv", dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(parents=True, exist_ok=True)

    clini_rows = []
    for _ in range(n_patients):
        patient_id = random_string(16)
        clini_rows.append((patient_id, *sample_ground_truth()))
        create_random_patient_level_feature_file(
            tmp_path=feat_dir,
            feat_dim=feat_dim,
            feat_filename=patient_id,
            encoder=encoder,
        )

    pd.DataFrame(clini_rows, columns=["patient", *clini_columns]).to_csv(
        clini_path, index=False, float_format=float_format
    )
    pd.DataFrame(columns=["slide_path", "patient"]).to_csv(slide_path, index=False)
    return clini_path, slide_path, feat_dir


def _resolve_categories(
    categories: Sequence[str] | None, n_categories: int | None
) -> Sequence[str]:
    if categories is not None and n_categories is not None:
        raise ValueError("only one of `categories` and `n_categories` can be set")
    if categories is None:
        if n_categories is None:
            raise ValueError(
                "either `categories` or `n_categories` has to be specified"
            )
        categories = [random_string(8) for _ in range(n_categories)]
    return categories


def _survival_row() -> tuple[float, int]:
    time_days = float(np.random.uniform(30, 2000))
    status = int(np.random.choice([0, 1], p=[0.3, 0.7]))
    return time_days, status


# ---------------------------------------------------------------------------
# Public cohort flavors
# ---------------------------------------------------------------------------


def create_random_dataset(
    *,
    dir: Path,
    feat_dim: int,
    n_patients: int,
    min_slides_per_patient: int = 1,
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    n_categories: int | None = None,
    categories: Sequence[str] | None = None,
    extractor_name: str = "random-test-generator",
) -> tuple[CliniPath, SlidePath, FeatureDir, Sequence[str]]:
    categories = _resolve_categories(categories, n_categories)
    paths = _write_slide_cohort(
        dir,
        n_patients=n_patients,
        min_slides_per_patient=min_slides_per_patient,
        max_slides_per_patient=max_slides_per_patient,
        sample_ground_truth=lambda: (random.choice(list(categories)),),
        clini_columns=["ground-truth"],
        feature_file_kwargs=dict(
            min_tiles=min_tiles_per_slide,
            max_tiles=max_tiles_per_slide,
            feat_dim=feat_dim,
            extractor_name=extractor_name,
        ),
    )
    return (*paths, categories)


def create_random_regression_dataset(
    *,
    dir: Path,
    n_patients: int,
    feat_dim: int,
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    extractor_name: str = "random-test-generator",
    min_slides_per_patient: int = 1,
) -> tuple[Path, Path, Path, None]:
    paths = _write_slide_cohort(
        dir,
        n_patients=n_patients,
        min_slides_per_patient=min_slides_per_patient,
        max_slides_per_patient=max_slides_per_patient,
        sample_ground_truth=lambda: (float(np.random.uniform(0.0, 100.0)),),
        clini_columns=["target"],
        feature_file_kwargs=dict(
            min_tiles=min_tiles_per_slide,
            max_tiles=max_tiles_per_slide,
            feat_dim=feat_dim,
            extractor_name=extractor_name,
        ),
    )
    return (*paths, None)


def create_random_survival_dataset(
    *,
    dir: Path,
    n_patients: int,
    feat_dim: int,
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    extractor_name: str = "random-test-generator",
    min_slides_per_patient: int = 1,
) -> tuple[Path, Path, Path, None]:
    paths = _write_slide_cohort(
        dir,
        n_patients=n_patients,
        min_slides_per_patient=min_slides_per_patient,
        max_slides_per_patient=max_slides_per_patient,
        sample_ground_truth=_survival_row,
        clini_columns=["day", "status"],
        feature_file_kwargs=dict(
            min_tiles=min_tiles_per_slide,
            max_tiles=max_tiles_per_slide,
            feat_dim=feat_dim,
            extractor_name=extractor_name,
        ),
    )
    return (*paths, None)


def create_random_multi_target_dataset(
    *,
    dir: Path,
    n_patients: int,
    feat_dim: int,
    target_labels: Sequence[str],
    categories_per_target: Sequence[Sequence[str]],
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    extractor_name: str = "random-test-generator",
    min_slides_per_patient: int = 1,
) -> tuple[Path, Path, Path, Sequence[Sequence[str]]]:
    if len(target_labels) != len(categories_per_target):
        raise ValueError(
            "target_labels and categories_per_target must have same length"
        )
    paths = _write_slide_cohort(
        dir,
        n_patients=n_patients,
        min_slides_per_patient=min_slides_per_patient,
        max_slides_per_patient=max_slides_per_patient,
        sample_ground_truth=lambda: tuple(
            random.choice(list(cats)) for cats in categories_per_target
        ),
        clini_columns=list(target_labels),
        feature_file_kwargs=dict(
            min_tiles=min_tiles_per_slide,
            max_tiles=max_tiles_per_slide,
            feat_dim=feat_dim,
            extractor_name=extractor_name,
        ),
    )
    return (*paths, categories_per_target)


def create_random_patient_level_dataset(
    *,
    dir: Path,
    feat_dim: int,
    n_patients: int,
    n_categories: int | None = None,
    categories: Sequence[str] | None = None,
) -> tuple[Path, Path, Path, Sequence[str]]:
    categories = _resolve_categories(categories, n_categories)
    paths = _write_patient_cohort(
        dir,
        n_patients=n_patients,
        feat_dim=feat_dim,
        sample_ground_truth=lambda: (random.choice(list(categories)),),
        clini_columns=["ground-truth"],
    )
    return (*paths, categories)


def create_random_patient_level_survival_dataset(
    *,
    dir: Path,
    n_patients: int,
    feat_dim: int,
    extractor_name: str = "random-test-generator",
) -> tuple[Path, Path, Path, None]:
    paths = _write_patient_cohort(
        dir,
        n_patients=n_patients,
        feat_dim=feat_dim,
        sample_ground_truth=_survival_row,
        clini_columns=["day", "status"],
        encoder=extractor_name,
    )
    return (*paths, None)


def create_random_patient_level_regression_dataset(
    *,
    dir: Path,
    feat_dim: int,
    n_patients: int,
    target_range: tuple[float, float] = (0.0, 100.0),
    extractor_name: str = "random-test-generator",
) -> tuple[Path, Path, Path, None]:
    paths = _write_patient_cohort(
        dir,
        n_patients=n_patients,
        feat_dim=feat_dim,
        sample_ground_truth=lambda: (float(np.random.uniform(*target_range)),),
        clini_columns=["target"],
        encoder=extractor_name,
        float_format="%.6f",
    )
    return (*paths, None)


# ---------------------------------------------------------------------------
# Misc fixtures
# ---------------------------------------------------------------------------


def random_patient_preds(*, n_patients: int, categories: list[str]) -> pd.DataFrame:
    scores = np.random.rand(len(categories), n_patients)
    scores = np.exp(scores) / np.exp(scores).sum(axis=0, keepdims=True)
    return pd.DataFrame({
        "patient": [random_string(8) for _ in range(n_patients)],
        "ground-truth": [random.choice(categories) for _ in range(n_patients)],
        **{f"ground-truth_{cat}": scores[i] for i, cat in enumerate(categories)},
    })


def _feature_bytes(feats: np.ndarray, coords: np.ndarray, attrs: dict) -> io.BytesIO:
    file = io.BytesIO()
    with h5py.File(file, "w") as h5:
        h5["feats"] = feats
        h5["coords"] = coords
        h5.attrs.update(attrs)
    return file


def make_old_feature_file(
    *,
    feats: np.ndarray,
    coords: np.ndarray,
    tile_size_um: Microns = Microns(2508),
) -> io.BytesIO:
    """Historic format: ``tile_size`` attr (no _um suffix, no px)."""
    return _feature_bytes(
        feats,
        coords * tile_size_um,
        {
            "stamp_version": stamp_tpu.__version__,
            "extractor": "random-test-generator",
            "unit": "um",
            "tile_size": tile_size_um,
        },
    )


def make_feature_file(
    *,
    feats: np.ndarray,
    coords: np.ndarray,
    tile_size_um: Microns = Microns(2508),
    tile_size_px: TilePixels = TilePixels(512),
) -> io.BytesIO:
    attrs = _tile_attrs("random-test-generator", tile_size_um, tile_size_px)
    attrs["feat_type"] = "tile"
    return _feature_bytes(feats, coords * tile_size_um, attrs)


def create_good_and_bad_slide_tables(*, tmp_path: Path) -> tuple[Path, Path, Path]:
    """Three slide tables: all-.h5, all-wrong-extension, and mixed."""
    tables = {
        "good_slide.csv": [
            ("pat1", "slide1.h5"),
            ("pat2", "slide2.h5"),
            ("pat3", "slide3.h5"),
        ],
        "bad_slide.csv": [
            ("pat_bad1", "slide1.jpg"),
            ("pat_bad2", "slide2.png"),
            ("pat_bad3", "slide3.tiff"),
        ],
        "one_bad_slide.csv": [
            ("pat1", "slide1.h5"),
            ("pat2", "slide2.h5"),
            ("badpat3", "slide3.jpg"),
            ("pat4", "slide4.h5"),
            ("pat5", "slide5.h5"),
        ],
    }
    paths = []
    for name, rows in tables.items():
        path = tmp_path / name
        pd.DataFrame(rows, columns=["PATIENT", "FILENAME"]).to_csv(
            path, index=False
        )
        paths.append(path)
    return tuple(paths)
