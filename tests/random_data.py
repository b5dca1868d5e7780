"""Synthetic-cohort generators for tests.

Same role and shapes as the reference's tests/random_data.py (feature files
with correct attrs, cohorts for every task, historic-format files for
backward-compat tests), written against numpy instead of torch.
"""

import io
import random
import string
from collections.abc import Mapping, Sequence
from pathlib import Path
from typing import TypeAlias

import h5py
import numpy as np
import pandas as pd

import stamp_tpu
from stamp_tpu.types import FeaturePath, Microns, PatientId, TilePixels

CliniPath: TypeAlias = Path
SlidePath: TypeAlias = Path
FeatureDir: TypeAlias = Path


def random_string(n: int) -> str:
    return "".join(random.choices(string.ascii_uppercase + string.digits, k=n))


def create_random_feature_file(
    *,
    tmp_path: Path,
    min_tiles: int,
    max_tiles: int,
    feat_dim: int,
    tile_size_um: Microns = Microns(256),
    tile_size_px: TilePixels = TilePixels(224),
    extractor_name: str = "random-test-generator",
    feat_filename: str | None = None,
    coords: np.ndarray | None = None,
) -> FeaturePath:
    n_tiles = random.randint(min_tiles, max_tiles)
    if feat_filename is None:
        feat_filename = random_string(16)
    feature_file_path = tmp_path / f"{feat_filename}.h5"
    with h5py.File(feature_file_path, "w") as h5_file:
        rand_feats = np.random.rand(n_tiles, feat_dim) * 1000 * tile_size_um
        norm_feats = (rand_feats - rand_feats.mean()) / rand_feats.std()
        h5_file["feats"] = norm_feats.astype(np.float32)
        if coords is not None:
            h5_file["coords"] = coords
        else:
            h5_file["coords"] = np.random.rand(n_tiles, 2).astype(np.float32)
        h5_file.attrs["stamp_version"] = stamp_tpu.__version__
        h5_file.attrs["extractor"] = str(extractor_name)
        h5_file.attrs["unit"] = "um"
        h5_file.attrs["tile_size_um"] = tile_size_um
        h5_file.attrs["tile_size_px"] = tile_size_px
    return FeaturePath(feature_file_path)


def create_random_patient_level_feature_file(
    *,
    tmp_path: Path,
    feat_dim: int,
    feat_filename: str | None = None,
    encoder: str = "test-encoder",
    precision: str = "float32",
    feat_type: str = "patient",
    code_hash: str = "testhash",
    version: str | None = None,
) -> FeaturePath:
    if feat_filename is None:
        feat_filename = random_string(16)
    feature_file_path = tmp_path / f"{feat_filename}.h5"
    feats = np.random.rand(1, feat_dim).astype(np.float32)
    version = version or stamp_tpu.__version__
    with h5py.File(feature_file_path, "w") as h5:
        h5["feats"] = feats
        h5.attrs["version"] = version
        h5.attrs["encoder"] = encoder
        h5.attrs["precision"] = precision
        h5.attrs["stamp_version"] = version
        h5.attrs["code_hash"] = code_hash
        h5.attrs["feat_type"] = feat_type
    return FeaturePath(feature_file_path)


def create_random_dataset(
    *,
    dir: Path,
    n_patients: int,
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    feat_dim: int,
    categories: Sequence[str] | None = None,
    n_categories: int | None = None,
    extractor_name: str = "random-test-generator",
    min_slides_per_patient: int = 1,
) -> tuple[CliniPath, SlidePath, FeatureDir, Sequence[str]]:
    slide_path_to_patient: dict[Path, PatientId] = {}
    patient_to_ground_truth: dict[PatientId, str] = {}
    clini_path = dir / "clini.csv"
    slide_path = dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(exist_ok=True)

    if categories is not None:
        if n_categories is not None:
            raise ValueError("only one of `categories` and `n_categories` can be set")
    else:
        if n_categories is None:
            raise ValueError("either `categories` or `n_categories` has to be specified")
        categories = [random_string(8) for _ in range(n_categories)]

    for _ in range(n_patients):
        patient_id = random_string(16)
        patient_to_ground_truth[patient_id] = random.choice(list(categories))
        for _ in range(random.randint(min_slides_per_patient, max_slides_per_patient)):
            slide_path_to_patient[
                create_random_feature_file(
                    tmp_path=feat_dir,
                    min_tiles=min_tiles_per_slide,
                    max_tiles=max_tiles_per_slide,
                    feat_dim=feat_dim,
                    extractor_name=extractor_name,
                ).relative_to(feat_dir)
            ] = patient_id

    pd.DataFrame(
        patient_to_ground_truth.items(), columns=["patient", "ground-truth"]
    ).to_csv(clini_path, index=False)
    pd.DataFrame(
        slide_path_to_patient.items(), columns=["slide_path", "patient"]
    ).to_csv(slide_path, index=False)

    return clini_path, slide_path, feat_dir, categories


def create_random_regression_dataset(
    *,
    dir: Path,
    n_patients: int,
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    feat_dim: int,
    extractor_name: str = "random-test-generator",
    min_slides_per_patient: int = 1,
) -> tuple[Path, Path, Path, None]:
    slide_path_to_patient: dict[Path, str] = {}
    patient_to_target: list[tuple[str, float]] = []
    clini_path = dir / "clini.csv"
    slide_path = dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(exist_ok=True)

    for _ in range(n_patients):
        patient_id = random_string(16)
        patient_to_target.append((patient_id, float(np.random.uniform(0.0, 100.0))))
        for _ in range(random.randint(min_slides_per_patient, max_slides_per_patient)):
            slide_path_to_patient[
                create_random_feature_file(
                    tmp_path=feat_dir,
                    min_tiles=min_tiles_per_slide,
                    max_tiles=max_tiles_per_slide,
                    feat_dim=feat_dim,
                    extractor_name=extractor_name,
                ).relative_to(feat_dir)
            ] = patient_id

    clini_df = pd.DataFrame(patient_to_target, columns=["patient", "target"])
    clini_df["target"] = clini_df["target"].astype(float)
    clini_df.to_csv(clini_path, index=False)
    pd.DataFrame(
        slide_path_to_patient.items(), columns=["slide_path", "patient"]
    ).to_csv(slide_path, index=False)
    return clini_path, slide_path, feat_dir, None


def create_random_survival_dataset(
    *,
    dir: Path,
    n_patients: int,
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    feat_dim: int,
    extractor_name: str = "random-test-generator",
    min_slides_per_patient: int = 1,
) -> tuple[Path, Path, Path, None]:
    slide_path_to_patient: dict[Path, str] = {}
    patient_rows: list[tuple[str, float, int]] = []
    clini_path = dir / "clini.csv"
    slide_path = dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(exist_ok=True)

    for _ in range(n_patients):
        patient_id = random_string(16)
        time_days = float(np.random.uniform(30, 2000))
        status = int(np.random.choice([0, 1], p=[0.3, 0.7]))
        patient_rows.append((patient_id, time_days, status))
        for _ in range(random.randint(min_slides_per_patient, max_slides_per_patient)):
            slide_path_to_patient[
                create_random_feature_file(
                    tmp_path=feat_dir,
                    min_tiles=min_tiles_per_slide,
                    max_tiles=max_tiles_per_slide,
                    feat_dim=feat_dim,
                    extractor_name=extractor_name,
                ).relative_to(feat_dir)
            ] = patient_id

    pd.DataFrame(patient_rows, columns=["patient", "day", "status"]).to_csv(
        clini_path, index=False
    )
    pd.DataFrame(
        slide_path_to_patient.items(), columns=["slide_path", "patient"]
    ).to_csv(slide_path, index=False)
    return clini_path, slide_path, feat_dir, None


def create_random_multi_target_dataset(
    *,
    dir: Path,
    n_patients: int,
    max_slides_per_patient: int,
    min_tiles_per_slide: int,
    max_tiles_per_slide: int,
    feat_dim: int,
    target_labels: Sequence[str],
    categories_per_target: Sequence[Sequence[str]],
    extractor_name: str = "random-test-generator",
    min_slides_per_patient: int = 1,
) -> tuple[Path, Path, Path, Sequence[Sequence[str]]]:
    if len(target_labels) != len(categories_per_target):
        raise ValueError("target_labels and categories_per_target must have same length")

    slide_path_to_patient: dict[Path, PatientId] = {}
    patient_to_ground_truths: Mapping[PatientId, dict[str, str]] = {}
    clini_path = dir / "clini.csv"
    slide_path = dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(exist_ok=True)

    for _ in range(n_patients):
        patient_id = random_string(16)
        ground_truths = {
            target_label: random.choice(list(categories))
            for target_label, categories in zip(target_labels, categories_per_target)
        }
        patient_to_ground_truths[patient_id] = ground_truths
        for _ in range(random.randint(min_slides_per_patient, max_slides_per_patient)):
            slide_path_to_patient[
                create_random_feature_file(
                    tmp_path=feat_dir,
                    min_tiles=min_tiles_per_slide,
                    max_tiles=max_tiles_per_slide,
                    feat_dim=feat_dim,
                    extractor_name=extractor_name,
                ).relative_to(feat_dir)
            ] = patient_id

    clini_data = []
    for patient_id, ground_truths in patient_to_ground_truths.items():
        row = {"patient": patient_id}
        row.update(ground_truths)
        clini_data.append(row)
    pd.DataFrame(clini_data).to_csv(clini_path, index=False)
    pd.DataFrame(
        slide_path_to_patient.items(), columns=["slide_path", "patient"]
    ).to_csv(slide_path, index=False)
    return clini_path, slide_path, feat_dir, categories_per_target


def create_random_patient_level_dataset(
    *,
    dir: Path,
    n_patients: int,
    feat_dim: int,
    categories: Sequence[str] | None = None,
    n_categories: int | None = None,
) -> tuple[Path, Path, Path, Sequence[str]]:
    clini_path = dir / "clini.csv"
    slide_path = dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir()

    if categories is not None:
        if n_categories is not None:
            raise ValueError("only one of `categories` and `n_categories` can be set")
    else:
        if n_categories is None:
            raise ValueError("either `categories` or `n_categories` has to be specified")
        categories = [random_string(8) for _ in range(n_categories)]

    patient_to_ground_truth = {}
    for _ in range(n_patients):
        patient_id = random_string(16)
        patient_to_ground_truth[patient_id] = random.choice(list(categories))
        create_random_patient_level_feature_file(
            tmp_path=feat_dir, feat_dim=feat_dim, feat_filename=patient_id
        )

    pd.DataFrame(
        patient_to_ground_truth.items(), columns=["patient", "ground-truth"]
    ).to_csv(clini_path, index=False)
    pd.DataFrame(columns=["slide_path", "patient"]).to_csv(slide_path, index=False)
    return clini_path, slide_path, feat_dir, categories


def create_random_patient_level_survival_dataset(
    *,
    dir: Path,
    n_patients: int,
    feat_dim: int,
    extractor_name: str = "random-test-generator",
) -> tuple[Path, Path, Path, None]:
    clini_path = dir / "clini.csv"
    slide_path = dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(parents=True, exist_ok=True)

    patient_rows: list[tuple[str, float, int]] = []
    for _ in range(n_patients):
        patient_id = random_string(16)
        patient_rows.append(
            (
                patient_id,
                float(np.random.uniform(30, 2000)),
                int(np.random.choice([0, 1], p=[0.3, 0.7])),
            )
        )
        create_random_patient_level_feature_file(
            tmp_path=feat_dir,
            feat_dim=feat_dim,
            feat_filename=patient_id,
            encoder=extractor_name,
            feat_type="patient",
        )

    pd.DataFrame(patient_rows, columns=["patient", "day", "status"]).to_csv(
        clini_path, index=False
    )
    pd.DataFrame(columns=["slide_path", "patient"]).to_csv(slide_path, index=False)
    return clini_path, slide_path, feat_dir, None


def create_random_patient_level_regression_dataset(
    *,
    dir: Path,
    n_patients: int,
    feat_dim: int,
    extractor_name: str = "random-test-generator",
    target_range: tuple[float, float] = (0.0, 100.0),
) -> tuple[Path, Path, Path, None]:
    clini_path = dir / "clini.csv"
    slide_path = dir / "slide.csv"
    feat_dir = dir / "feats"
    feat_dir.mkdir(parents=True, exist_ok=True)

    patient_rows: list[tuple[str, float]] = []
    for _ in range(n_patients):
        patient_id = random_string(16)
        patient_rows.append((patient_id, float(np.random.uniform(*target_range))))
        create_random_patient_level_feature_file(
            tmp_path=feat_dir,
            feat_dim=feat_dim,
            feat_filename=patient_id,
            encoder=extractor_name,
            feat_type="patient",
        )

    clini_df = pd.DataFrame(patient_rows, columns=["patient", "target"])
    clini_df["target"] = clini_df["target"].astype(float)
    clini_df.to_csv(clini_path, index=False, float_format="%.6f")
    pd.DataFrame(columns=["slide_path", "patient"]).to_csv(slide_path, index=False)
    return clini_path, slide_path, feat_dir, None


def random_patient_preds(*, n_patients: int, categories: list[str]) -> pd.DataFrame:
    scores = np.random.rand(len(categories), n_patients)
    scores = np.exp(scores) / np.exp(scores).sum(axis=0, keepdims=True)
    return pd.DataFrame(
        {
            "patient": [random_string(8) for _ in range(n_patients)],
            "ground-truth": [random.choice(categories) for _ in range(n_patients)],
            **{
                f"ground-truth_{cat}": scores[i]
                for i, cat in enumerate(categories)
            },
        }
    )


def make_old_feature_file(
    *,
    feats: np.ndarray,
    coords: np.ndarray,
    tile_size_um: Microns = Microns(2508),
) -> io.BytesIO:
    """Creates a feature file with historic format from the given data."""
    file = io.BytesIO()
    with h5py.File(file, "w") as h5:
        h5["feats"] = feats
        h5["coords"] = coords * tile_size_um
        h5.attrs["stamp_version"] = stamp_tpu.__version__
        h5.attrs["extractor"] = "random-test-generator"
        h5.attrs["unit"] = "um"
        h5.attrs["tile_size"] = tile_size_um
    return file


def make_feature_file(
    *,
    feats: np.ndarray,
    coords: np.ndarray,
    tile_size_um: Microns = Microns(2508),
    tile_size_px: TilePixels = TilePixels(512),
) -> io.BytesIO:
    file = io.BytesIO()
    with h5py.File(file, "w") as h5:
        h5["feats"] = feats
        h5["coords"] = coords * tile_size_um
        h5.attrs["stamp_version"] = stamp_tpu.__version__
        h5.attrs["extractor"] = "random-test-generator"
        h5.attrs["unit"] = "um"
        h5.attrs["tile_size_um"] = tile_size_um
        h5.attrs["tile_size_px"] = tile_size_px
        h5.attrs["feat_type"] = "tile"
    return file


def create_good_and_bad_slide_tables(*, tmp_path: Path) -> tuple[Path, Path, Path]:
    good_slide_df = pd.DataFrame(
        {
            "PATIENT": ["pat1", "pat2", "pat3"],
            "FILENAME": ["slide1.h5", "slide2.h5", "slide3.h5"],
        }
    )
    good_slide_path = tmp_path / "good_slide.csv"
    good_slide_df.to_csv(good_slide_path, index=False)

    all_bad_slide_df = pd.DataFrame(
        {
            "PATIENT": ["pat_bad1", "pat_bad2", "pat_bad3"],
            "FILENAME": ["slide1.jpg", "slide2.png", "slide3.tiff"],
        }
    )
    all_bad_slide_path = tmp_path / "bad_slide.csv"
    all_bad_slide_df.to_csv(all_bad_slide_path, index=False)

    one_bad_slide_path = tmp_path / "one_bad_slide.csv"
    pd.DataFrame(
        {
            "PATIENT": ["pat1", "pat2", "badpat3", "pat4", "pat5"],
            "FILENAME": [
                "slide1.h5",
                "slide2.h5",
                "slide3.jpg",
                "slide4.h5",
                "slide5.h5",
            ],
        }
    ).to_csv(one_bad_slide_path, index=False)

    return good_slide_path, all_bad_slide_path, one_bad_slide_path
