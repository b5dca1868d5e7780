"""Data layer: clinical/slide tables, patient assembly, bags, batching.

Behavioral parity with reference src/stamp/modeling/data.py, redesigned for
XLA: instead of torch ``Dataset``/``DataLoader`` objects we build numpy-native
datasets that yield **fixed-shape** batches ``(bags [B,T,F], coords [B,T,2],
bag_sizes [B], targets)`` ready for ``jax.device_put`` — static shapes are what
lets the training step stay compiled once.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterable, Iterator, Mapping, Sequence
from dataclasses import KW_ONLY, dataclass, field
from io import BytesIO
from itertools import groupby
from pathlib import Path
from typing import IO, Any, BinaryIO, Generic, TextIO, TypeAlias, Union, cast

import h5py
import numpy as np
import pandas as pd

from stamp_tpu.io.h5 import CoordsInfo, detect_feature_type, get_coords, get_stride
from stamp_tpu.types import (
    BagSize,
    Category,
    FeaturePath,
    GroundTruth,
    GroundTruthType,
    PandasLabel,
    PatientId,
    Task,
)
from stamp_tpu.utils.seed import Seed

__all__ = [
    "PatientData",
    "BagDataset",
    "PatientFeatureDataset",
    "BatchIterator",
    "detect_feature_type",
    "get_coords",
    "get_stride",
    "load_patient_data_",
    "create_dataset",
    "read_table",
    "filter_complete_patient_data_",
]

_logger = logging.getLogger("stamp")

_BinaryIOLike: TypeAlias = Union[BinaryIO, IO[bytes], BytesIO]
_EncodedTarget: TypeAlias = Union[np.ndarray, dict[str, np.ndarray]]


@dataclass
class PatientData(Generic[GroundTruthType]):
    """All raw (i.e. non-generated) information we have on the patient."""

    _ = KW_ONLY
    ground_truth: GroundTruthType
    feature_files: Iterable[FeaturePath | _BinaryIOLike]


# ---------------------------------------------------------------------------
# Table parsing (reference data.py:865-1061)
# ---------------------------------------------------------------------------


def read_table(path: Path | TextIO, **kwargs) -> pd.DataFrame:
    if not isinstance(path, Path):
        return pd.read_csv(path, **kwargs)
    elif path.suffix == ".xlsx":
        return pd.read_excel(path, **kwargs)
    elif path.suffix == ".csv":
        return pd.read_csv(path, **kwargs)
    else:
        raise ValueError(
            "table to load has to either be an excel (`*.xlsx`) or csv (`*.csv`) file."
        )


def _parse_survival_status(value) -> int | None:
    """Parse survival status into 1 (event) / 0 (censored).

    Reference data.py:1164-1201; the token sets are replicated verbatim.
    """
    s = str(value).strip().lower()
    positives = {"1", "event", "dead", "deceased", "yes", "y", "True", "true"}
    negatives = {"0", "alive", "censored", "no", "false"}
    if s in positives:
        return 1
    elif s in negatives:
        return 0
    try:
        f = float(s)
        return 1 if f > 0 else 0
    except ValueError:
        raise ValueError(
            f"Unrecognized survival status: '{value}'. "
            f"Expected one of {sorted(positives | negatives)} or a numeric value."
        )


def patient_to_ground_truth_from_clini_table_(
    *,
    clini_table_path: Path | TextIO,
    patient_label: PandasLabel,
    ground_truth_label: PandasLabel | Sequence[PandasLabel],
) -> dict[PatientId, Any]:
    """Load patient → ground truth (single- or multi-target) from a clini table.

    Reference data.py:865-933.
    """
    if isinstance(ground_truth_label, str):
        cols = [patient_label, ground_truth_label]
        multi = False
        target_cols_inner: list[PandasLabel] = []
    else:
        cols = [patient_label, *list(ground_truth_label)]
        multi = True
        target_cols_inner = [c for c in cols if c != patient_label]

    clini_df = read_table(clini_table_path, usecols=cols, dtype=str)

    if multi:
        clini_df = clini_df.dropna(subset=target_cols_inner, how="all")
    else:
        clini_df = clini_df.dropna(subset=[ground_truth_label])

    try:
        if multi:
            result: dict[PatientId, dict[str, GroundTruth | None]] = {}
            for _, row in clini_df.iterrows():
                pid = row[patient_label]
                result[pid] = {
                    col: (None if pd.isna(row[col]) else str(row[col]))
                    for col in target_cols_inner
                }
            return result
        else:
            return cast(
                dict[PatientId, Any],
                clini_df.set_index(patient_label, verify_integrity=True)[
                    cast(PandasLabel, ground_truth_label)
                ].to_dict(),
            )
    except KeyError as e:
        if patient_label not in clini_df:
            raise ValueError(
                f"{patient_label} was not found in clini table "
                f"(columns in clini table: {clini_df.columns})"
            ) from e
        raise ValueError(
            "One or more ground truth columns were not found in clini table "
            f"(columns in clini table: {clini_df.columns})"
        ) from e


_MISSING_TOKENS = [
    "NA", "NaN", "nan", "None", "none", "N/A", "n/a", "NULL", "null",
    "", " ", "?", "-", "--", "#N/A", "#NA", "=#VALUE!",
]  # fmt: skip


def patient_to_survival_from_clini_table_(
    *,
    clini_table_path: Path | TextIO,
    patient_label: PandasLabel,
    time_label: PandasLabel,
    status_label: PandasLabel,
) -> dict[PatientId, tuple[float | None, int | None]]:
    """Load patient → (time, event) survival ground truth.

    Reference data.py:936-1002, incl. messy-string normalization.
    """
    clini_df = read_table(
        clini_table_path, usecols=[patient_label, time_label, status_label], dtype=str
    )
    clini_df[time_label] = clini_df[time_label].replace(_MISSING_TOKENS, np.nan)
    clini_df[status_label] = clini_df[status_label].str.strip().str.lower()
    clini_df = clini_df.dropna(subset=[time_label, status_label], how="all")

    patient_to_ground_truth: dict[PatientId, tuple[float | None, int | None]] = {}
    for _, row in clini_df.iterrows():
        pid = row[patient_label]
        time_str = row[time_label]
        status_str = row[status_label]
        if pd.isna(time_str):
            continue
        status = _parse_survival_status(status_str)
        time_val = None if pd.isna(time_str) else float(time_str)
        patient_to_ground_truth[pid] = (time_val, status)

    return patient_to_ground_truth


def slide_to_patient_from_slide_table_(
    *,
    slide_table_path: Path,
    feature_dir: Path,
    patient_label: PandasLabel,
    filename_label: PandasLabel,
) -> dict[FeaturePath, PatientId]:
    """Slide-table → {feature path: patient}, verifying ``.h5`` extensions
    (reference data.py:1005-1041)."""
    slide_df = read_table(
        slide_table_path, usecols=[patient_label, filename_label], dtype=str
    )
    for x in slide_df[filename_label]:
        if not str(x).endswith(".h5"):
            raise ValueError(
                "One or more files are missing the .h5 extension in the "
                "filename_label column. The first file missing the .h5 "
                "extension is: " + str(x) + "."
            )
    return {
        FeaturePath(feature_dir / cast(str, k)): PatientId(cast(str, patient))
        for k, patient in slide_df.set_index(filename_label, verify_integrity=True)[
            patient_label
        ].items()
    }


def _log_patient_slide_feature_inconsistencies(
    *,
    patient_to_ground_truth: Mapping[PatientId, Any],
    slide_to_patient: Mapping[FeaturePath, PatientId],
) -> None:
    """Reference data.py:1115-1147."""
    if (
        patients_without_slides := patient_to_ground_truth.keys()
        - set(slide_to_patient.values())
    ):
        _logger.warning(
            f"some patients have no associated slides: {patients_without_slides}"
        )
    if patients_without_ground_truth := (
        set(slide_to_patient.values()) - patient_to_ground_truth.keys()
    ):
        _logger.warning(
            f"some patients have no clinical information: {patients_without_ground_truth}"
        )
    if slides_without_features := {
        slide for slide in slide_to_patient.keys() if not slide.exists()
    }:
        slides_list = sorted(s.name for s in slides_without_features)
        _logger.warning(
            "some feature files could not be found: %s", ", ".join(slides_list)
        )


def filter_complete_patient_data_(
    *,
    patient_to_ground_truth: Mapping[PatientId, Any],
    slide_to_patient: Mapping[FeaturePath, PatientId],
    drop_patients_with_missing_ground_truth: bool,
) -> Mapping[PatientId, PatientData]:
    """Aggregate info for all patients with complete data (reference data.py:1057-1112)."""
    _log_patient_slide_feature_inconsistencies(
        patient_to_ground_truth=patient_to_ground_truth,
        slide_to_patient=slide_to_patient,
    )

    patient_to_slides: dict[PatientId, set[FeaturePath]] = {
        patient: set(slides)
        for patient, slides in groupby(
            slide_to_patient, lambda slide: slide_to_patient[slide]
        )
    }

    if not drop_patients_with_missing_ground_truth:
        patient_to_ground_truth = {
            **{patient_id: None for patient_id in patient_to_slides},
            **patient_to_ground_truth,
        }

    patients = {
        patient_id: PatientData(
            ground_truth=ground_truth, feature_files=existing_features_for_patient
        )
        for patient_id, ground_truth in patient_to_ground_truth.items()
        if (slides := patient_to_slides.get(patient_id)) is not None
        and (
            existing_features_for_patient := {
                feature_path for feature_path in slides if feature_path.exists()
            }
        )
    }

    _logger.info(
        f"Total patients in clinical table: {len(patient_to_ground_truth)}\n"
        f"Patients appearing in slide table: {len(patient_to_slides)}\n"
        f"Final usable patients (complete data): {len(patients)}\n"
    )
    return patients


def load_patient_level_data(
    *,
    task: Task | None,
    clini_table: Path,
    feature_dir: Path,
    patient_label: PandasLabel,
    ground_truth_label: PandasLabel | Sequence[PandasLabel] | None = None,
    time_label: PandasLabel | None = None,
    status_label: PandasLabel | None = None,
    feature_ext: str = ".h5",
) -> dict[PatientId, PatientData]:
    """Patient-level features: match clini-table patients to {pid}.h5 files
    (reference data.py:460-529)."""
    if task is not None and task != "classification":
        if isinstance(ground_truth_label, Sequence) and not isinstance(
            ground_truth_label, str
        ):
            raise ValueError(
                "Multi-target ground_truth_label is only supported for classification tasks"
            )

    if task == "survival" and time_label is not None and status_label is not None:
        patient_to_ground_truth: Mapping[PatientId, Any] = (
            patient_to_survival_from_clini_table_(
                clini_table_path=clini_table,
                patient_label=patient_label,
                time_label=time_label,
                status_label=status_label,
            )
        )
    elif task in ["classification", "regression"] and ground_truth_label is not None:
        patient_to_ground_truth = patient_to_ground_truth_from_clini_table_(
            clini_table_path=clini_table,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
        )
    else:
        raise ValueError(
            "You must provide either `ground_truth_label` for classification/"
            "regression or (`time_label`, `status_label`) for survival when "
            "using tile-level or slide-level features."
        )

    patient_to_data: dict[PatientId, PatientData] = {}
    missing_features = []
    for pid, gt in patient_to_ground_truth.items():
        feature_file = feature_dir / f"{pid}{feature_ext}"
        if feature_file.exists():
            patient_to_data[pid] = PatientData(
                ground_truth=gt, feature_files=[FeaturePath(feature_file)]
            )
        else:
            missing_features.append(pid)

    if missing_features:
        _logger.warning(
            f"Some patients have no feature file in {feature_dir}: {missing_features}"
        )
    return patient_to_data


def load_patient_data_(
    *,
    feature_dir: Path,
    clini_table: Path,
    slide_table: Path | None,
    task: Task,
    ground_truth_label: PandasLabel | Sequence[PandasLabel] | None,
    time_label: PandasLabel | None,
    status_label: PandasLabel | None,
    patient_label: PandasLabel,
    filename_label: PandasLabel,
    drop_patients_with_missing_ground_truth: bool = True,
) -> tuple[Mapping[PatientId, PatientData], str]:
    """Unified patient-data loading (reference data.py:1204-1294)."""
    feature_type = detect_feature_type(feature_dir)

    if feature_type in ("tile", "slide"):
        if slide_table is None:
            raise ValueError("A slide table is required for tile/slide-level features")

        if task == "survival":
            if time_label is None or status_label is None:
                raise ValueError(
                    "Both time_label and status_label are required for survival modeling"
                )
            patient_to_ground_truth: Mapping[PatientId, Any] = (
                patient_to_survival_from_clini_table_(
                    clini_table_path=clini_table,
                    time_label=time_label,
                    status_label=status_label,
                    patient_label=patient_label,
                )
            )
        else:
            if ground_truth_label is None:
                raise ValueError(
                    "Ground truth label is required for classification or regression modeling"
                )
            if (
                task != "classification"
                and isinstance(ground_truth_label, Sequence)
                and not isinstance(ground_truth_label, str)
            ):
                raise ValueError(
                    "Multi-target ground_truth_label is only supported for classification tasks"
                )
            patient_to_ground_truth = patient_to_ground_truth_from_clini_table_(
                clini_table_path=clini_table,
                ground_truth_label=ground_truth_label,
                patient_label=patient_label,
            )

        slide_to_patient = slide_to_patient_from_slide_table_(
            slide_table_path=slide_table,
            feature_dir=feature_dir,
            patient_label=patient_label,
            filename_label=filename_label,
        )
        patient_to_data = filter_complete_patient_data_(
            patient_to_ground_truth=patient_to_ground_truth,
            slide_to_patient=slide_to_patient,
            drop_patients_with_missing_ground_truth=drop_patients_with_missing_ground_truth,
        )
    elif feature_type == "patient":
        patient_to_data = load_patient_level_data(
            task=task,
            clini_table=clini_table,
            feature_dir=feature_dir,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
            time_label=time_label,
            status_label=status_label,
        )
    else:
        raise RuntimeError(f"Unknown feature type: {feature_type}")

    return patient_to_data, feature_type


def log_patient_class_summary(
    *,
    patient_to_data: Mapping[PatientId, PatientData],
    categories: Sequence[Category] | None,
) -> None:
    """Class-distribution logging (reference data.py:1297-1339)."""
    ground_truths = [
        p.ground_truth for p in patient_to_data.values() if p.ground_truth is not None
    ]
    if not ground_truths:
        _logger.warning("No ground truths available for summary.")
        return

    if isinstance(ground_truths[0], dict):
        per_target: dict[str, list] = {}
        for gt in ground_truths:
            for key, value in gt.items():
                per_target.setdefault(key, []).append(value)
        for target_name, values in per_target.items():
            counts: dict = {}
            for v in values:
                counts[v] = counts.get(v, 0) + 1
            _logger.info(f"[Multi-target] Target '{target_name}' distribution: {counts}")
    else:
        counts = {}
        for gt in ground_truths:
            counts[gt] = counts.get(gt, 0) + 1
        _logger.info(f"Class distribution: {counts}")


# ---------------------------------------------------------------------------
# Target encoding (reference data.py:146-252)
# ---------------------------------------------------------------------------


def _parse_targets(
    *,
    patient_data: Sequence[PatientData],
    task: Task,
    categories: Sequence[Category] | None = None,
) -> tuple[
    Union[np.ndarray, list[dict[str, np.ndarray]]],
    Sequence[Category] | Mapping[str, Sequence[Category]],
]:
    """Parse raw ground truths into model-ready arrays.

    The ONLY place task semantics live (reference data.py:146-252).
    """
    gts = [p.ground_truth for p in patient_data]

    if task == "classification":
        if any(isinstance(gt, dict) for gt in gts if gt is not None):
            first_dict = next(gt for gt in gts if isinstance(gt, dict))
            target_names = list(first_dict.keys())

            categories_out: dict[str, list[str]] = {t: [] for t in target_names}
            for gt in gts:
                if not isinstance(gt, dict):
                    continue
                for t in target_names:
                    v = gt.get(t)
                    if v is not None:
                        categories_out[t].append(v)
            categories_out = {t: sorted(set(vals)) for t, vals in categories_out.items()}

            encoded: list[dict[str, np.ndarray]] = []
            for gt in gts:
                patient_encoded: dict[str, np.ndarray] = {}
                for t in target_names:
                    cats = categories_out[t]
                    if not isinstance(gt, dict) or gt.get(t) is None:
                        one_hot = np.zeros(len(cats), dtype=np.float32)
                    else:
                        one_hot = np.array(
                            [gt[t] == c for c in cats], dtype=np.float32
                        )
                    patient_encoded[t] = one_hot
                encoded.append(patient_encoded)
            return encoded, categories_out

        unique = {gt for gt in gts if gt is not None}
        if len(unique) >= 2 or categories is not None:
            raw = np.array([p.ground_truth for p in patient_data])
            categories = categories or list(sorted(unique))
            labels = (raw.reshape(-1, 1) == np.array(categories)).astype(np.float32)
            return labels, categories

        raise ValueError(
            "Only one unique class found in classification task. "
            "This is usually a data or configuration error."
        )

    elif task == "regression":
        y = np.array(
            [np.nan if gt is None else float(gt) for gt in gts], dtype=np.float32
        ).reshape(-1, 1)
        return y, []

    elif task == "survival":
        times, events = [], []
        for gt in gts:
            if gt is None:
                times.append(np.nan)
                events.append(np.nan)
                continue
            if isinstance(gt, (tuple, list)) and len(gt) == 2:
                t_val, e_val = gt
                times.append(
                    np.nan
                    if t_val is None or str(t_val).lower() == "nan"
                    else float(t_val)
                )
                events.append(float(e_val) if e_val is not None else np.nan)
            else:
                raise ValueError(
                    "survival ground truth must be a (time, event) tuple/list"
                )
        y = np.column_stack([times, events]).astype(np.float32)
        return y, []

    else:
        raise ValueError(f"Unsupported task: {task}")


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------


def _open_h5(bag_file: FeaturePath | _BinaryIOLike) -> h5py.File:
    try:
        return h5py.File(bag_file, "r", swmr=True, libver="latest")
    except Exception:
        return h5py.File(bag_file, "r")


class _H5HandleCache:
    """LRU cache of open h5 handles (reference data.py:588-596).

    A hit moves the key to the back; eviction closes the *least recently
    used* handle (the front).  Plain-dict ``popitem()`` would evict the
    newest entry, degenerating the cache once it is full.
    """

    def __init__(self, capacity: int = 128) -> None:
        self._capacity = capacity
        self._handles: dict = {}

    def get(self, bag_file: FeaturePath | _BinaryIOLike) -> h5py.File:
        key = bag_file if isinstance(bag_file, Path) else id(bag_file)
        handle = self._handles.pop(key, None)
        if handle is None:
            if len(self._handles) >= self._capacity:
                oldest = next(iter(self._handles))
                self._handles.pop(oldest).close()
            handle = _open_h5(bag_file)
        self._handles[key] = handle  # (re)insert at the back = most recent
        return handle


def _to_fixed_size_bag(
    bag: np.ndarray,
    coords: np.ndarray,
    bag_size: BagSize,
    *,
    deterministic: bool,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray, BagSize]:
    """Sample a fixed-size bag; zero-pad small bags (reference data.py:811-862).

    Deterministic mode uses equidistant indices across the bag so eval bags are
    reproducible.
    """
    n_tiles, _dim = bag.shape
    if n_tiles <= bag_size:
        bag_idxs = np.arange(n_tiles)
    elif deterministic:
        bag_idxs = np.round(np.linspace(0, n_tiles - 1, num=bag_size)).astype(np.int64)
    else:
        bag_idxs = rng.permutation(n_tiles)[:bag_size]

    bag_samples = bag[bag_idxs]
    coord_samples = coords[bag_idxs]

    if bag_samples.shape[0] < bag_size:
        pad = bag_size - bag_samples.shape[0]
        bag_samples = np.concatenate(
            [bag_samples, np.zeros((pad, bag_samples.shape[1]), dtype=bag.dtype)]
        )
        coord_samples = np.concatenate(
            [coord_samples, np.zeros((pad, coord_samples.shape[1]), dtype=coords.dtype)]
        )
    return bag_samples, coord_samples, min(bag_size, n_tiles)


@dataclass
class BagDataset:
    """A dataset of bags of instances backed by ``.h5`` files.

    Mirrors reference data.py:532-655 (multi-h5 concat per patient, LRU handle
    cache, random / deterministic-equidistant fixed-size bag sampling with
    zero-padding), producing numpy arrays.
    """

    _: KW_ONLY
    bags: Sequence[Iterable[FeaturePath | _BinaryIOLike]]
    bag_size: BagSize | None = None
    ground_truths: Union[np.ndarray, list[dict[str, np.ndarray]]] = None  # type: ignore[assignment]
    transform: Callable[[np.ndarray], np.ndarray] | None = None
    deterministic: bool = False
    _h5_handle_cache: _H5HandleCache = field(
        default_factory=_H5HandleCache, repr=False
    )
    _rng: np.random.Generator | None = None

    def __post_init__(self) -> None:
        if len(self.bags) != len(self.ground_truths):
            raise ValueError(
                "the number of ground truths has to match the number of bags"
            )

    @property
    def rng(self) -> np.random.Generator:
        if self._rng is None:
            self._rng = Seed.numpy_rng()
        return self._rng

    def __len__(self) -> int:
        return len(self.bags)

    def _handle(self, bag_file) -> h5py.File:
        return self._h5_handle_cache.get(bag_file)

    def __getitem__(
        self, index: int
    ) -> tuple[np.ndarray, np.ndarray, BagSize, _EncodedTarget]:
        feats_list, coords_list = [], []
        for bag_file in self.bags[index]:
            h5 = self._handle(bag_file)
            if "feats" in h5:
                arr = np.asarray(h5["feats"])
            else:
                arr = np.asarray(h5["patch_embeddings"])
            feats_list.append(arr)
            coords_list.append(get_coords(h5).coords_um)

        feats = np.concatenate(feats_list).astype(np.float32)
        coords_um = np.concatenate(coords_list).astype(np.float32)

        if self.transform is not None:
            feats = self.transform(feats)

        if self.bag_size is not None:
            bag, coords, size = _to_fixed_size_bag(
                feats,
                coords_um,
                self.bag_size,
                deterministic=self.deterministic,
                rng=self.rng,
            )
            return bag, coords, size, self.ground_truths[index]
        else:
            return feats, coords_um, len(feats), self.ground_truths[index]


class PatientFeatureDataset:
    """Single feature-vector-per-sample dataset (reference data.py:658-723)."""

    def __init__(
        self,
        feature_files: Sequence[FeaturePath | _BinaryIOLike],
        ground_truths: np.ndarray,
        transform: Callable[[np.ndarray], np.ndarray] | None = None,
    ):
        if len(feature_files) != len(ground_truths):
            raise ValueError("Number of feature files and ground truths must match.")
        self.feature_files = feature_files
        self.ground_truths = ground_truths
        self.transform = transform
        self._h5_handle_cache = _H5HandleCache()

    def __len__(self) -> int:
        return len(self.feature_files)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        feature_file = self.feature_files[idx]
        h5 = self._h5_handle_cache.get(feature_file)
        feats = np.asarray(h5["feats"])
        if feats.ndim == 2 and feats.shape[0] == 1:
            feats = feats[0]
        elif feats.ndim == 1:
            pass
        else:
            raise RuntimeError(
                f"Expected single feature vector (shape [F] or [1, F]), got "
                f"{feats.shape} in {feature_file}."
                "Check that the features are patient-level."
            )
        feats = feats.astype(np.float32)
        if self.transform is not None:
            feats = self.transform(feats)
        return feats, self.ground_truths[idx]


# ---------------------------------------------------------------------------
# Batch iteration — the XLA-facing surface
# ---------------------------------------------------------------------------


def _stack_targets(targets: list[_EncodedTarget]) -> _EncodedTarget:
    if isinstance(targets[0], dict):
        acc: dict[str, list[np.ndarray]] = {}
        for tdict in targets:
            for k, v in tdict.items():  # type: ignore[union-attr]
                acc.setdefault(k, []).append(v)
        return {k: np.stack(v, axis=0) for k, v in acc.items()}
    fixed = []
    for et in targets:
        et = np.asarray(et)
        if et.ndim == 0:
            et = et.reshape(1)
        elif et.ndim > 1:
            et = et.reshape(-1)
        fixed.append(et)
    return np.stack(fixed)


class BatchIterator:
    """Yields fixed-shape numpy batches from a dataset.

    This replaces torch's DataLoader.  Tile-level batches are
    ``(bags [B,T,F], coords [B,T,2], bag_sizes [B], targets)``; slide/patient
    level batches are ``(feats [B,F], targets)``.  The final short batch is
    yielded as-is (callers that need static shapes pad it themselves).
    """

    def __init__(
        self,
        dataset: BagDataset | PatientFeatureDataset,
        *,
        batch_size: int,
        shuffle: bool,
        drop_last: bool = False,
        rng: np.random.Generator | None = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = rng

    @property
    def rng(self) -> np.random.Generator:
        if self._rng is None:
            self._rng = Seed.numpy_rng()
        return self._rng

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = self.rng.permutation(order)
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            items = [self.dataset[int(i)] for i in idxs]
            if isinstance(self.dataset, BagDataset):
                bags = np.stack([it[0] for it in items])
                coords = np.stack([it[1] for it in items])
                bag_sizes = np.array([it[2] for it in items], dtype=np.int32)
                targets = _stack_targets([it[3] for it in items])
                yield bags, coords, bag_sizes, targets
            else:
                feats = np.stack([it[0] for it in items])
                targets = _stack_targets([it[1] for it in items])
                yield feats, targets


def tile_bag_dataset(
    *,
    patient_data: Sequence[PatientData],
    bag_size: int | None,
    task: Task,
    categories: Sequence[Category] | None = None,
    shuffle: bool,
    transform: Callable[[np.ndarray], np.ndarray] | None = None,
) -> tuple[BagDataset, Sequence[Category] | Mapping[str, Sequence[Category]]]:
    """Tile-level dataset factory (reference data.py:85-143)."""
    targets, cats_out = _parse_targets(
        patient_data=patient_data, task=task, categories=categories
    )
    ds = BagDataset(
        bags=[list(patient.feature_files) for patient in patient_data],
        bag_size=bag_size,
        ground_truths=targets,
        transform=transform,
        deterministic=(not shuffle),
    )
    return ds, cats_out


def create_dataset(
    *,
    feature_type: str,
    task: Task,
    patient_data: Sequence[PatientData],
    bag_size: int | None = None,
    shuffle: bool,
    transform: Callable[[np.ndarray], np.ndarray] | None = None,
    categories: Sequence[Category] | Mapping[str, Sequence[Category]] | None = None,
) -> tuple[
    BagDataset | PatientFeatureDataset,
    Sequence[Category] | Mapping[str, Sequence[Category]],
]:
    """Unified dataset factory for all feature types and tasks
    (reference data.py:321-421)."""
    if feature_type == "tile":
        cats_arg: Sequence[Category] | None
        if isinstance(categories, Mapping):
            cats_arg = None
        else:
            cats_arg = categories
        return tile_bag_dataset(
            patient_data=patient_data,
            bag_size=bag_size,
            task=task,
            categories=cats_arg,
            shuffle=shuffle,
            transform=transform,
        )
    elif feature_type in {"slide", "patient"}:
        feature_files = [next(iter(p.feature_files)) for p in patient_data]

        if task == "classification":
            raw = np.array([p.ground_truth for p in patient_data])
            categories = categories or list(np.unique(raw))
            labels = (raw.reshape(-1, 1) == np.array(list(categories))).astype(
                np.float32
            )
        elif task == "regression":
            values: list[float] = []
            for gt in (p.ground_truth for p in patient_data):
                if gt is None:
                    continue
                if isinstance(gt, dict):
                    raise ValueError(
                        "Multi-target regression is not supported; provide a "
                        "single numeric target per patient"
                    )
                values.append(float(gt))
            labels = np.array(values, dtype=np.float32).reshape(-1, 1)
        elif task == "survival":
            times, events = [], []
            for p in patient_data:
                if isinstance(p.ground_truth, dict):
                    raise ValueError(
                        "Multi-target survival is not supported; provide a "
                        "single survival time/status per patient"
                    )
                gt = p.ground_truth
                if isinstance(gt, (tuple, list)) and len(gt) == 2:
                    t, e = gt
                elif gt is None:
                    t, e = None, None
                else:
                    t, e = str(gt), "nan"

                if t is None:
                    times.append(np.nan)
                elif isinstance(t, str):
                    try:
                        times.append(np.nan if t.lower() == "nan" else float(t))
                    except Exception:
                        times.append(np.nan)
                else:
                    times.append(float(t))
                try:
                    events.append(_parse_survival_status(e))
                except ValueError:
                    events.append(np.nan)
            labels = np.column_stack([times, events]).astype(np.float32)
        else:
            raise ValueError(f"Unsupported task: {task}")

        ds = PatientFeatureDataset(feature_files, labels, transform)
        return ds, categories or []
    else:
        raise ValueError(f"Unknown feature type: {feature_type}")
