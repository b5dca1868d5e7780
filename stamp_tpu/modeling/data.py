"""Data layer: clinical/slide tables, patient assembly, bags, batching.

Behavioral parity with reference src/stamp/modeling/data.py, redesigned for
XLA: instead of torch ``Dataset``/``DataLoader`` objects we build numpy-native
datasets that yield **fixed-shape** batches ``(bags [B,T,F], coords [B,T,2],
bag_sizes [B], targets)`` ready for ``jax.device_put`` — static shapes are what
lets the training step stay compiled once.
"""

from __future__ import annotations

import logging
import threading
from collections.abc import Callable, Iterable, Iterator, Mapping, Sequence
from dataclasses import KW_ONLY, dataclass, field
from io import BytesIO
from pathlib import Path
from typing import IO, Any, BinaryIO, Generic, TextIO, TypeAlias, Union, cast

import h5py
import numpy as np
import pandas as pd

from stamp_tpu.io.h5 import detect_feature_type, get_coords, get_stride
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


_TABLE_LOADERS: dict[str, Callable[..., pd.DataFrame]] = {
    ".csv": pd.read_csv,
    ".xlsx": pd.read_excel,
}


def read_table(path: Path | TextIO, **kwargs) -> pd.DataFrame:
    """Load a clini/slide table; file-like inputs are treated as CSV."""
    if not isinstance(path, Path):
        return pd.read_csv(path, **kwargs)
    loader = _TABLE_LOADERS.get(path.suffix)
    if loader is None:
        raise ValueError(
            "table to load has to either be an excel (`*.xlsx`) or csv "
            "(`*.csv`) file."
        )
    return loader(path, **kwargs)


def _read_table_columns(
    path: Path | TextIO, columns: list[PandasLabel]
) -> pd.DataFrame:
    """Read exactly ``columns`` as strings, naming any missing column."""
    try:
        return read_table(path, usecols=columns, dtype=str)
    except ValueError as e:
        raise ValueError(
            f"table is missing one of the columns {columns}: {e}"
        ) from e


# tokens that mean "no value" in hand-curated survival-time columns
# (reference data.py:957-983)
_MISSING_TOKENS = [
    "NA", "NaN", "nan", "None", "none", "N/A", "n/a", "NULL", "null",
    "", " ", "?", "-", "--", "#N/A", "#NA", "=#VALUE!",
]  # fmt: skip

# free-form survival-status vocabularies (reference data.py:1164-1201);
# comparison happens on the stripped, lowercased token
_EVENT_TOKENS = {"1", "event", "dead", "deceased", "yes", "y", "true"}
_CENSORED_TOKENS = {"0", "alive", "censored", "no", "false"}


def _parse_survival_status(value) -> int:
    """Map a free-form status cell to 1 (event occurred) / 0 (censored).

    Strings outside both vocabularies fall through to numeric parsing,
    where any positive number counts as an event.
    """
    token = str(value).strip().lower()
    if token in _EVENT_TOKENS:
        return 1
    if token in _CENSORED_TOKENS:
        return 0
    try:
        return int(float(token) > 0)
    except ValueError:
        raise ValueError(
            f"Unrecognized survival status: {value!r}. Expected one of "
            f"{sorted(_EVENT_TOKENS | _CENSORED_TOKENS)} or a numeric value."
        ) from None


def patient_to_ground_truth_from_clini_table_(
    *,
    clini_table_path: Path | TextIO,
    patient_label: PandasLabel,
    ground_truth_label: PandasLabel | Sequence[PandasLabel],
) -> dict[PatientId, Any]:
    """Load patient → ground truth from a clini table.

    A single column name yields {patient: value}; a sequence of column
    names yields {patient: {column: value-or-None}} (multi-target), keeping
    patients for whom at least one target is present (behavior of reference
    data.py:865-933).
    """
    if isinstance(ground_truth_label, str):
        table = _read_table_columns(
            clini_table_path, [patient_label, ground_truth_label]
        ).dropna(subset=[ground_truth_label])
        series = table.set_index(patient_label)[ground_truth_label]
        if not series.index.is_unique:
            dupes = sorted(set(series.index[series.index.duplicated()]))
            raise ValueError(f"duplicate patients in clini table: {dupes}")
        return cast(dict[PatientId, Any], series.to_dict())

    targets = list(ground_truth_label)
    table = _read_table_columns(
        clini_table_path, [patient_label, *targets]
    ).dropna(subset=targets, how="all")
    # NaN → None per cell; later targets win on duplicated patient rows
    per_patient = table.set_index(patient_label)[targets]
    return {
        PatientId(str(pid)): {
            t: (None if pd.isna(v) else str(v)) for t, v in row.items()
        }
        for pid, row in per_patient.iterrows()
    }


def patient_to_survival_from_clini_table_(
    *,
    clini_table_path: Path | TextIO,
    patient_label: PandasLabel,
    time_label: PandasLabel,
    status_label: PandasLabel,
) -> dict[PatientId, tuple[float | None, int | None]]:
    """Load patient → (follow-up time, event indicator) ground truth.

    Messy-string handling per reference data.py:936-1002: missing-value
    tokens in the time column become NaN, the status column is normalized
    to lowercase, and patients without a usable time are dropped.
    """
    table = _read_table_columns(
        clini_table_path, [patient_label, time_label, status_label]
    )
    time = pd.to_numeric(
        table[time_label].replace(_MISSING_TOKENS, np.nan), errors="raise"
    )
    status = table[status_label].str.strip().str.lower()

    usable = time.notna()  # a status without a time is unusable either way
    return {
        PatientId(str(pid)): (float(t), _parse_survival_status(s))
        for pid, t, s in zip(
            table.loc[usable, patient_label], time[usable], status[usable]
        )
    }


def slide_to_patient_from_slide_table_(
    *,
    slide_table_path: Path,
    feature_dir: Path,
    patient_label: PandasLabel,
    filename_label: PandasLabel,
) -> dict[FeaturePath, PatientId]:
    """Slide table → {feature-file path: patient id}.

    Every filename must carry the ``.h5`` extension (the table names
    *feature files*, not WSIs — a classic configuration mistake caught
    here, reference data.py:1005-1041) and must be unique.
    """
    table = _read_table_columns(slide_table_path, [patient_label, filename_label])
    filenames = table[filename_label].astype(str)
    if not (is_h5 := filenames.str.endswith(".h5")).all():
        raise ValueError(
            "One or more files are missing the .h5 extension in the "
            "filename_label column. The first file missing the .h5 "
            f"extension is: {filenames[~is_h5].iloc[0]}."
        )
    if (dup := filenames.duplicated()).any():
        raise ValueError(
            f"duplicate slide filenames in slide table: "
            f"{sorted(set(filenames[dup]))}"
        )
    return {
        FeaturePath(feature_dir / fname): PatientId(str(pid))
        for fname, pid in zip(filenames, table[patient_label])
    }


def _warn_on_incomplete_cohort(
    *,
    patient_to_ground_truth: Mapping[PatientId, Any],
    slide_to_patient: Mapping[FeaturePath, PatientId],
) -> None:
    """Surface clini/slide-table/feature-dir disagreements before they
    silently shrink the cohort (behavior of reference data.py:1115-1147)."""
    clini_patients = set(patient_to_ground_truth)
    slide_patients = set(slide_to_patient.values())
    for missing, message in (
        (clini_patients - slide_patients, "some patients have no associated slides"),
        (slide_patients - clini_patients, "some patients have no clinical information"),
    ):
        if missing:
            _logger.warning(f"{message}: {missing}")
    if absent := sorted(p.name for p in slide_to_patient if not p.exists()):
        _logger.warning("some feature files could not be found: %s", ", ".join(absent))


def filter_complete_patient_data_(
    *,
    patient_to_ground_truth: Mapping[PatientId, Any],
    slide_to_patient: Mapping[FeaturePath, PatientId],
    drop_patients_with_missing_ground_truth: bool,
) -> Mapping[PatientId, PatientData]:
    """Assemble PatientData for every patient with both a ground truth and
    at least one existing feature file (behavior of reference
    data.py:1057-1112; patients explicitly mapped to None are kept).

    Slides are accumulated per patient over the whole table — the rows of
    one patient do not need to be contiguous.
    """
    _warn_on_incomplete_cohort(
        patient_to_ground_truth=patient_to_ground_truth,
        slide_to_patient=slide_to_patient,
    )

    patient_to_slides: dict[PatientId, set[FeaturePath]] = {}
    for feature_path, patient_id in slide_to_patient.items():
        patient_to_slides.setdefault(patient_id, set()).add(feature_path)

    eligible: Mapping[PatientId, Any]
    if drop_patients_with_missing_ground_truth:
        eligible = patient_to_ground_truth
    else:
        # slide-table patients without clinical info participate with a
        # ground truth of None (deploy-time cohorts)
        eligible = {
            **dict.fromkeys(patient_to_slides),
            **patient_to_ground_truth,
        }

    patients: dict[PatientId, PatientData] = {}
    for patient_id, ground_truth in eligible.items():
        on_disk = {
            path
            for path in patient_to_slides.get(patient_id, ())
            if path.exists()
        }
        if on_disk:
            patients[patient_id] = PatientData(
                ground_truth=ground_truth, feature_files=on_disk
            )

    _logger.info(
        f"Total patients in clinical table: {len(eligible)}\n"
        f"Patients appearing in slide table: {len(patient_to_slides)}\n"
        f"Final usable patients (complete data): {len(patients)}\n"
    )
    return patients


def _clini_ground_truths(
    *,
    task: Task | None,
    clini_table: Path,
    patient_label: PandasLabel,
    ground_truth_label: PandasLabel | Sequence[PandasLabel] | None,
    time_label: PandasLabel | None,
    status_label: PandasLabel | None,
) -> Mapping[PatientId, Any]:
    """Validate the task/label combination and parse the clini table.

    One shared gate for every feature level: survival needs both
    ``time_label`` and ``status_label``; everything else needs
    ``ground_truth_label``; multi-target labels are classification-only.
    """
    if task == "survival":
        if time_label is None or status_label is None:
            raise ValueError(
                "Both time_label and status_label are required for survival "
                "modeling"
            )
        return patient_to_survival_from_clini_table_(
            clini_table_path=clini_table,
            patient_label=patient_label,
            time_label=time_label,
            status_label=status_label,
        )

    if ground_truth_label is None:
        raise ValueError(
            "Ground truth label is required for classification or regression "
            "modeling"
        )
    multi_target = not isinstance(ground_truth_label, str)
    if multi_target and task != "classification":
        raise ValueError(
            "Multi-target ground_truth_label is only supported for "
            "classification tasks"
        )
    return patient_to_ground_truth_from_clini_table_(
        clini_table_path=clini_table,
        patient_label=patient_label,
        ground_truth_label=ground_truth_label,
    )


def load_patient_level_data(
    *,
    clini_table: Path,
    feature_dir: Path,
    task: Task | None,
    patient_label: PandasLabel,
    feature_ext: str = ".h5",
    ground_truth_label: PandasLabel | Sequence[PandasLabel] | None = None,
    status_label: PandasLabel | None = None,
    time_label: PandasLabel | None = None,
) -> dict[PatientId, PatientData]:
    """Patient-level features carry no slide table: each clini-table patient
    maps directly to ``<feature_dir>/<patient_id>.h5`` (behavior of
    reference data.py:460-529)."""
    ground_truths = _clini_ground_truths(
        task=task,
        clini_table=clini_table,
        patient_label=patient_label,
        ground_truth_label=ground_truth_label,
        time_label=time_label,
        status_label=status_label,
    )

    located = {
        pid: feature_dir / f"{pid}{feature_ext}" for pid in ground_truths
    }
    if skipped := [pid for pid, path in located.items() if not path.exists()]:
        _logger.warning(
            f"Some patients have no feature file in {feature_dir}: {skipped}"
        )
    return {
        pid: PatientData(
            ground_truth=ground_truths[pid],
            feature_files=[FeaturePath(path)],
        )
        for pid, path in located.items()
        if path.exists()
    }


def load_patient_data_(
    *,
    clini_table: Path,
    slide_table: Path | None,
    feature_dir: Path,
    patient_label: PandasLabel,
    filename_label: PandasLabel,
    task: Task,
    ground_truth_label: PandasLabel | Sequence[PandasLabel] | None,
    time_label: PandasLabel | None,
    status_label: PandasLabel | None,
    drop_patients_with_missing_ground_truth: bool = True,
) -> tuple[Mapping[PatientId, PatientData], str]:
    """Unified cohort loading: detect the feature level from the h5 attrs,
    then assemble {patient: (ground truth, feature files)} for it (behavior
    of reference data.py:1204-1294)."""
    feature_type = detect_feature_type(feature_dir)

    if feature_type == "patient":
        return (
            load_patient_level_data(
                task=task,
                clini_table=clini_table,
                feature_dir=feature_dir,
                patient_label=patient_label,
                ground_truth_label=ground_truth_label,
                time_label=time_label,
                status_label=status_label,
            ),
            feature_type,
        )

    if feature_type not in ("tile", "slide"):
        raise RuntimeError(f"Unknown feature type: {feature_type}")
    if slide_table is None:
        raise ValueError("A slide table is required for tile/slide-level features")

    patient_to_data = filter_complete_patient_data_(
        patient_to_ground_truth=_clini_ground_truths(
            task=task,
            clini_table=clini_table,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
            time_label=time_label,
            status_label=status_label,
        ),
        slide_to_patient=slide_to_patient_from_slide_table_(
            slide_table_path=slide_table,
            feature_dir=feature_dir,
            patient_label=patient_label,
            filename_label=filename_label,
        ),
        drop_patients_with_missing_ground_truth=drop_patients_with_missing_ground_truth,
    )
    return patient_to_data, feature_type


def log_patient_class_summary(
    *,
    patient_to_data: Mapping[PatientId, PatientData],
    categories: Sequence[Category] | None,
) -> None:
    """Log the cohort's class distribution, one line per target (behavior
    of reference data.py:1297-1339)."""
    from collections import Counter

    ground_truths = [
        gt
        for p in patient_to_data.values()
        if (gt := p.ground_truth) is not None
    ]
    if not ground_truths:
        _logger.warning("No ground truths available for summary.")
        return

    if isinstance(ground_truths[0], dict):
        names = sorted({name for gt in ground_truths for name in gt})
        for name in names:
            tally = Counter(gt.get(name) for gt in ground_truths)
            _logger.info(
                f"[Multi-target] Target '{name}' distribution: {dict(tally)}"
            )
    else:
        _logger.info(f"Class distribution: {dict(Counter(ground_truths))}")


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
        if any(isinstance(gt, dict) for gt in gts):
            return _encode_multi_target(gts)
        unique = {gt for gt in gts if gt is not None}
        if len(unique) < 2 and categories is None:
            raise ValueError(
                "Only one unique class found in classification task. "
                "This is usually a data or configuration error."
            )
        cats = list(categories) if categories is not None else sorted(unique)
        raw = np.array(gts)
        return (raw.reshape(-1, 1) == np.array(cats)).astype(np.float32), cats

    if task == "regression":
        scalars = [np.nan if gt is None else float(gt) for gt in gts]
        return np.asarray(scalars, np.float32).reshape(-1, 1), []

    if task == "survival":
        pairs: list[tuple[float, float]] = []
        for gt in gts:
            if gt is None:
                pairs.append((np.nan, np.nan))
                continue
            if not (isinstance(gt, (tuple, list)) and len(gt) == 2):
                raise ValueError(
                    "survival ground truth must be a (time, event) tuple/list"
                )
            time, event = gt
            time_missing = time is None or str(time).lower() == "nan"
            pairs.append((
                np.nan if time_missing else float(time),
                np.nan if event is None else float(event),
            ))
        return np.asarray(pairs, np.float32), []

    raise ValueError(f"Unsupported task: {task}")


def _encode_multi_target(
    gts: Sequence[dict | None],
) -> tuple[list[dict[str, np.ndarray]], dict[str, list[str]]]:
    """Multi-target classification: per-target category vocabularies from the
    observed values, missing targets encoded as all-zero one-hots (the loss
    masks them out downstream)."""
    target_names = next(list(gt) for gt in gts if isinstance(gt, dict))
    vocab = {
        name: sorted({
            gt[name]
            for gt in gts
            if isinstance(gt, dict) and gt.get(name) is not None
        })
        for name in target_names
    }

    def one_hot(gt, name: str) -> np.ndarray:
        value = gt.get(name) if isinstance(gt, dict) else None
        return np.asarray(
            [value == c for c in vocab[name]], dtype=np.float32
        )

    encoded = [
        {name: one_hot(gt, name) for name in target_names} for gt in gts
    ]
    return encoded, vocab


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

    Handles are kept per thread (``threading.local``): loader workers each
    get their own LRU, so no thread can close a handle another thread is
    mid-read on, and no lock sits on the hot path.
    """

    def __init__(self, capacity: int = 128) -> None:
        self._capacity = capacity
        self._local = threading.local()
        # every thread's handle dict, so close_all() can release handles of
        # loader threads that have since exited (thread-locals of dead
        # threads otherwise linger until GC, pinning file descriptors)
        self._all_handle_dicts: list[dict] = []
        self._registry_lock = threading.Lock()

    def get(self, bag_file: FeaturePath | _BinaryIOLike) -> h5py.File:
        handles: dict | None = getattr(self._local, "handles", None)
        if handles is None:
            handles = self._local.handles = {}
            with self._registry_lock:
                self._all_handle_dicts.append(handles)
        key = bag_file if isinstance(bag_file, Path) else id(bag_file)
        handle = handles.pop(key, None)
        if handle is None:
            if len(handles) >= self._capacity:
                oldest = next(iter(handles))
                handles.pop(oldest).close()
            handle = _open_h5(bag_file)
        handles[key] = handle  # (re)insert at the back = most recent
        return handle

    def close_all(self) -> None:
        """Close every cached handle across all threads.

        Only safe while no worker thread is reading — the loader calls it
        after its thread pool has shut down.  Handles reopen on demand.
        """
        with self._registry_lock:
            for handles in self._all_handle_dicts:
                for handle in handles.values():
                    try:
                        handle.close()
                    except Exception:  # noqa: BLE001 — already closed is fine
                        pass
                handles.clear()


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
    ground_truths: Union[np.ndarray, list[dict[str, np.ndarray]]]
    bag_size: BagSize | None = None
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
        self, index: int, rng: np.random.Generator | None = None
    ) -> tuple[np.ndarray, np.ndarray, BagSize, _EncodedTarget]:
        """``rng`` overrides the dataset RNG for the bag draw — the loader
        passes a per-item generator so parallel workers sample
        deterministically regardless of fetch order."""
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
                rng=rng if rng is not None else self.rng,
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


def _sliding_window_map(pool, fn, n: int, depth: int) -> Iterator:
    """``map(fn, range(n))`` over a thread pool with at most ``depth`` items
    in flight — ordered results, bounded memory (a full ``pool.map`` would
    materialize every bag of the epoch)."""
    from collections import deque

    pending: deque = deque(
        pool.submit(fn, j) for j in range(min(depth, n))
    )
    for j in range(n):
        result = pending.popleft().result()
        if (ahead := j + depth) < n:
            pending.append(pool.submit(fn, ahead))
        yield result


class BatchIterator:
    """Yields fixed-shape numpy batches from a dataset.

    ``num_workers > 1`` fetches items with a thread pool (bounded
    look-ahead): h5 reads and numpy decompression release the GIL, so bag
    loading overlaps both itself and the jitted train step.  Bag sampling
    stays deterministic for any worker count because every item's RNG is
    seeded from the epoch RNG before fetching starts.

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
        num_workers: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = rng
        self.num_workers = max(1, num_workers)

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

        if isinstance(self.dataset, BagDataset):
            # per-item bag-draw seeds come from the epoch RNG *up front*, so
            # the sampled bags are identical for any num_workers
            seeds = self.rng.integers(0, 2**63, size=len(order))
            dataset = self.dataset

            def fetch(j: int):
                return dataset.__getitem__(
                    int(order[j]), rng=np.random.default_rng(seeds[j])
                )
        else:

            def fetch(j: int):
                return self.dataset[int(order[j])]

        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    yield from self._batched(
                        _sliding_window_map(
                            pool, fetch, len(order), self.num_workers * 4
                        ),
                        len(order),
                    )
            finally:
                # the pool's threads are gone; release their cached h5
                # handles now instead of waiting for GC to find the dead
                # threads' locals (file descriptors are finite)
                cache = getattr(self.dataset, "_h5_handle_cache", None)
                if cache is not None:
                    cache.close_all()
        else:
            yield from self._batched(map(fetch, range(len(order))), len(order))

    def _batched(self, items: Iterator, n_items: int) -> Iterator:
        for start in range(0, n_items, self.batch_size):
            count = min(self.batch_size, n_items - start)
            if self.drop_last and count < self.batch_size:
                return
            batch = [next(items) for _ in range(count)]
            if isinstance(self.dataset, BagDataset):
                bags = np.stack([it[0] for it in batch])
                coords = np.stack([it[1] for it in batch])
                bag_sizes = np.array([it[2] for it in batch], dtype=np.int32)
                targets = _stack_targets([it[3] for it in batch])
                yield bags, coords, bag_sizes, targets
            else:
                feats = np.stack([it[0] for it in batch])
                targets = _stack_targets([it[1] for it in batch])
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
        gts = [p.ground_truth for p in patient_data]
        if task != "classification" and any(isinstance(gt, dict) for gt in gts):
            raise ValueError(
                f"Multi-target {task} is not supported; provide a single "
                "target per patient"
            )

        if task == "classification":
            raw = np.array(gts)
            categories = categories or list(np.unique(raw))
            labels = (raw.reshape(-1, 1) == np.array(list(categories))).astype(
                np.float32
            )
        elif task == "regression":
            # NaN keeps row alignment with feature_files for missing targets
            labels = np.asarray(
                [np.nan if gt is None else float(gt) for gt in gts], np.float32
            ).reshape(-1, 1)
        elif task == "survival":
            labels = np.asarray(
                [_lenient_survival_pair(gt) for gt in gts], np.float32
            )
        else:
            raise ValueError(f"Unsupported task: {task}")

        ds = PatientFeatureDataset(feature_files, labels, transform)
        return ds, categories or []
    else:
        raise ValueError(f"Unknown feature type: {feature_type}")


def _lenient_survival_pair(gt) -> tuple[float, float]:
    """Coerce a stored ground truth into (time, event) floats, NaN where a
    piece is missing or unparseable.  Deploy-time cohorts may carry bare
    strings or no ground truth at all, so nothing raises here."""
    if isinstance(gt, (tuple, list)) and len(gt) == 2:
        time_raw, event_raw = gt
    elif gt is None:
        time_raw, event_raw = None, None
    else:  # a bare value is a time with unknown status
        time_raw, event_raw = str(gt), None
    try:
        time = float(time_raw) if time_raw is not None else np.nan
    except (TypeError, ValueError):
        time = np.nan
    try:
        event = (
            float(_parse_survival_status(event_raw))
            if event_raw is not None
            else np.nan
        )
    except ValueError:
        event = np.nan
    return time, event
