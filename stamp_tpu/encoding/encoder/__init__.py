"""Slide/patient encoder abstraction.

Behavioral parity with the reference Encoder base
(src/stamp/encoding/encoder/__init__.py:29-250): skip-if-exists idempotency,
hash-named output directories, input validation of the required tile
extractor (with hash-suffix stripping), and atomic h5 writes carrying
{encoder, precision, feat_type} attrs.

Own shape: slide- and patient-mode encoding are expressed as one worklist —
``_EncodeJob``s of (description, output path, input h5 files) — drained by a
single ``_run_jobs`` loop, instead of two parallel template-method bodies.
Subclasses only provide the embedding functions (and may override the
``encode_*_`` entry points entirely, e.g. EAGLE's dual-feature-dir variant).
"""

from __future__ import annotations

import logging
import os
import re
from abc import ABC, abstractmethod
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterable

import h5py
import numpy as np
from tqdm import tqdm

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.io.h5 import CoordsInfo, get_coords, write_pooled_feats_atomic
from stamp_tpu.modeling.data import read_table
from stamp_tpu.preprocessing.config import ExtractorName
from stamp_tpu.types import PandasLabel
from stamp_tpu.utils.cache import get_processing_code_hash

_logger = logging.getLogger("stamp")

_HASH_SUFFIX = re.compile(r"^[0-9a-fA-F]{6,}$")


def _resolve_extractor_name(name: str) -> str:
    """Strip a trailing code-hash suffix from an extractor id
    (reference encoder/__init__.py:235-250)."""
    if not name:
        raise ValueError("Empty extractor name")
    name = str(name).strip()
    base, dash, suffix = name.rpartition("-")
    if dash and _HASH_SUFFIX.match(suffix):
        return base
    return name


@dataclass(frozen=True)
class _EncodeJob:
    """One unit of encoding work: n input h5 files → one output h5."""

    description: str  # progress-bar label (slide stem / patient id)
    output_path: Path
    input_h5s: tuple[Path, ...]


class Encoder(ABC):
    def __init__(
        self,
        *,
        identifier: EncoderName,
        precision: str,
        required_extractors: list[ExtractorName],
    ):
        self.identifier = identifier
        self.precision = precision
        self.required_extractors = required_extractors
        # precision attrs observed on the input tile h5s (int8 provenance)
        self._source_precisions: set[str] = set()

    # -- public entry points -------------------------------------------------

    def encode_slides_(
        self,
        *,
        output_dir: Path,
        feat_dir: Path,
        device: str = "auto",
        generate_hash: bool = True,
        **kwargs,
    ) -> None:
        """Encode every tile-feature h5 under ``feat_dir`` into one
        slide-level feature file."""
        encode_dir = self._make_output_dir(output_dir, "slide", generate_hash)

        def jobs() -> Iterable[_EncodeJob]:
            for h5_path in sorted(feat_dir.rglob("*.h5")):
                out = (encode_dir / h5_path.relative_to(feat_dir)).with_suffix(
                    ".h5"
                )
                yield _EncodeJob(h5_path.stem, out, (h5_path,))

        def embed(
            feats_list: list[np.ndarray], coords_list: list[CoordsInfo]
        ) -> np.ndarray:
            return self._generate_slide_embedding(
                feats_list[0], device, coords=coords_list[0]
            )

        self._run_jobs(list(jobs()), embed, feat_type="slide")

    def encode_patients_(
        self,
        *,
        output_dir: Path,
        feat_dir: Path,
        slide_table_path: Path,
        patient_label: PandasLabel,
        filename_label: PandasLabel,
        device: str = "auto",
        generate_hash: bool = True,
        **kwargs,
    ) -> None:
        """Encode all of a patient's slides into one patient-level feature."""
        encode_dir = self._make_output_dir(output_dir, "pat", generate_hash)

        slide_table = read_table(slide_table_path)
        jobs = [
            _EncodeJob(
                str(patient_id),
                (encode_dir / str(patient_id)).with_suffix(".h5"),
                tuple(
                    Path(feat_dir) / filename
                    for filename in group[filename_label]
                ),
            )
            for patient_id, group in slide_table.groupby(patient_label)
        ]

        def embed(
            feats_list: list[np.ndarray], coords_list: list[CoordsInfo]
        ) -> np.ndarray:
            return self._generate_patient_embedding(feats_list, device, **kwargs)

        self._run_jobs(jobs, embed, feat_type="patient")

    # -- the shared worklist loop --------------------------------------------

    def _run_jobs(
        self,
        jobs: list[_EncodeJob],
        embed: Callable[[list, list[CoordsInfo]], np.ndarray],
        *,
        feat_type: str,
        read: Callable[[Path], tuple] | None = None,
    ) -> None:
        """Drain the worklist.  ``read`` maps one input h5 path to a
        (features, coords) pair; the default reads and validates a single
        tile-feature file, and subclasses with richer inputs (e.g. EAGLE's
        paired feature dirs) pass their own."""
        if read is None:
            read = lambda p: self._validate_and_read_features(str(p))  # noqa: E731
        progress = tqdm(jobs)
        for job in progress:
            progress.set_description(job.description)
            self._source_precisions.clear()  # provenance is per output file
            if job.output_path.exists():
                _logger.info(
                    f"skipping {job.description} because "
                    f"{job.output_path} already exists"
                )
                continue

            feats_list: list = []
            coords_list: list[CoordsInfo] = []
            for h5_path in job.input_h5s:
                try:
                    feats, coords = read(h5_path)
                except (FileNotFoundError, ValueError, OSError) as e:
                    tqdm.write(f"Skipping {h5_path.name}: {e}")
                    continue
                feats_list.append(feats)
                coords_list.append(coords)

            if not feats_list:
                tqdm.write(
                    f"No usable features for {job.description}, skipping."
                )
                continue

            self._save_features_(
                output_path=job.output_path,
                feats=embed(feats_list, coords_list),
                feat_type=feat_type,
            )

    # -- subclass contract ---------------------------------------------------

    @abstractmethod
    def _generate_slide_embedding(
        self, feats: np.ndarray, device, **kwargs
    ) -> np.ndarray: ...

    @abstractmethod
    def _generate_patient_embedding(
        self, feats_list: list, device, **kwargs
    ) -> np.ndarray: ...

    # -- shared building blocks (also used by subclass overrides) ------------

    def _make_output_dir(
        self, output_dir: Path, kind: str, generate_hash: bool
    ) -> Path:
        """``<output_dir>/<encoder>-<kind>[-<codehash8>]``, created."""
        name = f"{self.identifier}-{kind}"
        if generate_hash:
            name += f"-{get_processing_code_hash(Path(__file__))[:8]}"
        encode_dir = output_dir / name
        os.makedirs(encode_dir, exist_ok=True)
        return encode_dir

    def _validate_and_read_features(
        self, h5_path: str
    ) -> tuple[np.ndarray, CoordsInfo]:
        feats, coords, extractor = self._read_h5(h5_path)
        accepted = {str(e) for e in self.required_extractors}
        if extractor not in accepted:
            raise ValueError(
                f"Features must be extracted with one of "
                f"{self.required_extractors}. Features located in {h5_path} "
                f"are extracted with {extractor}"
            )
        return feats, coords

    def _read_h5(self, h5_path: str) -> tuple[np.ndarray, CoordsInfo, str]:
        path = Path(h5_path)
        if not path.exists():
            raise FileNotFoundError(f"File does not exist: {h5_path}")
        if path.suffix != ".h5":
            raise ValueError(f"File is not of type .h5: {path.name}")
        with h5py.File(path, "r") as f:
            extractor = str(f.attrs.get("extractor", ""))
            if not extractor:
                raise ValueError(
                    "Feature file does not have extractor's name in the "
                    f"metadata: {path.name}"
                )
            # non-default numeric modes of the *extraction* stage (int8)
            # must survive into the encoded output's provenance attrs
            if source_precision := f.attrs.get("precision"):
                self._source_precisions.add(str(source_precision))
            return (
                np.asarray(f["feats"]).astype(np.float32),
                get_coords(f),
                _resolve_extractor_name(extractor),
            )

    def _save_features_(
        self, *, output_path: Path, feats: np.ndarray, feat_type: str
    ) -> None:
        write_pooled_feats_atomic(
            output_path=output_path,
            feats=feats,
            encoder_id=str(self.identifier),
            precision=self.precision,
            feat_type=feat_type,
            code_hash=get_processing_code_hash(Path(__file__))[:8],
            source_precision=(
                ",".join(sorted(self._source_precisions))
                if self._source_precisions
                else None
            ),
        )
        _logger.debug(f"saved features to {output_path}")
