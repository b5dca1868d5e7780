"""Slide/patient encoder abstraction.

Behavioral parity with the reference Encoder base
(src/stamp/encoding/encoder/__init__.py:29-250): template methods with
skip-if-exists idempotency, hash-named output directories, input validation
of the required tile extractor (with hash-suffix stripping), and atomic h5
writes carrying {encoder, precision, feat_type} attrs.
"""

from __future__ import annotations

import logging
import os
import re
from abc import ABC, abstractmethod
from pathlib import Path

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

    def encode_slides_(
        self,
        output_dir: Path,
        feat_dir: Path,
        device: str = "auto",
        generate_hash: bool = True,
        **kwargs,
    ) -> None:
        """Encode every tile-feature h5 under ``feat_dir`` into one
        slide-level feature file."""
        if generate_hash:
            encode_dir_name = (
                f"{self.identifier}-slide-"
                f"{get_processing_code_hash(Path(__file__))[:8]}"
            )
        else:
            encode_dir_name = f"{self.identifier}-slide"
        encode_dir = output_dir / encode_dir_name
        os.makedirs(encode_dir, exist_ok=True)

        h5_files = [p for p in feat_dir.rglob("*.h5")]
        for h5_path in (progress := tqdm(h5_files)):
            slide_name: str = h5_path.stem
            progress.set_description(slide_name)

            relative_path = h5_path.relative_to(feat_dir)
            output_path = (encode_dir / relative_path).with_suffix(".h5")
            if output_path.exists():
                _logger.info(
                    f"skipping {slide_name} because {output_path} already exists"
                )
                continue

            try:
                feats, coords = self._validate_and_read_features(str(h5_path))
            except ValueError as e:
                tqdm.write(str(e))
                continue

            slide_embedding = self._generate_slide_embedding(
                feats, device, coords=coords
            )
            self._save_features_(
                output_path=output_path, feats=slide_embedding, feat_type="slide"
            )

    def encode_patients_(
        self,
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
        if generate_hash:
            encode_dir_name = (
                f"{self.identifier}-pat-{get_processing_code_hash(Path(__file__))[:8]}"
            )
        else:
            encode_dir_name = f"{self.identifier}-pat"
        encode_dir = output_dir / encode_dir_name
        os.makedirs(encode_dir, exist_ok=True)

        slide_table = read_table(slide_table_path)
        patient_groups = slide_table.groupby(patient_label)

        for patient_id, group in (progress := tqdm(patient_groups)):
            progress.set_description(str(patient_id))

            output_path = (encode_dir / str(patient_id)).with_suffix(".h5")
            if output_path.exists():
                _logger.info(
                    f"skipping {patient_id} because {output_path} already exists"
                )
                continue

            feats_list = []
            for _, row in group.iterrows():
                slide_filename = row[filename_label]
                h5_path = os.path.join(feat_dir, slide_filename)
                try:
                    feats, _coords = self._validate_and_read_features(h5_path)
                except (FileNotFoundError, ValueError, OSError) as e:
                    tqdm.write(f"Skipping {slide_filename}: {e}")
                    continue
                feats_list.append(feats)

            if not feats_list:
                tqdm.write(f"No features found for patient {patient_id}, skipping.")
                continue

            patient_embedding = self._generate_patient_embedding(
                feats_list, device, **kwargs
            )
            self._save_features_(
                output_path=output_path, feats=patient_embedding, feat_type="patient"
            )

    @abstractmethod
    def _generate_slide_embedding(
        self, feats: np.ndarray, device, **kwargs
    ) -> np.ndarray: ...

    @abstractmethod
    def _generate_patient_embedding(
        self, feats_list: list, device, **kwargs
    ) -> np.ndarray: ...

    def _validate_and_read_features(
        self, h5_path: str
    ) -> tuple[np.ndarray, CoordsInfo]:
        feats, coords, extractor = self._read_h5(h5_path)
        if extractor not in [str(e) for e in self.required_extractors]:
            raise ValueError(
                f"Features must be extracted with one of "
                f"{self.required_extractors}. Features located in {h5_path} "
                f"are extracted with {extractor}"
            )
        return feats, coords

    def _read_h5(self, h5_path: str) -> tuple[np.ndarray, CoordsInfo, str]:
        if not os.path.exists(h5_path):
            raise FileNotFoundError(f"File does not exist: {h5_path}")
        elif not h5_path.endswith(".h5"):
            raise ValueError(f"File is not of type .h5: {os.path.basename(h5_path)}")
        with h5py.File(h5_path, "r") as f:
            feats = np.asarray(f["feats"]).astype(np.float32)
            coords = get_coords(f)
            extractor = str(f.attrs.get("extractor", ""))
            if extractor == "":
                raise ValueError(
                    "Feature file does not have extractor's name in the "
                    f"metadata: {os.path.basename(h5_path)}"
                )
            return feats, coords, _resolve_extractor_name(extractor)

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
        )
        _logger.debug(f"saved features to {output_path}")


_HASH_RE = re.compile(r"^[0-9a-fA-F]{6,}$")


def _resolve_extractor_name(name: str) -> str:
    """Strip a trailing code-hash suffix from an extractor id
    (reference encoder/__init__.py:235-250)."""
    if not name:
        raise ValueError("Empty extractor name")
    name = str(name).strip()
    if "-" not in name:
        return name
    base, suffix = name.rsplit("-", 1)
    if _HASH_RE.match(suffix):
        return base
    return name
