"""EAGLE slide encoder: CHIEF attention over CTransPath features selects the
top-25 tiles; their matching Virchow2 features are averaged.

Behavioral port of reference encoding/encoder/eagle.py:28-300 including the
coordinate-alignment permutation fix between the two feature sets.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict, deque
from pathlib import Path

import numpy as np
import pandas as pd
from tqdm import tqdm

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder
from stamp_tpu.encoding.encoder.chief import load_chief_attention_net
from stamp_tpu.preprocessing.config import ExtractorName
from stamp_tpu.types import PandasLabel
from stamp_tpu.utils.cache import get_processing_code_hash

_logger = logging.getLogger("stamp")


def _align_vir2_to_ctp_by_coords(
    ref_coords_um: np.ndarray,
    other_coords_um: np.ndarray,
    other_feats: np.ndarray,
    decimals: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Permute virchow2 features so their coords line up with the ctranspath
    coords (reference eagle.py:267-300)."""
    ref = np.round(np.asarray(ref_coords_um, dtype=np.float64), decimals)
    oth = np.round(np.asarray(other_coords_um, dtype=np.float64), decimals)

    buckets: dict = defaultdict(deque)
    for j, key in enumerate(map(tuple, oth)):
        buckets[key].append(j)

    perm = np.empty(ref.shape[0], dtype=np.int64)
    for i, key in enumerate(map(tuple, ref)):
        if not buckets[key]:
            raise ValueError(f"Missing coord in other set: {key}")
        perm[i] = buckets[key].popleft()

    unused = sum(len(q) for q in buckets.values())
    if unused != 0:
        raise ValueError(f"virchow2 features contain {unused} extra coords not in ref.")

    return other_feats[perm], other_coords_um[perm]


class Eagle(Encoder):
    def __init__(self) -> None:
        self.net = load_chief_attention_net()
        self.required_agg_extractor = ExtractorName.VIRCHOW2
        super().__init__(
            identifier=EncoderName.EAGLE,
            precision="torch.float32",
            required_extractors=[
                ExtractorName.CTRANSPATH,
                ExtractorName.CHIEF_CTRANSPATH,
            ],
        )

    def _validate_and_read_features_with_agg(
        self, h5_ctp: str, h5_vir2: str, slide_name: str
    ) -> tuple[np.ndarray, np.ndarray]:
        feats, coords, extractor = self._read_h5(h5_ctp)
        if extractor not in [str(e) for e in self.required_extractors]:
            raise ValueError(
                f"Features must be extracted with one of "
                f"{self.required_extractors}. Features located in {h5_ctp} are "
                f"extracted with {extractor}"
            )

        agg_feats, agg_coords, extractor = self._read_h5(h5_vir2)
        if extractor != str(self.required_agg_extractor):
            raise ValueError(
                f"Aggregated features must be extracted with "
                f"{self.required_agg_extractor}. Features located in {h5_vir2} "
                f"are extracted with {extractor}"
            )

        if not np.allclose(coords.coords_um, agg_coords.coords_um, atol=1e-5, rtol=0):
            try:
                agg_feats, aligned = _align_vir2_to_ctp_by_coords(
                    ref_coords_um=coords.coords_um,
                    other_coords_um=agg_coords.coords_um,
                    other_feats=agg_feats,
                )
                agg_coords.coords_um = aligned
            except ValueError as e:
                raise ValueError(
                    "Coordinates mismatch between ctranspath and virchow2 "
                    f"features for slide {slide_name}. Alignment attempt "
                    f"failed: {e}"
                )

        if not np.allclose(coords.coords_um, agg_coords.coords_um, atol=1e-5, rtol=0):
            raise ValueError(
                "Coordinates mismatch between ctranspath and virchow2 "
                f"features for slide {slide_name}. Ensure that both are aligned."
            )

        return feats, agg_feats

    def _eagle_embedding(
        self, feats: np.ndarray, agg_feats: np.ndarray
    ) -> np.ndarray:
        attn_raw, _pooled = self.net(feats)
        k = min(25, attn_raw.shape[0])
        top_indices = np.argsort(-attn_raw)[:k]
        return agg_feats[top_indices].mean(axis=0).astype(np.float32)

    def _generate_slide_embedding(
        self, feats, device, agg_feats=None, **kwargs
    ) -> np.ndarray:
        if agg_feats is None:
            raise ValueError("agg_feats is required for slide embedding")
        return self._eagle_embedding(feats, agg_feats)

    def _generate_patient_embedding(
        self, feats_list, device, agg_feats_list=None, **kwargs
    ) -> np.ndarray:
        if agg_feats_list is None:
            raise ValueError("agg_feats_list is required for patient embedding")
        feats = np.concatenate(feats_list, axis=0)
        agg_feats = np.concatenate(agg_feats_list, axis=0)
        return self._eagle_embedding(feats, agg_feats)

    def encode_slides_(
        self,
        output_dir: Path,
        feat_dir: Path,
        device: str = "auto",
        generate_hash: bool = True,
        **kwargs,
    ) -> None:
        agg_feat_dir: Path | None = kwargs.get("agg_feat_dir")
        if not agg_feat_dir:
            raise ValueError(
                "agg_feat_dir that contains virchow2 features is required for "
                "Eagle's encode_slides"
            )

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
            slide_name = h5_path.stem
            progress.set_description(slide_name)

            relative_path = h5_path.relative_to(feat_dir)
            output_path = (encode_dir / relative_path).with_suffix(".h5")
            if output_path.exists():
                _logger.info(
                    f"skipping {slide_name} because {output_path} already exists"
                )
                continue

            h5_vir2 = Path(agg_feat_dir) / relative_path
            try:
                feats, agg_feats = self._validate_and_read_features_with_agg(
                    str(h5_path), str(h5_vir2), slide_name
                )
            except (FileNotFoundError, ValueError) as e:
                tqdm.write(str(e))
                continue

            slide_embedding = self._generate_slide_embedding(feats, device, agg_feats)
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
        agg_feat_dir: Path | None = kwargs.get("agg_feat_dir")
        if not agg_feat_dir:
            raise ValueError(
                "agg_feat_dir that contains virchow2 features is required for "
                "Eagle's encode_patients"
            )

        slide_table = pd.read_csv(slide_table_path)
        patient_groups = slide_table.groupby(patient_label)

        if generate_hash:
            encode_dir_name = (
                f"{self.identifier}-pat-{get_processing_code_hash(Path(__file__))[:8]}"
            )
        else:
            encode_dir_name = f"{self.identifier}-pat"
        encode_dir = output_dir / encode_dir_name
        os.makedirs(encode_dir, exist_ok=True)

        for patient_id, group in (progress := tqdm(patient_groups)):
            progress.set_description(str(patient_id))

            output_path = (encode_dir / str(patient_id)).with_suffix(".h5")
            if output_path.exists():
                _logger.info(
                    f"skipping {patient_id} because {output_path} already exists"
                )
                continue

            feats_list = []
            agg_feats_list = []
            for _, row in group.iterrows():
                slide_filename = row[filename_label]
                slide_name = Path(slide_filename).stem
                h5_ctp = os.path.join(feat_dir, slide_filename)
                h5_vir2 = os.path.join(str(agg_feat_dir), slide_filename)
                try:
                    feats, agg_feats = self._validate_and_read_features_with_agg(
                        h5_ctp, h5_vir2, slide_name
                    )
                except (FileNotFoundError, ValueError) as e:
                    tqdm.write(
                        f"[{patient_id}] skip slide: {slide_name} -> {e}"
                    )
                    continue
                feats_list.append(feats)
                agg_feats_list.append(agg_feats)

            if not feats_list:
                tqdm.write(f"No ctranspath features for patient {patient_id}")
                continue

            patient_embedding = self._generate_patient_embedding(
                feats_list, device, agg_feats_list
            )
            self._save_features_(
                output_path=output_path, feats=patient_embedding, feat_type="patient"
            )
