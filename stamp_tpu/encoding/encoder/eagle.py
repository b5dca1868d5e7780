"""EAGLE slide encoder.

Behavioral parity with reference encoding/encoder/eagle.py:28-300: CHIEF
gated attention scores the CTransPath features of a slide, the 25
highest-attention tiles are selected, and the Virchow2 features of those
same tiles are averaged into the slide embedding.  Because the two feature
sets come from separate extraction runs, their tile order may differ; rows
are re-paired by µm coordinate before pooling (the reference's alignment
fix, eagle.py:267-300).

Own shape: both encoding modes run through the base class's shared
``_run_jobs`` worklist with a *paired reader* that resolves the Virchow2
counterpart of every CTransPath file, so EAGLE adds only the dual-input
reading and the top-k pooling — not a second copy of the slide/patient
orchestration.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder, _EncodeJob
from stamp_tpu.encoding.encoder.chief import load_chief_attention_net
from stamp_tpu.io.h5 import CoordsInfo
from stamp_tpu.modeling.data import read_table
from stamp_tpu.preprocessing.config import ExtractorName
from stamp_tpu.types import PandasLabel

_TOP_K = 25  # tiles kept per slide (reference eagle.py:108)


def _repair_row_order(
    ref_um: np.ndarray,
    other_um: np.ndarray,
    other_feats: np.ndarray,
    context: str,
) -> np.ndarray:
    """Reorder ``other_feats`` so row i sits at the same µm coordinate as
    row i of the reference set.

    Coordinates are rounded to 5 decimals and matched exactly; equal
    multisets are required (every reference tile must have exactly one
    partner).  Duplicated coordinates pair up positionally within their
    group — any pairing of identical coordinates is equally valid.
    """
    ref = np.round(np.asarray(ref_um, np.float64), 5)
    oth = np.round(np.asarray(other_um, np.float64), 5)
    if ref.shape == oth.shape and np.array_equal(ref, oth):
        return other_feats

    by_ref = np.lexsort(ref.T)
    by_oth = np.lexsort(oth.T)
    if ref.shape != oth.shape or not np.array_equal(ref[by_ref], oth[by_oth]):
        raise ValueError(
            f"Coordinates mismatch between ctranspath and virchow2 features "
            f"for slide {context}: the tile sets differ, not just their order."
        )
    # by_oth[j] is the partner of by_ref[j]; invert to reference row order
    perm = np.empty(len(ref), dtype=np.int64)
    perm[by_ref] = by_oth
    return other_feats[perm]


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

    # -- pooling -------------------------------------------------------------

    def _eagle_embedding(
        self, ctp_feats: np.ndarray, vir2_feats: np.ndarray
    ) -> np.ndarray:
        attn, _pooled = self.net(ctp_feats)
        k = min(_TOP_K, attn.shape[0])
        keep = np.argpartition(attn, -k)[-k:]  # top-k by CHIEF attention
        return vir2_feats[keep].mean(axis=0).astype(np.float32)

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
        return self._eagle_embedding(
            np.concatenate(feats_list, axis=0),
            np.concatenate(agg_feats_list, axis=0),
        )

    # -- dual-feature-dir reading --------------------------------------------

    def _paired_reader(self, feat_dir: Path, agg_feat_dir: Path):
        """Reader for ``_run_jobs``: a CTransPath h5 path yields the
        validated (ctp, vir2) feature pair, vir2 rows re-paired by µm
        coordinate."""

        def read(h5_ctp: Path) -> tuple[tuple[np.ndarray, np.ndarray], CoordsInfo]:
            ctp_feats, coords = self._validate_and_read_features(str(h5_ctp))
            vir2_path = Path(agg_feat_dir) / Path(h5_ctp).relative_to(feat_dir)
            vir2_feats, vir2_coords, vir2_extractor = self._read_h5(str(vir2_path))
            if vir2_extractor != str(self.required_agg_extractor):
                raise ValueError(
                    f"Aggregated features must be extracted with "
                    f"{self.required_agg_extractor}; {vir2_path} was extracted "
                    f"with {vir2_extractor}"
                )
            vir2_feats = _repair_row_order(
                coords.coords_um,
                vir2_coords.coords_um,
                vir2_feats,
                Path(h5_ctp).stem,
            )
            return (ctp_feats, vir2_feats), coords

        return read

    @staticmethod
    def _agg_dir_from(kwargs) -> Path:
        agg_feat_dir = kwargs.get("agg_feat_dir")
        if not agg_feat_dir:
            raise ValueError(
                "agg_feat_dir that contains virchow2 features is required for "
                "Eagle"
            )
        return Path(agg_feat_dir)

    # -- entry points (same worklist loop as the base, paired inputs) --------

    def encode_slides_(
        self,
        *,
        output_dir: Path,
        feat_dir: Path,
        device: str = "auto",
        generate_hash: bool = True,
        **kwargs,
    ) -> None:
        agg_feat_dir = self._agg_dir_from(kwargs)
        encode_dir = self._make_output_dir(output_dir, "slide", generate_hash)
        jobs = [
            _EncodeJob(
                h5_path.stem,
                (encode_dir / h5_path.relative_to(feat_dir)).with_suffix(".h5"),
                (h5_path,),
            )
            for h5_path in sorted(feat_dir.rglob("*.h5"))
        ]

        def embed(pairs: list, coords_list) -> np.ndarray:
            ctp_feats, vir2_feats = pairs[0]
            return self._eagle_embedding(ctp_feats, vir2_feats)

        self._run_jobs(
            jobs,
            embed,
            feat_type="slide",
            read=self._paired_reader(feat_dir, agg_feat_dir),
        )

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
        agg_feat_dir = self._agg_dir_from(kwargs)
        encode_dir = self._make_output_dir(output_dir, "pat", generate_hash)
        slide_table = read_table(slide_table_path)
        jobs = [
            _EncodeJob(
                str(patient_id),
                (encode_dir / str(patient_id)).with_suffix(".h5"),
                tuple(Path(feat_dir) / fname for fname in group[filename_label]),
            )
            for patient_id, group in slide_table.groupby(patient_label)
        ]

        def embed(pairs: list, coords_list) -> np.ndarray:
            return self._eagle_embedding(
                np.concatenate([ctp for ctp, _ in pairs], axis=0),
                np.concatenate([vir2 for _, vir2 in pairs], axis=0),
            )

        self._run_jobs(
            jobs,
            embed,
            feat_type="patient",
            read=self._paired_reader(feat_dir, agg_feat_dir),
        )
