"""Madeleine slide encoder — not yet ported.

Reference: encoding/encoder/madeleine.py (HF-weight wrapper).  Porting requires
the gated upstream weights; scheduled for a later milestone.
"""

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder


class Madeleine(Encoder):
    def __init__(self) -> None:
        raise NotImplementedError(
            "the Madeleine slide encoder is not yet ported to the TPU-native "
            "zoo; use chief/eagle, or encode with the reference implementation."
        )

    def _generate_slide_embedding(self, feats, device, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def _generate_patient_embedding(self, feats_list, device, **kwargs):  # pragma: no cover
        raise NotImplementedError
