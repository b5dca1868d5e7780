"""TITAN slide encoder — not yet ported.

The reference wraps HF ``MahmoodLab/TITAN`` (reference encoding/encoder/
titan.py:1-179): a ViT over tile features with patch coordinates, plus the
virtual-slide x-offset concatenation trick for patients.  Porting requires
the gated HF weights; scheduled for a later milestone.
"""

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder


class Titan(Encoder):
    def __init__(self) -> None:
        raise NotImplementedError(
            "the TITAN slide encoder is not yet ported to the TPU-native zoo "
            "(gated HF weights + CoCa-style architecture); use chief/eagle, "
            "or encode with the reference implementation."
        )

    def _generate_slide_embedding(self, feats, device, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def _generate_patient_embedding(self, feats_list, device, **kwargs):  # pragma: no cover
        raise NotImplementedError
