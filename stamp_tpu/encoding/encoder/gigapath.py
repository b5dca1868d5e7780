"""GigaPath slide encoder (LongNet) — not yet ported.

Reference: encoding/encoder/gigapath.py (prov-gigapath ``slide_encoder``, a
12-layer 768-d LongNet over tile features conditioned on coordinates).
Porting requires the dilated-attention stack + gated weights; scheduled.
"""

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder


class Gigapath(Encoder):
    def __init__(self) -> None:
        raise NotImplementedError(
            "the GigaPath (LongNet) slide encoder is not yet ported to the "
            "TPU-native zoo; use chief/eagle, or encode with the reference "
            "implementation."
        )

    def _generate_slide_embedding(self, feats, device, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def _generate_patient_embedding(self, feats_list, device, **kwargs):  # pragma: no cover
        raise NotImplementedError
