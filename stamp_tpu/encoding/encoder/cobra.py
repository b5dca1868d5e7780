"""COBRA slide encoder (Mamba2) — JAX port lands with the SSM scan kernel.

Reference: encoding/encoder/cobra.py (KatherLab COBRA-II via mamba-ssm CUDA
kernels).  The TPU equivalent needs the Pallas associative-scan SSM kernel
(stamp_tpu/ops — scheduled); until then this raises with guidance.
"""

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder


class Cobra(Encoder):
    def __init__(self) -> None:
        raise NotImplementedError(
            "the COBRA (Mamba2) slide encoder port is pending its TPU "
            "selective-scan kernel; use chief/eagle, or encode with the "
            "reference implementation."
        )

    def _generate_slide_embedding(self, feats, device, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def _generate_patient_embedding(self, feats_list, device, **kwargs):  # pragma: no cover
        raise NotImplementedError
