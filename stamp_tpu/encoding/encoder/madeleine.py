"""MADELEINE slide encoder.

The reference wraps mahmoodlab's ``create_model_from_pretrained`` and calls
``model.encode_he(feats)`` over CONCH 512-d tile features (reference
encoding/encoder/madeleine.py:26-60).  The TPU-native tower is the
multi-head gated-attention MIL network in models/slide_encoders.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder
from stamp_tpu.encoding.encoder._flax_params import load_or_init_params
from stamp_tpu.models.slide_encoders import (
    MadeleineNet,
    convert_madeleine_state_dict,
)
from stamp_tpu.preprocessing.config import ExtractorName


class Madeleine(Encoder):
    def __init__(self) -> None:
        self.module = MadeleineNet()
        self.variables = load_or_init_params(
            self.module,
            (jnp.zeros((4, 512)),),
            name="madeleine",
            weight_files=["*madeleine*.pt", "*MADELEINE*.safetensors"],
            convert=convert_madeleine_state_dict,
        )
        self._forward = jax.jit(self.module.apply)
        super().__init__(
            identifier=EncoderName.MADELEINE,
            precision="torch.float32",
            required_extractors=[ExtractorName.CONCH],
        )

    def _generate_slide_embedding(self, feats, device, **kwargs) -> np.ndarray:
        out = self._forward(self.variables, jnp.asarray(feats, jnp.float32))
        return np.asarray(out, np.float32)

    def _generate_patient_embedding(self, feats_list, device, **kwargs) -> np.ndarray:
        all_feats = np.concatenate(feats_list, axis=0)
        return self._generate_slide_embedding(all_feats, device)
