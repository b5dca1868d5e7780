"""PRISM slide encoder (Perceiver resampler).

The reference wraps HF ``paige-ai/Prism`` and reads the
``image_embedding`` from ``model.slide_representations(feats)`` (reference
encoding/encoder/prism.py:27-47), over Virchow-full 2560-d tile features.
The TPU-native tower is the Perceiver in models/slide_encoders.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder
from stamp_tpu.encoding.encoder._flax_params import load_or_init_params
from stamp_tpu.models.slide_encoders import (
    PrismPerceiver,
    convert_prism_state_dict,
)
from stamp_tpu.preprocessing.config import ExtractorName


class Prism(Encoder):
    def __init__(self) -> None:
        self.module = PrismPerceiver()
        self.variables = load_or_init_params(
            self.module,
            (jnp.zeros((4, 2560)),),
            name="prism",
            weight_files=["*prism*.bin", "*Prism*.safetensors"],
            convert=lambda sd: convert_prism_state_dict(
                sd, depth=self.module.depth
            ),
        )
        self._forward = jax.jit(self.module.apply)
        super().__init__(
            identifier=EncoderName.PRISM,
            precision="torch.float16",
            required_extractors=[ExtractorName.VIRCHOW_FULL],
        )

    def _generate_slide_embedding(self, feats, device, **kwargs) -> np.ndarray:
        out = self._forward(self.variables, jnp.asarray(feats, jnp.float32))
        return np.asarray(out, np.float32)

    def _generate_patient_embedding(self, feats_list, device, **kwargs) -> np.ndarray:
        all_feats = np.concatenate(feats_list, axis=0)
        return self._generate_slide_embedding(all_feats, device)
