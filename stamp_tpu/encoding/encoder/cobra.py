"""COBRA slide encoder (Mamba2 + gated-attention pooling).

The reference wraps KatherLab's ``get_cobraII`` built on the CUDA
``mamba-ssm`` kernels (reference encoding/encoder/cobra.py:26-64); the
TPU-native tower runs the chunked-SSD Mamba2 mixer from ops/ssd.py inside
models/slide_encoders.py.  The pooled embedding is the attention-weighted
average of the raw tile features, so the output dimension follows the
extractor (CONCH 512 / UNI 1024 / H-Optimus-0 1536 / Virchow2 2560).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder
from stamp_tpu.encoding.encoder._flax_params import load_or_init_params
from stamp_tpu.models.slide_encoders import CobraNet, convert_cobra_state_dict
from stamp_tpu.preprocessing.config import ExtractorName


class Cobra(Encoder):
    def __init__(self) -> None:
        self.module = CobraNet()
        # one init per supported input dim so every embed head materializes
        self._variables_by_dim: dict[int, object] = {}
        self._forward = jax.jit(self.module.apply)
        super().__init__(
            identifier=EncoderName.COBRA,
            precision="torch.float32",
            required_extractors=[
                ExtractorName.CONCH,
                ExtractorName.UNI,
                ExtractorName.VIRCHOW2,
                ExtractorName.H_OPTIMUS_0,
            ],
        )

    def _variables_for(self, d_in: int):
        if d_in not in self._variables_by_dim:
            self._variables_by_dim[d_in] = load_or_init_params(
                self.module,
                (jnp.zeros((8, d_in)),),
                name="cobra",
                weight_files=["*cobra*.pth", "*COBRA*.safetensors"],
                # the converted tree carries every embed.{dim} head found in
                # the checkpoint; flax only reads the head matching d_in
                convert=lambda sd: convert_cobra_state_dict(
                    sd, depth=self.module.depth
                ),
            )
        return self._variables_by_dim[d_in]

    def _generate_slide_embedding(self, feats, device, **kwargs) -> np.ndarray:
        feats = np.asarray(feats, np.float32)
        out = self._forward(self._variables_for(feats.shape[-1]), jnp.asarray(feats))
        return np.asarray(out, np.float32)

    def _generate_patient_embedding(self, feats_list, device, **kwargs) -> np.ndarray:
        all_feats = np.concatenate(feats_list, axis=0)
        return self._generate_slide_embedding(all_feats, device)
