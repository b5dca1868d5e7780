"""TITAN slide encoder.

The reference wraps HF ``MahmoodLab/TITAN`` and calls
``encode_slide_from_patch_features(feats, coords_px, patch_size_lvl0)``
(reference encoding/encoder/titan.py:28-62); patients are encoded as one
x-concatenated virtual slide (titan.py:93-160).  Here the vision tower is
the TPU-native 2-D-ALiBi ViT in models/slide_encoders.py, consuming
CONCH1.5 tile features on the integer tile grid derived from pixel
coordinates and the level-0 patch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder
from stamp_tpu.encoding.encoder._flax_params import load_or_init_params
from stamp_tpu.encoding.encoder._virtual_slide import VirtualSlidePatientMixin
from stamp_tpu.models.slide_encoders import TitanViT, convert_titan_state_dict
from stamp_tpu.preprocessing.config import ExtractorName


class Titan(VirtualSlidePatientMixin, Encoder):
    def __init__(self) -> None:
        self.module = TitanViT()
        self.variables = load_or_init_params(
            self.module,
            (jnp.zeros((4, 768)), jnp.zeros((4, 2), jnp.int32)),
            name="titan",
            weight_files=["*TITAN*.bin", "*titan*.safetensors", "*TITAN*.pth"],
            convert=lambda sd: convert_titan_state_dict(
                sd, depth=self.module.depth
            ),
        )
        self._forward = jax.jit(self.module.apply)
        super().__init__(
            identifier=EncoderName.TITAN,
            precision="torch.float32",
            required_extractors=[ExtractorName.CONCH1_5],
        )

    def _generate_slide_embedding(self, feats, device, coords=None, **kwargs):
        if coords is None:
            raise ValueError("Coords must be provided.")
        # µm → px → integer tile-grid units (reference titan.py:47-53)
        coords_px = np.asarray(coords.coords_um, np.float64) / coords.mpp
        grid = (coords_px / float(coords.tile_size_px)).astype(np.int64)
        out = self._forward(
            self.variables, jnp.asarray(feats, jnp.float32), jnp.asarray(grid)
        )
        return np.asarray(out, np.float32)

    def _generate_patient_embedding(self, feats_list, device, **kwargs):
        raise RuntimeError(
            "TITAN patients are encoded via the virtual-slide path"
        )  # pragma: no cover — encode_patients_ is overridden by the mixin
