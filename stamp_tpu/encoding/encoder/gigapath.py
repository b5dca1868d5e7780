"""GigaPath slide encoder (LongNetViT).

The reference instantiates ``gigapath.slide_encoder`` ("gigapath_slide_
enc12l768d", input 1536, global_pool=True) and feeds tile features plus
pixel coordinates (reference encoding/encoder/gigapath.py:30-70); patients
are encoded as one x-concatenated virtual slide (gigapath.py:75-160).  The
TPU-native tower is the dilated-attention LongNetViT in
models/slide_encoders.py over ops/dilated_attention.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder
from stamp_tpu.encoding.encoder._flax_params import load_or_init_params
from stamp_tpu.encoding.encoder._virtual_slide import VirtualSlidePatientMixin
from stamp_tpu.models.slide_encoders import (
    LongNetViT,
    convert_gigapath_slide_state_dict,
)
from stamp_tpu.preprocessing.config import ExtractorName


class Gigapath(VirtualSlidePatientMixin, Encoder):
    def __init__(self) -> None:
        self.module = LongNetViT()
        self.variables = load_or_init_params(
            self.module,
            (jnp.zeros((4, 1536)), jnp.zeros((4, 2))),
            name="gigapath-slide",
            weight_files=["slide_encoder.pth", "*gigapath*slide*.pth"],
            convert=lambda sd: convert_gigapath_slide_state_dict(
                sd, depth=self.module.depth
            ),
        )
        # tile counts vary per slide — pad to the next power of two so the
        # dilated-attention kernel compiles once per bucket, not per slide
        self._forward = jax.jit(self.module.apply)
        super().__init__(
            identifier=EncoderName.GIGAPATH,
            precision="torch.float16",
            required_extractors=[ExtractorName.GIGAPATH],
        )

    def _generate_slide_embedding(self, feats, device, coords=None, **kwargs):
        if coords is None:
            raise ValueError("Tile coords are required for encoding")
        # µm → px → tile-grid units (position-embedding step = one tile)
        coords_px = np.asarray(coords.coords_um, np.float64) / coords.mpp
        grid = coords_px / float(coords.tile_size_px)
        out = self._forward(
            self.variables,
            jnp.asarray(feats, jnp.float32),
            jnp.asarray(grid, jnp.float32),
        )
        return np.asarray(out, np.float32)

    def _generate_patient_embedding(self, feats_list, device, **kwargs):
        raise RuntimeError(
            "GigaPath patients are encoded via the virtual-slide path"
        )  # pragma: no cover — encode_patients_ is overridden by the mixin
