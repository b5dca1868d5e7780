"""CHIEF slide encoder: CLAM-style gated-attention pooling over
CHIEF-CTransPath tile features.

JAX re-implementation of the model the reference vendors from hms-dbmi/CHIEF
(reference encoding/encoder/chief.py:27-89, 255-275): tile features → Linear
768→512 + ReLU → gated attention (tanh ⊙ sigmoid → Linear→1) → softmax over
tiles → attention-weighted sum of the *raw* features (``WSI_feature``).

Weight port maps the published ``CHIEF_pretraining.pth`` state dict
(Sequential indices: attention_net.0 = Linear, attention_net.3 = gated net).
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.encoding.config import EncoderName
from stamp_tpu.encoding.encoder import Encoder
from stamp_tpu.preprocessing.config import ExtractorName
from stamp_tpu.preprocessing.extractor import _find_torch_weights, _load_torch_state_dict

_logger = logging.getLogger("stamp")


class ChiefAttentionNet:
    """Functional gated-attention net with ported weights (size 'small':
    768 → 512 → 256)."""

    def __init__(self, params: dict[str, np.ndarray]):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)

        @jax.jit
        def _forward(feats: jax.Array) -> tuple[jax.Array, jax.Array]:
            p = self.params
            h = jnp.maximum(feats @ p["fc_w"].T + p["fc_b"], 0.0)  # [N, 512]
            a = jnp.tanh(h @ p["a_w"].T + p["a_b"])  # [N, 256]
            b = jax.nn.sigmoid(h @ p["b_w"].T + p["b_b"])  # [N, 256]
            attn_raw = (a * b) @ p["c_w"].T + p["c_b"]  # [N, 1]
            attn = jax.nn.softmax(attn_raw.T, axis=1)  # [1, N]
            wsi_feature = attn @ feats  # [1, 768] — pooled RAW features
            return attn_raw[:, 0], wsi_feature

        self._forward = _forward

    def __call__(self, feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        attn_raw, wsi_feature = self._forward(jnp.asarray(feats))
        return np.asarray(attn_raw), np.asarray(wsi_feature)


def load_chief_attention_net() -> ChiefAttentionNet:
    if os.environ.get("STAMP_RANDOM_WEIGHTS") == "1":
        _logger.warning("CHIEF: using RANDOM weights (STAMP_RANDOM_WEIGHTS=1)")
        rng = np.random.default_rng(0)
        params = {
            "fc_w": rng.normal(0, 0.02, (512, 768)).astype(np.float32),
            "fc_b": np.zeros(512, np.float32),
            "a_w": rng.normal(0, 0.02, (256, 512)).astype(np.float32),
            "a_b": np.zeros(256, np.float32),
            "b_w": rng.normal(0, 0.02, (256, 512)).astype(np.float32),
            "b_b": np.zeros(256, np.float32),
            "c_w": rng.normal(0, 0.02, (1, 256)).astype(np.float32),
            "c_b": np.zeros(1, np.float32),
        }
        return ChiefAttentionNet(params)

    path = _find_torch_weights(["CHIEF_pretraining.pth", "*CHIEF*.pth"])
    if path is None:
        raise FileNotFoundError(
            "CHIEF weights not found. Pre-seed CHIEF_pretraining.pth into "
            "~/.cache/stamp or set STAMP_WEIGHTS_DIR "
            "(set STAMP_RANDOM_WEIGHTS=1 for smoke testing)."
        )
    sd = _load_torch_state_dict(path)
    return ChiefAttentionNet(convert_chief_state_dict(sd))


def convert_chief_state_dict(sd: dict) -> dict:
    """Map the CHIEF_pretraining checkpoint's WSI gated-attention net (CLAM
    layout under ``attention_net``: Linear stem, gated attention a/b/c) onto
    the flat param dict ``ChiefAttentionNet`` consumes."""
    return {
        "fc_w": np.asarray(sd["attention_net.0.weight"]),
        "fc_b": np.asarray(sd["attention_net.0.bias"]),
        "a_w": np.asarray(sd["attention_net.3.attention_a.0.weight"]),
        "a_b": np.asarray(sd["attention_net.3.attention_a.0.bias"]),
        "b_w": np.asarray(sd["attention_net.3.attention_b.0.weight"]),
        "b_b": np.asarray(sd["attention_net.3.attention_b.0.bias"]),
        "c_w": np.asarray(sd["attention_net.3.attention_c.weight"]),
        "c_b": np.asarray(sd["attention_net.3.attention_c.bias"]),
    }


class CHIEF(Encoder):
    def __init__(self) -> None:
        self.net = load_chief_attention_net()
        super().__init__(
            identifier=EncoderName.CHIEF_CTRANSPATH,
            precision="torch.float32",
            required_extractors=[ExtractorName.CHIEF_CTRANSPATH],
        )

    def _generate_slide_embedding(self, feats, device, **kwargs) -> np.ndarray:
        _attn, wsi_feature = self.net(feats)
        return wsi_feature.squeeze()

    def _generate_patient_embedding(self, feats_list, device, **kwargs) -> np.ndarray:
        all_feats = np.concatenate(feats_list, axis=0)
        _attn, wsi_feature = self.net(all_feats)
        return wsi_feature.squeeze()
