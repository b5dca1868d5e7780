"""TICON tile-contextualizer encoder.

JAX port of the architecture the reference vendors from
cvlab-stonybrook/TICON (reference extractor/ticon.py:102-741): a per-source
input-projection MLP feeding a 6-block, 1536-d, 24-head transformer whose
attention adds the classic ALiBi bias ``−slope_h · euclid_dist(coords)`` to
the logits *before* the softmax (ticon.py:120-215 — note this differs from
the MIL ViT's post-softmax variant), SiLU-gated MLPs (hidden 16/3·d, packed
halves), LayerScale residuals, and a final encoder norm.

The stamp extractor composes H-Optimus-1 tile features with this encoder
using the ``hoptimus1`` input projection and zero relative coordinates
(ticon.py:624-718).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from stamp_tpu.models.vit_image import QuantDense
import numpy as np


def get_slopes(n: int) -> list[float]:
    """ALiBi head slopes (Press et al., 2021)."""

    def power_of_2(n: int) -> list[float]:
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(n).is_integer():
        return power_of_2(n)
    closest = 2 ** math.floor(math.log2(n))
    return power_of_2(closest) + get_slopes(2 * closest)[0::2][: n - closest]


class _TiconAttention(nn.Module):
    dim: int
    num_heads: int
    quant: str = "off"

    @nn.compact
    def __call__(
        self, x: jax.Array, coords: jax.Array
    ) -> jax.Array:  # x: [B, N, D], coords: [B, N, 2]
        b, n, d = x.shape
        h = self.num_heads
        head_dim = d // h

        q = QuantDense(d, mode=self.quant, name="q_proj")(x)
        k = QuantDense(d, mode=self.quant, name="k_proj")(x)
        v = QuantDense(d, mode=self.quant, name="v_proj")(x)

        def heads(t):
            return t.reshape(b, n, h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        diff = coords[:, :, None, :] - coords[:, None, :, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))  # [B,N,N]
        slopes = jnp.asarray(get_slopes(h), dtype=x.dtype)  # [H]
        attn_bias = -slopes[None, :, None, None] * dist[:, None, :, :]

        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            / math.sqrt(head_dim)
        )
        logits = logits + attn_bias.astype(logits.dtype)
        weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return QuantDense(d, mode=self.quant, name="proj")(out)


class _TiconMlp(nn.Module):
    """fc1 → chunk(2) → silu(x1)·x2 → fc2 with mlp_ratio 16/3
    (ticon.py:53-77)."""

    dim: int
    quant: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.dim * 16 / 3)
        x12 = QuantDense(hidden, mode=self.quant, name="fc1")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return QuantDense(self.dim, mode=self.quant, name="fc2")(nn.silu(x1) * x2)


class _TiconBlock(nn.Module):
    dim: int
    num_heads: int
    quant: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array, coords: jax.Array) -> jax.Array:
        gamma1 = self.param("gamma1", nn.initializers.ones, (self.dim,))
        gamma2 = self.param("gamma2", nn.initializers.ones, (self.dim,))
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + gamma1 * _TiconAttention(
            self.dim, self.num_heads, self.quant, name="attn"
        )(h, coords)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + gamma2 * _TiconMlp(self.dim, self.quant, name="mlp")(h)


class _ProjectionMlp(nn.Module):
    """fc1 → silu → fc2 → LayerNorm (ticon.py:80-100)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.out, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class TiconEncoder(nn.Module):
    """input_proj → 6 ALiBi blocks → enc_norm (reference out_layer = last)."""

    embed_dim: int = 1536
    depth: int = 6
    num_heads: int = 24
    in_dim: int = 1536  # hoptimus1 features
    quant: str = "off"  # QuantDense mode of the block matmuls

    @nn.compact
    def __call__(self, feats: jax.Array, coords: jax.Array) -> jax.Array:
        x = _ProjectionMlp(self.embed_dim, self.embed_dim, name="input_proj")(feats)
        for i in range(self.depth):
            x = _TiconBlock(
                self.embed_dim, self.num_heads, self.quant, name=f"block_{i}"
            )(x, coords)
        return nn.LayerNorm(epsilon=1e-5, name="enc_norm")(x)


def convert_ticon_state_dict(
    sd: dict[str, np.ndarray], *, tile_encoder_key: str = "hoptimus1", depth: int = 6
) -> dict:
    """Map the TICON backbone checkpoint (``backbone.`` prefix stripped)."""

    def t(name: str) -> np.ndarray:
        return np.asarray(sd[name])

    ip = f"input_proj_dict.input_proj_{tile_encoder_key}."
    params: dict = {
        "input_proj": {
            "fc1": {"kernel": t(ip + "fc1.weight").T, "bias": t(ip + "fc1.bias")},
            "fc2": {"kernel": t(ip + "fc2.weight").T, "bias": t(ip + "fc2.bias")},
            "norm": {"scale": t(ip + "norm.weight"), "bias": t(ip + "norm.bias")},
        },
        "enc_norm": {"scale": t("enc_norm.weight"), "bias": t("enc_norm.bias")},
    }
    for i in range(depth):
        p = f"encoder.blocks.{i}."
        params[f"block_{i}"] = {
            "gamma1": t(p + "residual1.gamma"),
            "gamma2": t(p + "residual2.gamma"),
            "norm1": {
                "scale": t(p + "residual1.norm.weight"),
                "bias": t(p + "residual1.norm.bias"),
            },
            "norm2": {
                "scale": t(p + "residual2.norm.weight"),
                "bias": t(p + "residual2.norm.bias"),
            },
            "attn": {
                "q_proj": {
                    "kernel": t(p + "residual1.fn.q_proj.weight").T,
                    "bias": t(p + "residual1.fn.q_proj.bias"),
                },
                "k_proj": {
                    "kernel": t(p + "residual1.fn.k_proj.weight").T,
                    "bias": t(p + "residual1.fn.k_proj.bias"),
                },
                "v_proj": {
                    "kernel": t(p + "residual1.fn.v_proj.weight").T,
                    "bias": t(p + "residual1.fn.v_proj.bias"),
                },
                "proj": {
                    "kernel": t(p + "residual1.fn.proj.weight").T,
                    "bias": t(p + "residual1.fn.proj.bias"),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": t(p + "residual2.fn.fc1.weight").T,
                    "bias": t(p + "residual2.fn.fc1.bias"),
                },
                "fc2": {
                    "kernel": t(p + "residual2.fn.fc2.weight").T,
                    "bias": t(p + "residual2.fn.fc2.bias"),
                },
            },
        }
    return {"params": params}


def ticon_quant_sites(depth: int) -> list[tuple[str, ...]]:
    """QuantDense sites of the TICON encoder (input projection stays bf16)."""
    sites = []
    for i in range(depth):
        block = f"block_{i}"
        sites += [
            (block, "attn", "q_proj"),
            (block, "attn", "k_proj"),
            (block, "attn", "v_proj"),
            (block, "attn", "proj"),
            (block, "mlp", "fc1"),
            (block, "mlp", "fc2"),
        ]
    return sites
