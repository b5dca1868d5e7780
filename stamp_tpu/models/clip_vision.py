"""CLIP vision tower (for PLIP and related CLIP-style extractors).

OpenAI-CLIP architecture as shipped by HF ``CLIPVisionModel``
(reference extractor/plip.py uses ``CLIPModel.get_image_features``):
bias-free conv patchify, class embedding, learned position embeddings,
pre-LayerNorm, encoder blocks with quick-GELU MLPs, post-LayerNorm on the
CLS token, then the ``visual_projection`` to the shared embedding space.

``convert_clip_vision_state_dict`` maps HF checkpoint tensors onto the flax
tree.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from stamp_tpu.models.vit_image import QuantDense
import numpy as np


@dataclass(frozen=True)
class CLIPVisionConfig:
    img_size: int = 224
    patch_size: int = 32
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    projection_dim: int = 512
    norm_eps: float = 1e-5
    mean: tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    std: tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)
    # QuantDense mode of the block matmuls: "off" | "observe" | "int8"
    quant: str = "off"


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _CLIPBlock(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm1")(x)
        b, n, d = h.shape
        head_dim = cfg.embed_dim // cfg.num_heads
        q = QuantDense(cfg.embed_dim, mode=cfg.quant, name="q")(h)
        k = QuantDense(cfg.embed_dim, mode=cfg.quant, name="k")(h)
        v = QuantDense(cfg.embed_dim, mode=cfg.quant, name="v")(h)

        def heads(t):
            return t.reshape(b, n, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q * head_dim**-0.5,
            k,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(h.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + QuantDense(cfg.embed_dim, mode=cfg.quant, name="out")(out)

        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x)
        h = QuantDense(cfg.mlp_dim, mode=cfg.quant, name="fc1")(h)
        h = _quick_gelu(h)
        h = QuantDense(cfg.embed_dim, mode=cfg.quant, name="fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] normalized → image features [B, projection_dim]."""
        cfg = self.cfg
        b = images.shape[0]

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            name="patch_embed",
        )(images)
        x = x.reshape(b, -1, cfg.embed_dim)
        n = x.shape[1]

        cls = self.param("class_embedding", nn.initializers.zeros, (cfg.embed_dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (n + 1, cfg.embed_dim)
        )
        x = x + pos[None]

        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="pre_norm")(x)
        for i in range(cfg.depth):
            x = _CLIPBlock(cfg, name=f"block_{i}")(x)

        pooled = nn.LayerNorm(epsilon=cfg.norm_eps, name="post_norm")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, name="projection")(pooled)


def convert_clip_vision_state_dict(
    sd: dict[str, np.ndarray], cfg: CLIPVisionConfig
) -> dict:
    """Map an HF CLIPModel state dict (vision tower + visual_projection)."""

    def t(name: str) -> np.ndarray:
        return np.asarray(sd[name])

    vm = "vision_model."
    params: dict = {
        "patch_embed": {
            "kernel": t(vm + "embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)
        },
        "class_embedding": t(vm + "embeddings.class_embedding"),
        "pos_embed": t(vm + "embeddings.position_embedding.weight"),
        "pre_norm": {
            "scale": t(vm + "pre_layrnorm.weight"),
            "bias": t(vm + "pre_layrnorm.bias"),
        },
        "post_norm": {
            "scale": t(vm + "post_layernorm.weight"),
            "bias": t(vm + "post_layernorm.bias"),
        },
        "projection": {"kernel": t("visual_projection.weight").T},
    }
    for i in range(cfg.depth):
        p = f"{vm}encoder.layers.{i}."
        params[f"block_{i}"] = {
            "norm1": {
                "scale": t(p + "layer_norm1.weight"),
                "bias": t(p + "layer_norm1.bias"),
            },
            "norm2": {
                "scale": t(p + "layer_norm2.weight"),
                "bias": t(p + "layer_norm2.bias"),
            },
            "q": {
                "kernel": t(p + "self_attn.q_proj.weight").T,
                "bias": t(p + "self_attn.q_proj.bias"),
            },
            "k": {
                "kernel": t(p + "self_attn.k_proj.weight").T,
                "bias": t(p + "self_attn.k_proj.bias"),
            },
            "v": {
                "kernel": t(p + "self_attn.v_proj.weight").T,
                "bias": t(p + "self_attn.v_proj.bias"),
            },
            "out": {
                "kernel": t(p + "self_attn.out_proj.weight").T,
                "bias": t(p + "self_attn.out_proj.bias"),
            },
            "fc1": {
                "kernel": t(p + "mlp.fc1.weight").T,
                "bias": t(p + "mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": t(p + "mlp.fc2.weight").T,
                "bias": t(p + "mlp.fc2.bias"),
            },
        }
    return {"params": params}


def clip_quant_sites(depth: int) -> list[tuple[str, ...]]:
    """QuantDense sites of the CLIP tower (the projection head stays bf16)."""
    return [
        (f"block_{i}", name)
        for i in range(depth)
        for name in ("q", "k", "v", "out", "fc1", "fc2")
    ]
