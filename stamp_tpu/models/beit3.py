"""BEiT3 vision branch for the MUSK extractor.

MUSK ("musk_large_patch16_384") is a BEiT3 multiway transformer; STAMP uses
only the vision path, ``model(image=batch, with_head=False, out_norm=False,
ms_aug=True, return_global=True)[0]`` (reference extractor/musk.py:22-58):
a ViT-L/16 at 384px with sub-LayerNorm FFNs, evaluated at two scales and
concatenated (MUSK's ``MultiScaleForward`` with scales=[1, 2]) → 2048-d
tile features.

Implemented TPU-first; the 2× scale runs as an in-graph 768px resize split
into four 384px crops whose CLS embeddings are averaged — the structure of
the upstream multiscale augmentation, with the resize on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Beit3Config:
    img_size: int = 384
    patch_size: int = 16
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    # timm IMAGENET_INCEPTION constants (reference musk.py:46-52)
    mean: tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: tuple[float, float, float] = (0.5, 0.5, 0.5)


class _Beit3Block(nn.Module):
    """Pre-LN block with BEiT3's sub-LayerNorm inside the FFN (the vision
    branch of the multiway FFN — text experts are not instantiated)."""

    cfg: Beit3Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, n, d = x.shape
        head_dim = cfg.width // cfg.num_heads

        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm1")(x)
        q = nn.Dense(cfg.width, name="q")(h)
        k = nn.Dense(cfg.width, use_bias=False, name="k")(h)
        v = nn.Dense(cfg.width, name="v")(h)

        def heads(t):
            return t.reshape(b, n, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            heads(q) * head_dim**-0.5,
            heads(k),
            preferred_element_type=jnp.float32,
        )
        weights = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = nn.LayerNorm(epsilon=cfg.norm_eps, name="inner_attn_ln")(out)
        x = x + nn.Dense(cfg.width, name="proj")(out)

        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x)
        h = nn.Dense(int(cfg.width * cfg.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="ffn_ln")(h)  # sub-LN
        return x + nn.Dense(cfg.width, name="fc2")(h)


class Beit3VisionTower(nn.Module):
    """Single-scale BEiT3 vision forward → CLS embedding [B, width]."""

    cfg: Beit3Config

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        b = images.shape[0]
        x = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
        )(images)
        x = x.reshape(b, -1, cfg.width)
        n = x.shape[1]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.width)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (n + 1, cfg.width)
        )
        x = x + pos[None]

        for i in range(cfg.depth):
            x = _Beit3Block(cfg, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)
        return x[:, 0]


def multiscale_cls(
    module: Beit3VisionTower, variables, images: jax.Array
) -> jax.Array:
    """MUSK's two-scale evaluation: CLS at native 384px ⧺ mean CLS of the
    four 384px crops of a 768px upsample → [B, 2·width]."""
    cfg = module.cfg
    s = cfg.img_size

    cls1 = module.apply(variables, images)

    big = jax.image.resize(
        images, (images.shape[0], 2 * s, 2 * s, 3), method="bilinear"
    )
    crops = [
        big[:, i * s : (i + 1) * s, j * s : (j + 1) * s, :]
        for i in range(2)
        for j in range(2)
    ]
    cls2 = sum(module.apply(variables, crop) for crop in crops) / 4.0
    return jnp.concatenate([cls1, cls2], axis=-1)
