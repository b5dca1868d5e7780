"""CoCa vision branch for the CONCH extractors.

CONCH is a CoCa model; STAMP uses only its image path,
``encode_image(batch, proj_contrast=False, normalize=False)`` (reference
extractor/conch.py:23-41): an open_clip VisionTransformer trunk followed by
a single-query attentional pooler, *without* the contrastive projection.
CONCH v1.5 is TITAN's ``return_conch()`` vision tower (reference
extractor/conch1_5.py:13-18) — the same shape scaled to ViT-L with a 768-d
pooled output.

Implemented TPU-first on the shared ImageViT block; the parameter tree is
flat and explicitly named for 1:1 weight porting from the upstream (gated)
checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from stamp_tpu.models.vit_image import _Block, ViTConfig


@dataclass(frozen=True)
class CoCaVisionConfig:
    img_size: int = 448
    patch_size: int = 16
    width: int = 768  # trunk embedding dim
    depth: int = 12
    num_heads: int = 12
    pooled_dim: int = 512  # attentional-pooler output (= CONCH feature dim)
    pool_heads: int = 8
    norm_eps: float = 1e-5
    mean: tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    std: tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)


COCA_CONFIGS: dict[str, CoCaVisionConfig] = {
    # CONCH v1.0: CoCa ViT-B/16 at 448px, pooled contrastive width 512
    "conch": CoCaVisionConfig(),
    # CONCH v1.5 (TITAN's tile encoder): ViT-L/16 at 448px, pooled width 768
    "conch1_5": CoCaVisionConfig(
        width=1024, depth=24, num_heads=16, pooled_dim=768
    ),
}


class _AttentionalPooler(nn.Module):
    """Single-query multi-head cross-attention pooling (CoCa's contrastive
    pooler): a learned query attends over the trunk's token sequence."""

    dim: int  # output (query) dim
    context_dim: int  # trunk token dim
    num_heads: int

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:  # [B, N, C] -> [B, dim]
        b, n, _ = tokens.shape
        head_dim = self.dim // self.num_heads

        query = self.param("query", nn.initializers.normal(0.02), (1, self.dim))
        q = nn.Dense(self.dim, name="q")(query)  # [1, dim]
        k = nn.Dense(self.dim, name="k")(tokens)  # [B, N, dim]
        v = nn.Dense(self.dim, name="v")(tokens)

        q = q.reshape(1, self.num_heads, 1, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            jnp.broadcast_to(q, (b, *q.shape[1:])) * head_dim**-0.5,
            k,
            preferred_element_type=jnp.float32,
        )
        weights = jax.nn.softmax(logits, axis=-1).astype(tokens.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class CoCaVisionTower(nn.Module):
    """Trunk ViT + attentional pooling; returns the unprojected pooled
    embedding (``proj_contrast=False`` semantics)."""

    cfg: CoCaVisionConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        b = images.shape[0]

        x = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
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

        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_pre")(x)
        block_cfg = ViTConfig(
            embed_dim=cfg.width,
            num_heads=cfg.num_heads,
            mlp_ratio=4.0,
            norm_eps=cfg.norm_eps,
        )
        for i in range(cfg.depth):
            x = _Block(block_cfg, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_post")(x)

        pooled = _AttentionalPooler(
            cfg.pooled_dim, cfg.width, cfg.pool_heads, name="attn_pool"
        )(x)
        return nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_contrast")(pooled)
