"""CoCa vision branch for the CONCH extractors.

CONCH is a CoCa model; STAMP uses only its image path,
``encode_image(batch, proj_contrast=False, normalize=False)`` (reference
extractor/conch.py:23-41): a timm ViT trunk followed by a single-query
attentional pooler and a final LayerNorm, *without* the contrastive
projection.  CONCH v1.5 is TITAN's ``return_conch()`` vision tower
(reference extractor/conch1_5.py:13-18) — the same shape scaled to ViT-L
with a 768-d pooled output.

Structure mirrors the upstream checkpoint layout (CONCH's
``open_clip_custom`` VisualModel: a timm trunk under ``visual.trunk`` whose
forward_features includes the final norm, then ``visual.attn_pool_contrast``
— an open_clip ``AttentionalPooler`` with ``ln_q``/``ln_k`` and a
``nn.MultiheadAttention`` core with separate q/k/v projections because the
key/value dim (trunk width) differs from the query dim (pooled width) —
then ``visual.ln_contrast``).  ``convert_coca_state_dict`` maps that layout
onto the flax tree 1:1; the mapping is parity-locked against an
independently written torch oracle in tests/test_converter_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

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
    # QuantDense mode of the trunk-block matmuls ("off" | "observe" | "int8");
    # the attentional pooler is a single query — it stays bf16
    quant: str = "off"


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
    pooler, open_clip ``AttentionalPooler`` semantics): a learned query is
    LayerNormed (``ln_q``), the trunk tokens are LayerNormed (``ln_k``), and
    a multi-head attention with separate q/k/v projections (kdim = trunk
    width ≠ query dim) pools the sequence into one vector."""

    dim: int  # output (query) dim
    context_dim: int  # trunk token dim
    num_heads: int
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:  # [B, N, C] -> [B, dim]
        b, n, _ = tokens.shape
        head_dim = self.dim // self.num_heads

        query = self.param("query", nn.initializers.normal(0.02), (1, self.dim))
        q_in = nn.LayerNorm(epsilon=self.norm_eps, name="ln_q")(query)
        kv_in = nn.LayerNorm(epsilon=self.norm_eps, name="ln_k")(tokens)

        q = nn.Dense(self.dim, name="q")(q_in)  # [1, dim]
        k = nn.Dense(self.dim, name="k")(kv_in)  # [B, N, dim]
        v = nn.Dense(self.dim, name="v")(kv_in)

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

        block_cfg = ViTConfig(
            embed_dim=cfg.width,
            num_heads=cfg.num_heads,
            mlp_ratio=4.0,
            norm_eps=cfg.norm_eps,
            quant=cfg.quant,
        )
        for i in range(cfg.depth):
            x = _Block(block_cfg, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)

        pooled = _AttentionalPooler(
            cfg.pooled_dim,
            cfg.width,
            cfg.pool_heads,
            norm_eps=cfg.norm_eps,
            name="attn_pool",
        )(x)
        return nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_contrast")(pooled)


def convert_coca_state_dict(
    state_dict: dict[str, np.ndarray], cfg: CoCaVisionConfig
) -> dict:
    """Map a CONCH/CoCa checkpoint onto the ``CoCaVisionTower`` tree.

    Targets ``visual.trunk.*`` (timm ViT names), ``visual.attn_pool_contrast``
    (open_clip AttentionalPooler: ``query``, ``ln_q``, ``ln_k``, a
    ``nn.MultiheadAttention`` with separate ``q_proj_weight`` /
    ``k_proj_weight`` / ``v_proj_weight`` + packed ``in_proj_bias`` and
    ``out_proj``) and ``visual.ln_contrast``.  A leading ``module.`` and a
    missing ``visual.`` prefix are tolerated; ``attn_pool`` is accepted as an
    alias of ``attn_pool_contrast``.
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in state_dict.items()}

    def t(*names: str) -> np.ndarray:
        for name in names:
            for cand in (f"visual.{name}", name):
                if cand in sd:
                    return sd[cand]
        raise KeyError(f"none of {names} found in checkpoint (visual.* or bare)")

    def ln(*names: str) -> dict:
        return {
            "scale": t(*(f"{n}.weight" for n in names)),
            "bias": t(*(f"{n}.bias" for n in names)),
        }

    params: dict[str, Any] = {}
    w = t("trunk.patch_embed.proj.weight")  # [D, 3, ph, pw]
    params["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": t("trunk.patch_embed.proj.bias"),
    }
    params["cls_token"] = t("trunk.cls_token").reshape(1, 1, cfg.width)
    params["pos_embed"] = t("trunk.pos_embed").reshape(-1, cfg.width)

    for i in range(cfg.depth):
        p = f"trunk.blocks.{i}."
        params[f"block_{i}"] = {
            "norm1": ln(p + "norm1"),
            "norm2": ln(p + "norm2"),
            "attn": {
                "qkv": {
                    "kernel": t(p + "attn.qkv.weight").T,
                    "bias": t(p + "attn.qkv.bias"),
                },
                "proj": {
                    "kernel": t(p + "attn.proj.weight").T,
                    "bias": t(p + "attn.proj.bias"),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": t(p + "mlp.fc1.weight").T,
                    "bias": t(p + "mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": t(p + "mlp.fc2.weight").T,
                    "bias": t(p + "mlp.fc2.bias"),
                },
            },
        }
    params["norm"] = ln("trunk.norm")

    pool = "attn_pool_contrast", "attn_pool"
    d = cfg.pooled_dim
    bias_qkv = t(*(f"{p}.attn.in_proj_bias" for p in pool))
    params["attn_pool"] = {
        "query": t(*(f"{p}.query" for p in pool)).reshape(1, d),
        "ln_q": ln(*(f"{p}.ln_q" for p in pool)),
        "ln_k": ln(*(f"{p}.ln_k" for p in pool)),
        "q": {
            "kernel": t(*(f"{p}.attn.q_proj_weight" for p in pool)).T,
            "bias": bias_qkv[:d],
        },
        "k": {
            "kernel": t(*(f"{p}.attn.k_proj_weight" for p in pool)).T,
            "bias": bias_qkv[d : 2 * d],
        },
        "v": {
            "kernel": t(*(f"{p}.attn.v_proj_weight" for p in pool)).T,
            "bias": bias_qkv[2 * d :],
        },
        "proj": {
            "kernel": t(*(f"{p}.attn.out_proj.weight" for p in pool)).T,
            "bias": t(*(f"{p}.attn.out_proj.bias" for p in pool)),
        },
    }
    params["ln_contrast"] = ln("ln_contrast")
    return {"params": params}
