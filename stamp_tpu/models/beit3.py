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
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.models.vit_image import QuantDense


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
    # QuantDense mode of the block matmuls: "off" | "observe" | "int8"
    quant: str = "off"


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
        q = QuantDense(cfg.width, mode=cfg.quant, name="q")(h)
        k = QuantDense(cfg.width, use_bias=False, mode=cfg.quant, name="k")(h)
        v = QuantDense(cfg.width, mode=cfg.quant, name="v")(h)

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
        x = x + QuantDense(cfg.width, mode=cfg.quant, name="proj")(out)

        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x)
        h = QuantDense(int(cfg.width * cfg.mlp_ratio), mode=cfg.quant, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="ffn_ln")(h)  # sub-LN
        return x + QuantDense(cfg.width, mode=cfg.quant, name="fc2")(h)


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


def convert_beit3_state_dict(
    state_dict: dict[str, np.ndarray], cfg: Beit3Config
) -> dict:
    """Map a MUSK/BEiT3 (torchscale) checkpoint onto ``Beit3VisionTower``.

    Targets the torchscale multiway layout MUSK checkpoints carry: modules
    duplicated per modality appear under an ``.A`` (vision) / ``.B`` (text)
    branch — only ``.A`` is read.  Keys: ``beit3.vision_embed.proj`` (patch
    conv) and ``.cls_token``; ``beit3.encoder.embed_positions.A.weight``
    (learned positions with torchscale's two reserved padding slots — rows
    2: map onto [CLS; patches]); per layer ``self_attn_layer_norm``,
    ``self_attn.{q_proj,k_proj,v_proj,inner_attn_ln,out_proj}`` (k has no
    bias, the BEiT convention), ``final_layer_norm`` and ``ffn.{fc1,
    ffn_layernorm,fc2}`` (the sub-LayerNorm FFN); final
    ``beit3.encoder.layer_norm``.  Keys are looked up with and without the
    multiway ``.A`` suffix and with/without the ``beit3.`` prefix.
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in state_dict.items()}

    def t(name: str, suffix: str) -> np.ndarray:
        # name is the module path; suffix is "weight"/"bias".  The multiway
        # ".A" wraps whole modules, so it can sit at any dot boundary
        # (``ffn.A.fc1`` but ``self_attn.q_proj.A``) — try every insertion
        # point, innermost first, then the plain name.
        parts = name.split(".")
        names = [
            ".".join(parts[: j + 1] + ["A"] + parts[j + 1 :])
            for j in reversed(range(len(parts)))
        ] + [name]
        for n in names:
            for cand in (f"beit3.{n}.{suffix}", f"{n}.{suffix}"):
                if cand in sd:
                    return sd[cand]
        raise KeyError(f"{name}.{suffix} not found (with or without .A branch)")

    def ln(name: str) -> dict:
        return {"scale": t(name, "weight"), "bias": t(name, "bias")}

    params: dict[str, Any] = {}
    w = t("vision_embed.proj", "weight")  # [D, 3, ph, pw]
    params["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": t("vision_embed.proj", "bias"),
    }
    for cand in ("beit3.vision_embed.cls_token", "vision_embed.cls_token"):
        if cand in sd:
            params["cls_token"] = sd[cand].reshape(1, 1, cfg.width)
            break
    else:
        raise KeyError("vision_embed.cls_token not found")
    # torchscale PositionalEmbedding reserves indices 0-1 (padding); vision
    # positions for [CLS; patches] start at row 2
    pos = t("encoder.embed_positions", "weight")
    n_tokens = (cfg.img_size // cfg.patch_size) ** 2 + 1
    params["pos_embed"] = pos[2 : 2 + n_tokens]

    for i in range(cfg.depth):
        p = f"encoder.layers.{i}."
        params[f"block_{i}"] = {
            "norm1": ln(p + "self_attn_layer_norm"),
            "q": {
                "kernel": t(p + "self_attn.q_proj", "weight").T,
                "bias": t(p + "self_attn.q_proj", "bias"),
            },
            "k": {"kernel": t(p + "self_attn.k_proj", "weight").T},
            "v": {
                "kernel": t(p + "self_attn.v_proj", "weight").T,
                "bias": t(p + "self_attn.v_proj", "bias"),
            },
            "inner_attn_ln": ln(p + "self_attn.inner_attn_ln"),
            "proj": {
                "kernel": t(p + "self_attn.out_proj", "weight").T,
                "bias": t(p + "self_attn.out_proj", "bias"),
            },
            "norm2": ln(p + "final_layer_norm"),
            "fc1": {
                "kernel": t(p + "ffn.fc1", "weight").T,
                "bias": t(p + "ffn.fc1", "bias"),
            },
            "ffn_ln": ln(p + "ffn.ffn_layernorm"),
            "fc2": {
                "kernel": t(p + "ffn.fc2", "weight").T,
                "bias": t(p + "ffn.fc2", "bias"),
            },
        }
    params["norm"] = ln("encoder.layer_norm")
    return {"params": params}


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


def beit3_quant_sites(depth: int) -> list[tuple[str, ...]]:
    """QuantDense sites of the BEiT3 vision tower."""
    return [
        (f"block_{i}", name)
        for i in range(depth)
        for name in ("q", "k", "v", "proj", "fc1", "fc2")
    ]
