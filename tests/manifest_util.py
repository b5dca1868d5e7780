"""Vendored upstream state-dict key manifests for the weight converters.

Each function enumerates, independently of the converter code, the exact
``{key: shape}`` set a given upstream checkpoint carries (for the subset of
keys the pipeline consumes — classifier heads etc. excluded).  The shape
formulas follow the public upstream model definitions (timm ViT idioms,
Swin-T, CLIP vision towers, CoCa/BEiT3, torchscale LongNet, mamba-ssm
Mamba2, CLAM gated attention) that the parity oracles in
tests/test_converter_parity.py / test_extractor_parity.py replicate.

`python -m tests.manifest_util` dumps every manifest to
tests/data/manifests/*.json so the expected upstream schema is reviewable
as plain text and diffable against the real repos once egress exists.

tests/test_converter_manifests.py asserts for every architecture, at its
REAL production dimensions, that the converter (a) consumes 100% of its
manifest, (b) touches no key outside it, and (c) fills every parameter of
the flax module (shape-exact, via jax.eval_shape — no weights involved).
"""

from __future__ import annotations

import json
from pathlib import Path

MANIFEST_DIR = Path(__file__).parent / "data" / "manifests"


def _linear(key: str, d_out: int, d_in: int, *, bias: bool = True) -> dict:
    out = {f"{key}.weight": (d_out, d_in)}
    if bias:
        out[f"{key}.bias"] = (d_out,)
    return out


def _layernorm(key: str, d: int) -> dict:
    return {f"{key}.weight": (d,), f"{key}.bias": (d,)}


# ---------------------------------------------------------------------------
# timm ViT family (uni / uni2 / virchow* / h_optimus / gigapath / dinov2)
# ---------------------------------------------------------------------------


def vit_manifest(cfg) -> dict[str, tuple]:
    """timm ViT checkpoint keys: packed qkv, optional LayerScale
    (``ls1/ls2.gamma``), optional ``reg_token``, MLP or SwiGLUPacked
    (fc1 → packed width, inner norm + fc2 over the half width)."""
    d = cfg.embed_dim
    n_patches = (cfg.img_size // cfg.patch_size) ** 2
    pos_len = n_patches + (1 if cfg.pos_embed_cls else 0)
    hidden = int(d * cfg.mlp_ratio)

    m: dict[str, tuple] = {
        "patch_embed.proj.weight": (d, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": (d,),
        "cls_token": (1, 1, d),
        "pos_embed": (1, pos_len, d),
        "norm.weight": (d,),
        "norm.bias": (d,),
    }
    if cfg.num_reg_tokens:
        m["reg_token"] = (1, cfg.num_reg_tokens, d)
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        m.update(_layernorm(p + "norm1", d))
        m.update(_layernorm(p + "norm2", d))
        m.update(_linear(p + "attn.qkv", 3 * d, d, bias=cfg.qkv_bias))
        m.update(_linear(p + "attn.proj", d, d))
        m.update(_linear(p + "mlp.fc1", hidden, d))
        if cfg.ffn == "swiglu":
            m.update(_layernorm(p + "mlp.norm", hidden // 2))
            m.update(_linear(p + "mlp.fc2", d, hidden // 2))
        else:
            m.update(_linear(p + "mlp.fc2", d, hidden))
        if cfg.init_values is not None:
            m[p + "ls1.gamma"] = (d,)
            m[p + "ls2.gamma"] = (d,)
    return m


# ---------------------------------------------------------------------------
# Swin-T with CTransPath conv stem (ctranspath / chief_ctranspath)
# ---------------------------------------------------------------------------


def swin_manifest(
    embed_dim: int = 96,
    depths: tuple[int, ...] = (2, 2, 6, 2),
    window: int = 7,
) -> dict[str, tuple]:
    """CTransPath checkpoint keys: _ConvStem (two 3×3 s2 conv+BN doubling
    from embed//8, a 1×1 proj, LayerNorm) + timm Swin-T stages with relative
    position bias tables and patch-merging downsamples."""
    m: dict[str, tuple] = {}
    c_in, c_out = 3, embed_dim // 8
    for conv_idx, bn_idx in ((0, 1), (3, 4)):
        m[f"patch_embed.proj.{conv_idx}.weight"] = (c_out, c_in, 3, 3)
        for stat in ("weight", "bias", "running_mean", "running_var"):
            m[f"patch_embed.proj.{bn_idx}.{stat}"] = (c_out,)
        c_in, c_out = c_out, c_out * 2
    m["patch_embed.proj.6.weight"] = (embed_dim, c_in, 1, 1)
    m["patch_embed.proj.6.bias"] = (embed_dim,)
    m.update(_layernorm("patch_embed.norm", embed_dim))

    for stage, depth in enumerate(depths):
        d = embed_dim * 2**stage
        for blk in range(depth):
            p = f"layers.{stage}.blocks.{blk}."
            m.update(_layernorm(p + "norm1", d))
            m.update(_layernorm(p + "norm2", d))
            m[p + "attn.relative_position_bias_table"] = (
                (2 * window - 1) ** 2,
                # timm swin heads per stage: dim // 32 for swin-T
                d // 32,
            )
            m.update(_linear(p + "attn.qkv", 3 * d, d))
            m.update(_linear(p + "attn.proj", d, d))
            m.update(_linear(p + "mlp.fc1", 4 * d, d))
            m.update(_linear(p + "mlp.fc2", d, 4 * d))
        if stage < 3:
            dp = f"layers.{stage}.downsample."
            m.update(_layernorm(dp + "norm", 4 * d))
            m[dp + "reduction.weight"] = (2 * d, 4 * d)
    m.update(_layernorm("norm", embed_dim * 2 ** (len(depths) - 1)))
    return m


def all_manifests() -> dict[str, dict[str, tuple]]:
    from stamp_tpu.models.vit_image import VIT_CONFIGS

    out = {
        f"vit/{name}": vit_manifest(cfg) for name, cfg in VIT_CONFIGS.items()
    }
    out["swin/ctranspath"] = swin_manifest()
    return out


if __name__ == "__main__":
    MANIFEST_DIR.mkdir(parents=True, exist_ok=True)
    for name, manifest in all_manifests().items():
        path = MANIFEST_DIR / (name.replace("/", "__") + ".json")
        path.write_text(
            json.dumps({k: list(v) for k, v in manifest.items()}, indent=1)
        )
        print(f"wrote {path} ({len(manifest)} keys)")
