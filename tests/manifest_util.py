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


# ---------------------------------------------------------------------------
# CLIP vision tower (plip; HF CLIPModel layout)
# ---------------------------------------------------------------------------


def clip_manifest(cfg) -> dict[str, tuple]:
    """HF ``CLIPModel`` vision keys consumed by
    ``convert_clip_vision_state_dict``: ``vision_model.embeddings`` (conv
    patch embed, class_embedding, position_embedding), ``pre_layrnorm``
    (the HF typo is the real key), per-layer ``self_attn.{q,k,v,out}_proj``
    + ``layer_norm1/2`` + ``mlp.fc1/fc2``, ``post_layernorm``, and the
    bias-free ``visual_projection``."""
    d = cfg.embed_dim
    n = (cfg.img_size // cfg.patch_size) ** 2
    vm = "vision_model."
    m: dict[str, tuple] = {
        vm + "embeddings.patch_embedding.weight": (d, 3, cfg.patch_size, cfg.patch_size),
        vm + "embeddings.class_embedding": (d,),
        vm + "embeddings.position_embedding.weight": (n + 1, d),
        **_layernorm(vm + "pre_layrnorm", d),
        **_layernorm(vm + "post_layernorm", d),
        "visual_projection.weight": (cfg.projection_dim, d),
    }
    for i in range(cfg.depth):
        p = f"{vm}encoder.layers.{i}."
        m.update(_layernorm(p + "layer_norm1", d))
        m.update(_layernorm(p + "layer_norm2", d))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m.update(_linear(p + f"self_attn.{proj}", d, d))
        m.update(_linear(p + "mlp.fc1", cfg.mlp_dim, d))
        m.update(_linear(p + "mlp.fc2", d, cfg.mlp_dim))
    return m


# ---------------------------------------------------------------------------
# CoCa vision branch (conch / conch1_5; open_clip_custom VisualModel layout)
# ---------------------------------------------------------------------------


def coca_manifest(cfg) -> dict[str, tuple]:
    """CONCH checkpoint keys consumed by ``convert_coca_state_dict``:
    ``visual.trunk.*`` (timm ViT, packed qkv, no LayerScale),
    ``visual.attn_pool_contrast`` (open_clip ``AttentionalPooler``: 1-query
    ``query``, ``ln_q``/``ln_k``, an ``nn.MultiheadAttention`` with separate
    ``{q,k,v}_proj_weight`` because kdim = trunk width ≠ query dim, packed
    ``in_proj_bias``, ``out_proj``), and ``visual.ln_contrast``."""
    w, d = cfg.width, cfg.pooled_dim
    n = (cfg.img_size // cfg.patch_size) ** 2
    m: dict[str, tuple] = {
        "visual.trunk.patch_embed.proj.weight": (w, 3, cfg.patch_size, cfg.patch_size),
        "visual.trunk.patch_embed.proj.bias": (w,),
        "visual.trunk.cls_token": (1, 1, w),
        "visual.trunk.pos_embed": (1, n + 1, w),
        **_layernorm("visual.trunk.norm", w),
        **_layernorm("visual.ln_contrast", d),
    }
    for i in range(cfg.depth):
        p = f"visual.trunk.blocks.{i}."
        m.update(_layernorm(p + "norm1", w))
        m.update(_layernorm(p + "norm2", w))
        m.update(_linear(p + "attn.qkv", 3 * w, w))
        m.update(_linear(p + "attn.proj", w, w))
        m.update(_linear(p + "mlp.fc1", 4 * w, w))
        m.update(_linear(p + "mlp.fc2", w, 4 * w))
    pool = "visual.attn_pool_contrast."
    m.update(
        {
            pool + "query": (1, d),
            **_layernorm(pool + "ln_q", d),
            **_layernorm(pool + "ln_k", w),
            pool + "attn.q_proj_weight": (d, d),
            pool + "attn.k_proj_weight": (d, w),
            pool + "attn.v_proj_weight": (d, w),
            pool + "attn.in_proj_bias": (3 * d,),
            **_linear(pool + "attn.out_proj", d, d),
        }
    )
    return m


# ---------------------------------------------------------------------------
# BEiT3 vision branch (musk; torchscale multiway layout)
# ---------------------------------------------------------------------------


def beit3_manifest(cfg) -> dict[str, tuple]:
    """MUSK/BEiT3 checkpoint keys consumed by ``convert_beit3_state_dict``,
    in torchscale's MultiwayWrapper placement: per-modality modules carry an
    ``.A`` (vision) branch at the wrapped module's boundary — the attention
    projections and norms (``self_attn.q_proj.A``), the whole FFN
    (``ffn.A.fc1``), and the positional table
    (``encoder.embed_positions.A`` with 2 reserved padding rows).  ``k_proj``
    is bias-free (the BEiT convention)."""
    w = cfg.width
    hidden = int(w * cfg.mlp_ratio)
    n_tokens = (cfg.img_size // cfg.patch_size) ** 2 + 1
    m: dict[str, tuple] = {
        "beit3.vision_embed.proj.weight": (w, 3, cfg.patch_size, cfg.patch_size),
        "beit3.vision_embed.proj.bias": (w,),
        "beit3.vision_embed.cls_token": (1, 1, w),
        "beit3.encoder.embed_positions.A.weight": (n_tokens + 2, w),
        **_layernorm("beit3.encoder.layer_norm.A", w),
    }
    for i in range(cfg.depth):
        p = f"beit3.encoder.layers.{i}."
        m.update(_layernorm(p + "self_attn_layer_norm.A", w))
        m.update(_linear(p + "self_attn.q_proj.A", w, w))
        m.update(_linear(p + "self_attn.k_proj.A", w, w, bias=False))
        m.update(_linear(p + "self_attn.v_proj.A", w, w))
        m.update(_layernorm(p + "self_attn.inner_attn_ln.A", w))
        m.update(_linear(p + "self_attn.out_proj.A", w, w))
        m.update(_layernorm(p + "final_layer_norm.A", w))
        m.update(_linear(p + "ffn.A.fc1", hidden, w))
        m.update(_layernorm(p + "ffn.A.ffn_layernorm", hidden))
        m.update(_linear(p + "ffn.A.fc2", w, hidden))
    return m


# ---------------------------------------------------------------------------
# TICON contextualizer (cvlab-stonybrook/TICON layout, backbone.* stripped)
# ---------------------------------------------------------------------------


def ticon_manifest(
    embed_dim: int = 1536, depth: int = 6, tile_key: str = "hoptimus1"
) -> dict[str, tuple]:
    """TICON backbone keys consumed by ``convert_ticon_state_dict``: the
    per-source ``input_proj_dict.input_proj_{key}`` MLP (fc1/fc2/norm), per
    block LayerScale residual wrappers ``residual{1,2}`` holding ``gamma``,
    ``norm`` and the wrapped fn (separate q/k/v/proj attention; packed
    SiLU-gated MLP with hidden 16/3·d), and the final ``enc_norm``."""
    d = embed_dim
    hidden = int(d * 16 / 3)
    ip = f"input_proj_dict.input_proj_{tile_key}."
    m: dict[str, tuple] = {
        **_linear(ip + "fc1", d, d),
        **_linear(ip + "fc2", d, d),
        **_layernorm(ip + "norm", d),
        **_layernorm("enc_norm", d),
    }
    for i in range(depth):
        p = f"encoder.blocks.{i}."
        m[p + "residual1.gamma"] = (d,)
        m[p + "residual2.gamma"] = (d,)
        m.update(_layernorm(p + "residual1.norm", d))
        m.update(_layernorm(p + "residual2.norm", d))
        for proj in ("q_proj", "k_proj", "v_proj", "proj"):
            m.update(_linear(p + f"residual1.fn.{proj}", d, d))
        m.update(_linear(p + "residual2.fn.fc1", hidden, d))
        m.update(_linear(p + "residual2.fn.fc2", d, hidden // 2))
    return m


# ---------------------------------------------------------------------------
# Slide encoders (TITAN / GigaPath LongNet / PRISM / COBRA / MADELEINE / CHIEF)
# ---------------------------------------------------------------------------


def titan_manifest(dim: int = 768, in_dim: int = 768, depth: int = 12) -> dict:
    """TITAN slide ViT (timm-style blocks over CONCH1.5 patch features)."""
    m: dict[str, tuple] = {
        **_linear("patch_embed.proj", dim, in_dim),
        "cls_token": (1, 1, dim),
        **_layernorm("norm", dim),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        m.update(_layernorm(p + "norm1", dim))
        m.update(_layernorm(p + "norm2", dim))
        m.update(_linear(p + "attn.qkv", 3 * dim, dim))
        m.update(_linear(p + "attn.proj", dim, dim))
        m.update(_linear(p + "mlp.fc1", 4 * dim, dim))
        m.update(_linear(p + "mlp.fc2", dim, 4 * dim))
    return m


def gigapath_slide_manifest(
    dim: int = 768, in_dim: int = 1536, depth: int = 12
) -> dict:
    """GigaPath LongNetViT (torchscale encoder naming, separate q/k/v)."""
    m: dict[str, tuple] = {
        **_linear("patch_embed.proj", dim, in_dim),
        "cls_token": (1, 1, dim),
        **_layernorm("encoder.layer_norm", dim),
    }
    for i in range(depth):
        p = f"encoder.layers.{i}."
        m.update(_layernorm(p + "self_attn_layer_norm", dim))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m.update(_linear(p + f"self_attn.{proj}", dim, dim))
        m.update(_layernorm(p + "final_layer_norm", dim))
        m.update(_linear(p + "ffn.fc1", 4 * dim, dim))
        m.update(_linear(p + "ffn.fc2", dim, 4 * dim))
    return m


def prism_manifest(
    dim: int = 1280, input_dim: int = 2560, num_latents: int = 512, depth: int = 8
) -> dict:
    """PRISM Perceiver resampler (latents, media_proj, per layer a
    cross-attention + latent transformer block)."""
    m: dict[str, tuple] = {
        "latents": (num_latents, dim),
        **_linear("media_proj", dim, input_dim),
        **_layernorm("norm", dim),
    }
    for i in range(depth):
        p = f"layers.{i}."
        m.update(_layernorm(p + "cross_norm", dim))
        for proj in ("cross_q", "cross_k", "cross_v", "cross_proj"):
            m.update(_linear(p + proj, dim, dim))
        m.update(_layernorm(p + "norm1", dim))
        m.update(_layernorm(p + "norm2", dim))
        m.update(_linear(p + "attn.qkv", 3 * dim, dim))
        m.update(_linear(p + "attn.proj", dim, dim))
        m.update(_linear(p + "mlp.fc1", 4 * dim, dim))
        m.update(_linear(p + "mlp.fc2", dim, 4 * dim))
    return m


def cobra_manifest(
    d_model: int = 768,
    depth: int = 2,
    input_dims: tuple[int, ...] = (512, 1024, 1536, 2560),
    d_state: int = 128,
    d_conv: int = 4,
    expand: int = 2,
    headdim: int = 64,
) -> dict:
    """COBRA (per-dim embed heads, mamba-ssm ``Mamba2`` mixers, CLAM gated
    attention).  Mixer shapes follow mamba-ssm's parameter layout:
    ``in_proj`` emits [z, x, B, C, dt], the depthwise conv covers
    (x, B, C), per-head ``A_log``/``D``/``dt_bias``."""
    d_inner = expand * d_model
    nheads = d_inner // headdim
    conv_dim = d_inner + 2 * d_state
    m: dict[str, tuple] = {
        **_layernorm("norm", d_model),
        **_linear("attention.attention_a.0", 384, d_model),
        **_linear("attention.attention_b.0", 384, d_model),
        **_linear("attention.attention_c", 1, 384),
    }
    for d_in in input_dims:
        m.update(_linear(f"embed.{d_in}", d_model, d_in))
    for i in range(depth):
        p = f"mamba.layers.{i}."
        m.update(_layernorm(p + "norm", d_model))
        m[p + "mixer.in_proj.weight"] = (2 * d_inner + 2 * d_state + nheads, d_model)
        m[p + "mixer.conv1d.weight"] = (conv_dim, 1, d_conv)
        m[p + "mixer.conv1d.bias"] = (conv_dim,)
        m[p + "mixer.A_log"] = (nheads,)
        m[p + "mixer.D"] = (nheads,)
        m[p + "mixer.dt_bias"] = (nheads,)
        m[p + "mixer.norm.weight"] = (d_inner,)
        m[p + "mixer.out_proj.weight"] = (d_model, d_inner)
    return m


def madeleine_manifest(dim: int = 512, in_dim: int = 512) -> dict:
    """MADELEINE (pre-projection, CLAM gated attention, post-projection)."""
    return {
        **_linear("patch_embedder.0", dim, in_dim),
        **_linear("attention.attention_a.0", dim, dim),
        **_linear("attention.attention_b.0", dim, dim),
        **_linear("attention.attention_c", 4, dim),
        **_linear("post_attention", dim, dim),
    }


def chief_manifest() -> dict:
    """CHIEF WSI-level gated attention net (CLAM layout under
    ``attention_net``: Linear stem, then gated attention a/b/c)."""
    return {
        **_linear("attention_net.0", 512, 768),
        **_linear("attention_net.3.attention_a.0", 256, 512),
        **_linear("attention_net.3.attention_b.0", 256, 512),
        **_linear("attention_net.3.attention_c", 1, 256),
    }


def keep_manifest() -> dict:
    """KEEP checkpoint keys consumed by ``keep_split_state_dict``: the
    ``visual.``-prefixed timm ViT-L trunk (LayerScale stored as
    ``ls{1,2}.weight`` — KEEP's convention, remapped to timm's ``gamma``)
    plus the ``visual_head`` projection (Linear → GELU → Linear)."""
    from stamp_tpu.models.vit_image import VIT_CONFIGS

    cfg = VIT_CONFIGS["uni"]
    m = {}
    for k, shape in vit_manifest(cfg).items():
        if k.endswith("ls1.gamma") or k.endswith("ls2.gamma"):
            k = k.replace(".gamma", ".weight")
        m[f"visual.{k}"] = shape
    m.update(_linear("visual_head.0", 768, cfg.embed_dim))
    m.update(_linear("visual_head.2", 768, 768))
    return m


def all_manifests() -> dict[str, dict[str, tuple]]:
    from stamp_tpu.models.beit3 import Beit3Config
    from stamp_tpu.models.clip_vision import CLIPVisionConfig
    from stamp_tpu.models.coca import COCA_CONFIGS
    from stamp_tpu.models.vit_image import VIT_CONFIGS

    out = {
        f"vit/{name}": vit_manifest(cfg) for name, cfg in VIT_CONFIGS.items()
    }
    out["swin/ctranspath"] = swin_manifest()
    out["clip/plip"] = clip_manifest(CLIPVisionConfig())
    for name, cfg in COCA_CONFIGS.items():
        out[f"coca/{name}"] = coca_manifest(cfg)
    out["beit3/musk"] = beit3_manifest(Beit3Config())
    out["ticon/ticon"] = ticon_manifest()
    out["keep/keep"] = keep_manifest()
    out["slide/titan"] = titan_manifest()
    out["slide/gigapath"] = gigapath_slide_manifest()
    out["slide/prism"] = prism_manifest()
    out["slide/cobra"] = cobra_manifest()
    out["slide/madeleine"] = madeleine_manifest()
    out["slide/chief"] = chief_manifest()
    return out


if __name__ == "__main__":
    MANIFEST_DIR.mkdir(parents=True, exist_ok=True)
    for name, manifest in all_manifests().items():
        path = MANIFEST_DIR / (name.replace("/", "__") + ".json")
        path.write_text(
            json.dumps({k: list(v) for k, v in manifest.items()}, indent=1)
        )
        print(f"wrote {path} ({len(manifest)} keys)")
