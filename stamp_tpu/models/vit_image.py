"""Generic image Vision Transformer for the tile-extractor zoo.

One parameterized implementation covers most of the reference's foundation
models (they are all timm-style ViTs — reference extractor/uni.py, uni2.py,
virchow*.py, h_optimus_*.py, gigapath.py, mstar.py, dinobloom.py,
reddino.py): class token, optional register tokens, learned position
embeddings, pre-LN blocks with optional LayerScale, MLP or (packed) SwiGLU
feed-forward, and a configurable output head (CLS token, mean of patch
tokens, or their concatenation — the latter needed by virchow-full,
reference extractor/virchow_full.py).

``convert_torch_state_dict`` maps timm checkpoint tensors onto the flax
parameter tree so published weights can be ported 1:1; computation runs in
bfloat16 on the MXU with float32 accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Literal

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    ffn: Literal["mlp", "swiglu"] = "mlp"
    num_reg_tokens: int = 0
    class_token: bool = True
    pos_embed_cls: bool = True  # does pos_embed include the cls token slot?
    init_values: float | None = None  # LayerScale
    qkv_bias: bool = True
    norm_eps: float = 1e-6
    pool: Literal["token", "avg", "token_avg_concat"] = "token"
    act: Literal["gelu", "silu"] = "gelu"
    # normalization applied on device before the backbone
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: tuple[float, float, float] = (0.229, 0.224, 0.225)
    # block-Dense precision: "off" = bf16 everywhere; "observe" = bf16 +
    # record per-matmul activation maxima (calibration pass); "int8" = W8A8
    # MXU matmuls with per-out-channel weight scales and static (calibrated)
    # per-tensor activation scales.  See `quantize_vit_params`.
    quant: Literal["off", "observe", "int8"] = "off"
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.num_reg_tokens


def _use_fused_attention() -> bool:
    """Fused Pallas attention on accelerators; einsum on CPU (tests/CI)."""
    import os

    if os.environ.get("STAMP_NO_FUSED_ATTENTION"):
        return False
    # honor an enclosing `jax.default_device(cpu)` (e.g. host-side param
    # init), which jax.default_backend() does not reflect
    default_device = jax.config.jax_default_device
    if default_device is not None:
        return default_device.platform != "cpu"
    return jax.default_backend() != "cpu"


def _use_fused_ln_dense() -> bool:
    """Fused Pallas LN→matmul on accelerators (ops/ln_dense.py)."""
    import os

    if os.environ.get("STAMP_NO_FUSED_LN_DENSE"):
        return False
    return _use_fused_attention()


class _LNParams(nn.Module):
    """LayerNorm parameter container with ``nn.LayerNorm``'s exact tree
    ({"scale", "bias"}), returned as values so the consuming matmul can fuse
    the normalization (ops/ln_dense.py) instead of materializing it."""

    dim: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def _apply_ln(x: jax.Array, ln: tuple) -> jax.Array:
    """Unfused LN for the paths that can't consume the fusion (CPU, int8)."""
    scale, bias, eps = ln
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


class QuantDense(nn.Module):
    """Dense layer with an optional int8 (W8A8) inference path.

    Parameter tree matches ``nn.Dense`` exactly in "off"/"observe" modes
    ("kernel", "bias"), so the torch weight converters are unaffected.  In
    "int8" mode the tree holds "kernel_q" (int8, pre-quantized per output
    channel by `quantize_vit_params`), "w_scale" (f32 per-channel dequant
    scale) and "bias"; the static per-tensor activation scale comes from the
    "act_stats" collection recorded during an "observe" calibration pass.

    Why static scales: a *dynamic* per-batch activation max costs an extra
    full read of the activation (plus a reduce) per matmul — measured slower
    than bf16 end-to-end (ROADMAP.md int8 negative result).  With static
    scales the quantize is a pure elementwise epilogue that XLA fuses into
    the producing op, and the int8 operand halves the matmul's HBM traffic
    while doubling MXU throughput (v5e: 394 int8 TOPS vs 197 bf16 TFLOPS).
    """

    features: int
    use_bias: bool = True
    mode: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array, ln: tuple | None = None) -> jax.Array:
        """``ln=(scale, bias, eps)`` marks ``x`` as *pre-normalization*: the
        LayerNorm is fused into this matmul on accelerators
        (ops/ln_dense.py) and applied inline on the unfused paths."""
        d_in = x.shape[-1]
        if self.mode in ("off", "observe"):
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(), (d_in, self.features)
            )
            if ln is not None and self.mode == "off" and _use_fused_ln_dense():
                from stamp_tpu.ops.ln_dense import ln_dense

                scale, bias_ln, eps = ln
                y = ln_dense(
                    x,
                    scale,
                    bias_ln,
                    kernel.astype(x.dtype),
                    self.param(
                        "bias", nn.initializers.zeros, (self.features,)
                    )
                    if self.use_bias
                    else None,
                    eps=eps,
                )
                return y
            if ln is not None:
                x = _apply_ln(x, ln)
            if self.mode == "observe":
                amax = self.variable(
                    "act_stats", "amax", lambda: jnp.zeros((), jnp.float32)
                )
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            y = x @ kernel.astype(x.dtype)
        else:  # int8
            kernel_q = self.param(
                "kernel_q",
                lambda rng, shape: jnp.zeros(shape, jnp.int8),
                (d_in, self.features),
            )
            w_scale = self.param(
                "w_scale", nn.initializers.ones, (self.features,)
            )
            amax = self.variable(
                "act_stats", "amax", lambda: jnp.ones((), jnp.float32)
            )
            # 5% headroom over the calibration max; harder clipping hurts
            # more than the extra quantization step costs
            s_x = jnp.maximum(amax.value, 1e-6) * 1.05
            if ln is not None and _use_fused_ln_dense():
                # LN → quantize → int8 dot → dequant as ONE Pallas kernel
                # (ops/ln_dense.py:ln_quant_dense, 1.26× at the UNI2 qkv
                # site) — the standalone LN+quantize pass and its int8 HBM
                # round-trip disappear
                from stamp_tpu.ops.ln_dense import ln_quant_dense

                scale, bias_ln, eps = ln
                return ln_quant_dense(
                    x,
                    scale,
                    bias_ln,
                    s_x,
                    kernel_q,
                    w_scale,
                    self.param(
                        "bias", nn.initializers.zeros, (self.features,)
                    )
                    if self.use_bias
                    else None,
                    eps=eps,
                )
            if ln is not None:
                x = _apply_ln(x, ln)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (127.0 / s_x)), -127, 127
            ).astype(jnp.int8)
            y_i32 = jax.lax.dot_general(
                xq,
                kernel_q,
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (
                y_i32.astype(jnp.float32)
                * (s_x / 127.0)
                * w_scale.astype(jnp.float32)
            ).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class _Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool
    quant: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array, ln: tuple | None = None) -> jax.Array:
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = QuantDense(
            3 * self.dim, use_bias=self.qkv_bias, mode=self.quant, name="qkv"
        )(x, ln=ln)
        if _use_fused_attention():
            # all-head VMEM-resident attention straight off the packed qkv
            # projection: avoids both the [B, H, N, D] relayout and the
            # [B, H, N, N] f32 score tensor in HBM, which otherwise cost
            # ~half the ViT forward time (scripts/perf_probe.py)
            from stamp_tpu.ops.flash_attention import fused_qkv_mha

            out = fused_qkv_mha(qkv, self.num_heads)
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            scale = head_dim**-0.5
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
            )
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return QuantDense(self.dim, mode=self.quant, name="proj")(out)


class _Mlp(nn.Module):
    dim: int
    hidden: int
    act: str
    quant: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array, ln: tuple | None = None) -> jax.Array:
        x = QuantDense(self.hidden, mode=self.quant, name="fc1")(x, ln=ln)
        x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.silu(x)
        return QuantDense(self.dim, mode=self.quant, name="fc2")(x)


class _SwiGLU(nn.Module):
    """timm SwiGLUPacked: fc1 emits ``hidden`` features which are split into
    two halves, gate = silu(x1)·x2 (i.e. the packed convention — the
    per-branch width is hidden//2)."""

    dim: int
    hidden: int
    use_norm: bool = True
    quant: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array, ln: tuple | None = None) -> jax.Array:
        x12 = QuantDense(self.hidden, mode=self.quant, name="fc1")(x, ln=ln)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        x = nn.silu(x1) * x2
        if self.use_norm:
            # timm SwiGLUPacked has a norm before the output projection;
            # same param tree as nn.LayerNorm, fused into fc2 on device
            g, b = _LNParams(self.hidden // 2, name="norm")()
            return QuantDense(self.dim, mode=self.quant, name="fc2")(
                x, ln=(g, b, 1e-6)
            )
        return QuantDense(self.dim, mode=self.quant, name="fc2")(x)


class _Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        g1, b1 = _LNParams(cfg.embed_dim, name="norm1")()
        h = _Attention(
            cfg.embed_dim, cfg.num_heads, cfg.qkv_bias, cfg.quant, name="attn"
        )(x, ln=(g1, b1, cfg.norm_eps))
        if cfg.init_values is not None:
            gamma1 = self.param(
                "ls1_gamma",
                nn.initializers.constant(cfg.init_values),
                (cfg.embed_dim,),
            )
            h = h * gamma1
        x = x + h

        g2, b2 = _LNParams(cfg.embed_dim, name="norm2")()
        ln2 = (g2, b2, cfg.norm_eps)
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        if cfg.ffn == "swiglu":
            h = _SwiGLU(cfg.embed_dim, hidden, quant=cfg.quant, name="mlp")(
                x, ln=ln2
            )
        else:
            h = _Mlp(cfg.embed_dim, hidden, cfg.act, quant=cfg.quant, name="mlp")(
                x, ln=ln2
            )
        if cfg.init_values is not None:
            gamma2 = self.param(
                "ls2_gamma",
                nn.initializers.constant(cfg.init_values),
                (cfg.embed_dim,),
            )
            h = h * gamma2
        return x + h


class ImageViT(nn.Module):
    """timm-compatible ViT backbone producing tile features."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jax.Array, part: str = "all") -> jax.Array:
        """images: [B, H, W, 3] float, already normalized. Returns [B, D_out].

        ``part`` splits the forward for pipeline parallelism
        (parallel/pp_extractor.py): ``"embed"`` runs patch embedding + token
        assembly and returns the [B, N, D] token sequence; ``"head"`` takes
        that token sequence and runs the final norm + pooling.  The
        transformer blocks between them are applied by the pipeline itself
        (their stacked params are sharded over the ``pp`` mesh axis).
        ``"all"`` (default) is the ordinary full forward.
        """
        cfg = self.cfg
        if part == "head":
            return self._pool(nn.LayerNorm(epsilon=cfg.norm_eps, name="norm")(images))
        b = images.shape[0]

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
        )(images)
        x = x.reshape(b, -1, cfg.embed_dim)  # [B, N, D]
        n_patches = x.shape[1]

        pos_len = n_patches + (1 if (cfg.class_token and cfg.pos_embed_cls) else 0)
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, pos_len, cfg.embed_dim),
        )

        tokens = []
        if cfg.class_token:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim)
            )
            if cfg.pos_embed_cls:
                # pos_embed covers [cls; patches]
                cls_tok = jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)) + pos_embed[:, :1]
                x = x + pos_embed[:, 1:]
            else:
                cls_tok = jnp.broadcast_to(cls, (b, 1, cfg.embed_dim))
                x = x + pos_embed
            tokens.append(cls_tok)
        else:
            x = x + pos_embed

        if cfg.num_reg_tokens:
            reg = self.param(
                "reg_token",
                nn.initializers.zeros,
                (1, cfg.num_reg_tokens, cfg.embed_dim),
            )
            tokens.append(jnp.broadcast_to(reg, (b, cfg.num_reg_tokens, cfg.embed_dim)))

        tokens.append(x)
        x = jnp.concatenate(tokens, axis=1)
        if part == "embed":
            return x

        for i in range(cfg.depth):
            x = _Block(cfg, name=f"block_{i}")(x)

        return self._pool(nn.LayerNorm(epsilon=cfg.norm_eps, name="norm")(x))

    def _pool(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        n_prefix = cfg.num_prefix_tokens
        if cfg.pool == "token":
            return x[:, 0]
        elif cfg.pool == "avg":
            return x[:, n_prefix:].mean(axis=1)
        elif cfg.pool == "token_avg_concat":
            # virchow-full: CLS ⧺ mean(patch tokens) (virchow_full.py docs)
            return jnp.concatenate([x[:, 0], x[:, n_prefix:].mean(axis=1)], axis=-1)
        raise ValueError(cfg.pool)


# ---------------------------------------------------------------------------
# int8 (W8A8) post-training quantization
# ---------------------------------------------------------------------------


def _quantized_dense_site(leaf_parent: dict) -> dict:
    """bf16/f32 Dense params → the int8 QuantDense tree:
    ``kernel_q = round(kernel / w_scale)`` (int8 per output channel),
    ``w_scale = max|kernel[:, n]| / 127`` (f32); the bias rides along.

    jnp (not np) so pre-quantization of device-resident weights happens
    on-device instead of pulling gigabytes to the host."""
    kernel = jnp.asarray(leaf_parent["kernel"], dtype=jnp.float32)
    s = jnp.maximum(jnp.abs(kernel).max(axis=0), 1e-8) / 127.0
    kq = jnp.clip(jnp.round(kernel / s), -127, 127).astype(jnp.int8)
    out = {"kernel_q": kq, "w_scale": s}
    if "bias" in leaf_parent:
        out["bias"] = leaf_parent["bias"]
    return out


def quantize_sites(params: dict, sites) -> dict:
    """Pre-quantize the Dense kernels at explicit parameter-tree paths.

    ``sites`` is an iterable of tuple paths (e.g. ``("block_0", "attn",
    "qkv")``); every listed site must be a QuantDense in the int8-mode
    module.  Everything else (patch embeds, LayerNorms, LayerScale, the
    attention math) stays bf16.
    """

    def replace(tree: dict, path: tuple) -> dict:
        node = dict(tree)
        if len(path) == 1:
            node[path[0]] = _quantized_dense_site(node[path[0]])
        else:
            node[path[0]] = replace(node[path[0]], path[1:])
        return node

    for path in sites:
        params = replace(params, tuple(path))
    return params


def vit_quant_sites(depth: int) -> list[tuple[str, ...]]:
    """The QuantDense sites of an ImageViT / CoCa-trunk block stack."""
    sites: list[tuple[str, ...]] = []
    for i in range(depth):
        block = f"block_{i}"
        sites += [
            (block, "attn", "qkv"),
            (block, "attn", "proj"),
            (block, "mlp", "fc1"),
            (block, "mlp", "fc2"),
        ]
    return sites


def quantize_vit_params(params: dict, cfg: ViTConfig) -> dict:
    """Pre-quantize an ``ImageViT(cfg)`` tree for ``quant="int8"`` mode."""
    return quantize_sites(params, vit_quant_sites(cfg.depth))


def calibrate_act_stats(
    cfg: ViTConfig, variables: dict, images: jax.Array
) -> dict:
    """One observe-mode forward recording per-matmul activation maxima.

    Returns the ``act_stats`` collection to pass alongside the quantized
    params.  ``images`` must already be normalized like the real input
    (a single representative batch is enough — activations of LayerNorm-fed
    matmuls are distribution-stable across tile batches)."""
    observe = ImageViT(ViTConfig(**{**cfg.__dict__, "quant": "observe"}))
    _, mut = observe.apply(variables, images, mutable=["act_stats"])
    return jax.tree_util.tree_map(jnp.asarray, mut["act_stats"])


# ---------------------------------------------------------------------------
# torch (timm) → flax weight conversion
# ---------------------------------------------------------------------------


def convert_torch_state_dict(
    state_dict: dict[str, np.ndarray], cfg: ViTConfig
) -> dict:
    """Map a timm ViT state dict onto the ImageViT parameter tree.

    Handles the naming idioms of the models in the zoo: ``blocks.N.*``,
    packed qkv, LayerScale ``ls1/ls2.gamma`` (or ``gamma_1/gamma_2``),
    ``reg_token`` / ``register_tokens``.
    """

    def t(name: str) -> np.ndarray:
        return np.asarray(state_dict[name])

    params: dict[str, Any] = {}

    w = t("patch_embed.proj.weight")  # [D, 3, ph, pw]
    params["patch_embed"] = {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": t("patch_embed.proj.bias"),
    }
    params["pos_embed"] = t("pos_embed")
    if cfg.class_token:
        params["cls_token"] = t("cls_token")
    if cfg.num_reg_tokens:
        for key in ("reg_token", "register_tokens"):
            if key in state_dict:
                params["reg_token"] = t(key)
                break

    for i in range(cfg.depth):
        p = f"blocks.{i}."
        block: dict[str, Any] = {
            "norm1": {"scale": t(p + "norm1.weight"), "bias": t(p + "norm1.bias")},
            "norm2": {"scale": t(p + "norm2.weight"), "bias": t(p + "norm2.bias")},
            "attn": {
                "qkv": {"kernel": t(p + "attn.qkv.weight").T},
                "proj": {
                    "kernel": t(p + "attn.proj.weight").T,
                    "bias": t(p + "attn.proj.bias"),
                },
            },
        }
        if cfg.qkv_bias:
            block["attn"]["qkv"]["bias"] = t(p + "attn.qkv.bias")
        if cfg.ffn == "swiglu":
            mlp = {
                "fc1": {
                    "kernel": t(p + "mlp.fc1.weight").T,
                    "bias": t(p + "mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": t(p + "mlp.fc2.weight").T,
                    "bias": t(p + "mlp.fc2.bias"),
                },
            }
            if p + "mlp.norm.weight" in state_dict:
                mlp["norm"] = {
                    "scale": t(p + "mlp.norm.weight"),
                    "bias": t(p + "mlp.norm.bias"),
                }
            block["mlp"] = mlp
        else:
            block["mlp"] = {
                "fc1": {
                    "kernel": t(p + "mlp.fc1.weight").T,
                    "bias": t(p + "mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": t(p + "mlp.fc2.weight").T,
                    "bias": t(p + "mlp.fc2.bias"),
                },
            }
        if cfg.init_values is not None:
            if p + "ls1.gamma" in state_dict:
                block["ls1_gamma"] = t(p + "ls1.gamma")
                block["ls2_gamma"] = t(p + "ls2.gamma")
            elif p + "gamma_1" in state_dict:
                block["ls1_gamma"] = t(p + "gamma_1")
                block["ls2_gamma"] = t(p + "gamma_2")
        params[f"block_{i}"] = block

    params["norm"] = {"scale": t("norm.weight"), "bias": t("norm.bias")}
    return {"params": params}


# Architecture configs for the extractor zoo (dims per the respective model
# cards; see SURVEY.md §2.1 rows 12-16 for the reference factories).
VIT_CONFIGS: dict[str, ViTConfig] = {
    # MahmoodLab UNI — ViT-L/16, dynamic size, layerscale 1e-5 (uni.py:24-36)
    "uni": ViTConfig(
        patch_size=16, embed_dim=1024, depth=24, num_heads=16, init_values=1e-5
    ),
    # MahmoodLab UNI2-h — ViT-H/14-reg8, embed 1536, depth 24, SwiGLU (uni2.py:20-40)
    "uni2": ViTConfig(
        patch_size=14,
        embed_dim=1536,
        depth=24,
        num_heads=24,
        mlp_ratio=2.66667 * 2,
        ffn="swiglu",
        num_reg_tokens=8,
        init_values=1e-5,
        act="silu",
    ),
    # Paige Virchow / Virchow2 — ViT-H/14 with SwiGLU, 4 reg tokens on v2
    "virchow": ViTConfig(
        patch_size=14,
        embed_dim=1280,
        depth=32,
        num_heads=16,
        mlp_ratio=5.3375,
        ffn="swiglu",
        init_values=1e-5,
        mean=(0.5, 0.5, 0.5),
        std=(0.5, 0.5, 0.5),
    ),
    "virchow2": ViTConfig(
        patch_size=14,
        embed_dim=1280,
        depth=32,
        num_heads=16,
        mlp_ratio=5.3375,
        ffn="swiglu",
        num_reg_tokens=4,
        init_values=1e-5,
        mean=(0.5, 0.5, 0.5),
        std=(0.5, 0.5, 0.5),
    ),
    # Bioptimus H-Optimus-0/1 — ViT-g/14-reg4, custom norm constants
    # (h_optimus_0.py:20-38)
    "h_optimus": ViTConfig(
        patch_size=14,
        embed_dim=1536,
        depth=40,
        num_heads=24,
        num_reg_tokens=4,
        init_values=1e-5,
        mlp_ratio=5.33334,
        ffn="swiglu",
        mean=(0.707223, 0.578729, 0.703617),
        std=(0.211883, 0.230117, 0.177517),
    ),
    # Prov-GigaPath tile encoder — ViT-g/14 (gigapath.py:20-35)
    "gigapath": ViTConfig(
        patch_size=16,
        embed_dim=1536,
        depth=40,
        num_heads=24,
        mlp_ratio=5.33334,
        ffn="swiglu",
        init_values=1e-5,
    ),
    # DinoBloom — dinov2 ViT-S/14 at 224px (pos_embed resized to 257 tokens,
    # reference dinobloom.py:47-49), hematology
    "dino_vits14": ViTConfig(
        patch_size=14, embed_dim=384, depth=12, num_heads=6, init_values=1e-5
    ),
    # RedDino-large — dinov2 ViT-L/14 at 224px (reference reddino.py:40-45
    # loads "Snarcy/RedDino-large", CLS token only)
    "dino_vitl14": ViTConfig(
        patch_size=14, embed_dim=1024, depth=24, num_heads=16, init_values=1e-5
    ),
}
