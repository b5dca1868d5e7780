"""Swin Transformer backbone (CTransPath / CHIEF-CTransPath tile encoders).

JAX re-implementation of the architecture the reference vendors from timm
(reference extractor/ctranspath.py:386-1009): Swin-T with patch size 4,
window 7, embed dim 96, depths (2,2,6,2), heads (3,6,12,24), and the
CTransPath paper's convolutional stem (two 3×3 stride-2 conv+BN+ReLU blocks
followed by a 1×1 projection).  Feature output is the mean-pooled final-stage
tokens (768-d), identical to the reference with its ``head = nn.Identity()``.

All shapes are static (224×224 input → 56×56 tokens) so the shifted-window
attention masks are precomputed as constants; window partitioning becomes
reshapes + transposes that XLA fuses for free.

``convert_ctranspath_state_dict`` ports the published torch checkpoint.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.models.vit_image import QuantDense


def _window_partition(x: jax.Array, window: int) -> jax.Array:
    """[B, H, W, C] → [B·nW, window², C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_reverse(x: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """[B·nW, window², C] → [B, H, W, C]."""
    b = x.shape[0] // (h * w // window // window)
    x = x.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(window: int) -> np.ndarray:
    """timm's relative position index for a window (static)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # [2, w, w]
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]  # [2, n, n]
    relative = relative.transpose(1, 2, 0)  # [n, n, 2]
    relative[:, :, 0] += window - 1
    relative[:, :, 1] += window - 1
    relative[:, :, 0] *= 2 * window - 1
    return relative.sum(-1)  # [n, n]


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: [nW, n, n] with 0 / -100.

    Pure numpy: the mask is static, and computing it with jnp ops would
    turn it into a tracer when the caller runs under jit (the module is
    applied inside the extractor's jitted forward).
    """
    img_mask = np.zeros((1, h, w, 1))
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    # numpy re-statement of _window_partition on the static mask
    mask = img_mask.reshape(1, h // window, window, w // window, window, 1)
    mask_windows = mask.transpose(0, 1, 3, 2, 4, 5).reshape(
        -1, window * window
    )
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class _WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    quant: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None) -> jax.Array:
        """x: [B·nW, n, C]; mask: [nW, n, n] or None."""
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        rel_idx = _relative_position_index(self.window).reshape(-1)

        qkv = QuantDense(3 * self.dim, mode=self.quant, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(0, 2, 1, 3) * head_dim**-0.5
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        rel_bias = bias_table[rel_idx].reshape(n, n, self.num_heads)
        attn = attn + rel_bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            n_windows = mask.shape[0]
            attn = attn.reshape(
                b_ // n_windows, n_windows, self.num_heads, n, n
            ) + jnp.asarray(mask)[None, :, None, :, :].astype(attn.dtype)
            attn = attn.reshape(b_, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return QuantDense(self.dim, mode=self.quant, name="proj")(out)


class _SwinBlock(nn.Module):
    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    quant: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, n, c = x.shape
        assert n == h * w

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x.reshape(b, h, w, c)

        if self.shift > 0:
            x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, self.window, self.shift)
        else:
            mask = None

        x_windows = _window_partition(x, self.window)
        attn_windows = _WindowAttention(
            self.dim, self.window, self.num_heads, self.quant, name="attn"
        )(x_windows, mask)
        x = _window_reverse(attn_windows, self.window, h, w)

        if self.shift > 0:
            x = jnp.roll(x, shift=(self.shift, self.shift), axis=(1, 2))

        x = x.reshape(b, n, c)
        x = shortcut + x

        h_ = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h_ = QuantDense(int(self.dim * self.mlp_ratio), mode=self.quant, name="mlp_fc1")(h_)
        h_ = nn.gelu(h_, approximate=False)
        h_ = QuantDense(self.dim, mode=self.quant, name="mlp_fc2")(h_)
        return x + h_


class _PatchMerging(nn.Module):
    dim: int
    input_resolution: tuple[int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(x)


class ConvStem(nn.Module):
    """CTransPath's conv stem: 2× (3×3 s2 conv + BN + ReLU) → 1×1 conv
    (reference ctranspath.py:386-445)."""

    embed_dim: int = 96

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = self.embed_dim // 8
        for i in range(2):
            x = nn.Conv(
                dim,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding=1,
                use_bias=False,
                name=f"conv{i}",
            )(x)
            # inference-mode BatchNorm: running stats baked in as params
            scale = self.param(f"bn{i}_scale", nn.initializers.ones, (dim,))
            bias = self.param(f"bn{i}_bias", nn.initializers.zeros, (dim,))
            mean = self.param(f"bn{i}_mean", nn.initializers.zeros, (dim,))
            var = self.param(f"bn{i}_var", nn.initializers.ones, (dim,))
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            x = nn.relu(x)
            dim *= 2
        x = nn.Conv(self.embed_dim, kernel_size=(1, 1), name="proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class SwinTransformer(nn.Module):
    """Swin-T feature extractor (patch 4, window 7) with ConvStem."""

    img_size: int = 224
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    quant: str = "off"  # QuantDense mode of the block matmuls

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, 3] normalized. Returns mean-pooled features [B, 8·embed]."""
        x = ConvStem(self.embed_dim, name="patch_embed")(x)

        res = self.img_size // 4
        dim = self.embed_dim
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            # When the resolution no longer exceeds the window, the whole
            # stage is one window: no shifting (timm SwinTransformerBlock
            # clamps shift_size to 0 and window_size to the resolution).
            window = min(self.window, res)
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 or res <= self.window else window // 2
                x = _SwinBlock(
                    dim=dim,
                    input_resolution=(res, res),
                    num_heads=heads,
                    window=window,
                    shift=shift,
                    quant=self.quant,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage < len(self.depths) - 1:
                x = _PatchMerging(
                    dim, (res, res), name=f"stage{stage}_downsample"
                )(x)
                res //= 2
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x.mean(axis=1)


def convert_ctranspath_state_dict(sd: dict[str, np.ndarray]) -> dict:
    """Map the CTransPath torch checkpoint onto the flax SwinTransformer."""

    def t(name: str) -> np.ndarray:
        return np.asarray(sd[name])

    params: dict = {}

    # ConvStem: Sequential indices conv(0), bn(1), relu, conv(3), bn(4), relu, conv(6)
    stem: dict = {}
    for i, (conv_idx, bn_idx) in enumerate([(0, 1), (3, 4)]):
        stem[f"conv{i}"] = {
            "kernel": t(f"patch_embed.proj.{conv_idx}.weight").transpose(2, 3, 1, 0)
        }
        stem[f"bn{i}_scale"] = t(f"patch_embed.proj.{bn_idx}.weight")
        stem[f"bn{i}_bias"] = t(f"patch_embed.proj.{bn_idx}.bias")
        stem[f"bn{i}_mean"] = t(f"patch_embed.proj.{bn_idx}.running_mean")
        stem[f"bn{i}_var"] = t(f"patch_embed.proj.{bn_idx}.running_var")
    stem["proj"] = {
        "kernel": t("patch_embed.proj.6.weight").transpose(2, 3, 1, 0),
        "bias": t("patch_embed.proj.6.bias"),
    }
    stem["norm"] = {
        "scale": t("patch_embed.norm.weight"),
        "bias": t("patch_embed.norm.bias"),
    }
    params["patch_embed"] = stem

    depths = (2, 2, 6, 2)
    for stage in range(4):
        for blk in range(depths[stage]):
            p = f"layers.{stage}.blocks.{blk}."
            params[f"stage{stage}_block{blk}"] = {
                "norm1": {
                    "scale": t(p + "norm1.weight"),
                    "bias": t(p + "norm1.bias"),
                },
                "norm2": {
                    "scale": t(p + "norm2.weight"),
                    "bias": t(p + "norm2.bias"),
                },
                "attn": {
                    "relative_position_bias_table": t(
                        p + "attn.relative_position_bias_table"
                    ),
                    "qkv": {
                        "kernel": t(p + "attn.qkv.weight").T,
                        "bias": t(p + "attn.qkv.bias"),
                    },
                    "proj": {
                        "kernel": t(p + "attn.proj.weight").T,
                        "bias": t(p + "attn.proj.bias"),
                    },
                },
                "mlp_fc1": {
                    "kernel": t(p + "mlp.fc1.weight").T,
                    "bias": t(p + "mlp.fc1.bias"),
                },
                "mlp_fc2": {
                    "kernel": t(p + "mlp.fc2.weight").T,
                    "bias": t(p + "mlp.fc2.bias"),
                },
            }
        if stage < 3:
            d = f"layers.{stage}.downsample."
            params[f"stage{stage}_downsample"] = {
                "norm": {
                    "scale": t(d + "norm.weight"),
                    "bias": t(d + "norm.bias"),
                },
                "reduction": {"kernel": t(d + "reduction.weight").T},
            }

    params["norm"] = {"scale": t("norm.weight"), "bias": t("norm.bias")}
    return {"params": params}


def swin_quant_sites(depths=(2, 2, 6, 2)) -> list[tuple[str, ...]]:
    """QuantDense sites of the Swin stages (patch merging / stem stay bf16)."""
    sites = []
    for stage, depth in enumerate(depths):
        for blk in range(depth):
            block = f"stage{stage}_block{blk}"
            sites += [
                (block, "attn", "qkv"),
                (block, "attn", "proj"),
                (block, "mlp_fc1"),
                (block, "mlp_fc2"),
            ]
    return sites
