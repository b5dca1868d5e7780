"""Slide-encoder architectures: TITAN, GigaPath LongNet, PRISM, COBRA,
MADELEINE.

The reference consumes these as opaque upstream packages / HF
``trust_remote_code`` models (reference encoding/encoder/{titan,gigapath,
prism,cobra,madeleine}.py); in a zero-egress environment the architectures
are re-implemented here TPU-first from their publications:

* TITAN  (Ding et al. 2024)  — ViT over CONCH1.5 patch features on the tile
  grid with 2-D ALiBi distance bias; CLS-token slide embedding (768-d).
* GigaPath slide encoder (Xu et al. 2024) — LongNetViT: 12 layers / 768-d
  dilated attention (ops/dilated_attention.py) over tile embeddings with
  coordinate sin-cos position embeddings; mean-pooled output.
* PRISM  (Shaikovski et al. 2024) — Perceiver resampler: learned latents
  cross-attend to Virchow-full tile embeddings; mean latent = 1280-d
  ``image_embedding``.
* COBRA  (Lenz, Neidlinger et al. 2024) — Mamba2 mixer (ops/ssd.py) over
  projected tile features + gated-attention pooling; returns the
  attention-weighted average of the *raw* input features, so the output
  dimension follows the tile extractor.
* MADELEINE (Jaume et al. 2024) — multi-head gated-attention MIL over CONCH
  features with a post-attention projection (512-d).

Weight porting: each architecture keeps a flat, explicitly-named parameter
tree, and the ``convert_*_state_dict`` functions at the bottom of this file
map a pre-seeded upstream torch state dict onto it 1:1.  The conversion
math (transposes, qkv packing, multiway branches, conv layouts) is
parity-locked against independently written torch oracles in
tests/test_converter_parity.py; the targeted key names follow the upstream
repos' module naming (torchscale for GigaPath, mamba-ssm for COBRA's
mixers, CLAM-style gated attention for COBRA/MADELEINE) with common prefix
variants tolerated, since the gated checkpoints themselves cannot be
downloaded in a zero-egress build.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.ops.dilated_attention import dilated_attention
from stamp_tpu.ops.ssd import Mamba2Block

# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Geometric ALiBi head slopes 2^(-8i/H) (Press et al. 2022)."""
    return np.asarray(
        [2.0 ** (-8.0 * (i + 1) / num_heads) for i in range(num_heads)],
        dtype=np.float32,
    )


class _BiasedAttention(nn.Module):
    """Multi-head attention with an additive logit bias, dense or flash.

    ``bias`` is a dense [1, H, N, N] logit bias (small inputs); for long
    sequences, pass ``flash_coords``/``flash_slopes`` instead and the 2-D
    ALiBi bias is computed blockwise inside the Pallas kernel — no [N, N]
    tensor is ever materialized (the reason TITAN can encode 10⁴–10⁵-tile
    slides on a 16 GB chip).
    """

    dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array | None = None,
        flash_coords: jax.Array | None = None,  # [N, 2]
        flash_slopes: jax.Array | None = None,  # [H]
    ) -> jax.Array:
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if flash_coords is not None:
            from stamp_tpu.ops.flash_attention import flash_alibi2d_mha

            bh = b * self.num_heads
            coords = jnp.broadcast_to(
                flash_coords[None, None], (b, self.num_heads, n, 2)
            ).reshape(bh, n, 2)
            slopes = jnp.tile(flash_slopes, b)
            out = flash_alibi2d_mha(
                q.reshape(bh, n, head_dim),
                k.reshape(bh, n, head_dim),
                v.reshape(bh, n, head_dim),
                coords,
                slopes,
            ).reshape(b, self.num_heads, n, head_dim)
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk",
                q * head_dim**-0.5,
                k,
                preferred_element_type=jnp.float32,
            )
            if bias is not None:
                logits = logits + bias
            weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class _TransformerBlock(nn.Module):
    """Pre-LN block: biased attention + GELU MLP."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array | None = None,
        flash_coords: jax.Array | None = None,
        flash_slopes: jax.Array | None = None,
    ) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + _BiasedAttention(self.dim, self.num_heads, name="attn")(
            h, bias, flash_coords, flash_slopes
        )
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="fc2")(h)


# ---------------------------------------------------------------------------
# TITAN
# ---------------------------------------------------------------------------


class TitanViT(nn.Module):
    """TITAN vision encoder: ViT over patch features with 2-D ALiBi.

    The attention logits of head h get a ``−slope_h · d(i, j)`` penalty where
    d is the Euclidean distance between tiles in grid units — translation
    invariant and extrapolates to arbitrary slide extents.  The CLS token
    attends without penalty.
    """

    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    # above this many tiles the 2-D-ALiBi bias is computed blockwise inside
    # the flash kernel instead of as a dense [H, N, N] tensor
    flash_min_tiles: int = 2048

    @nn.compact
    def __call__(self, feats: jax.Array, grid_coords: jax.Array) -> jax.Array:
        """feats: [N, dim] patch features; grid_coords: [N, 2] integer grid.

        Returns the [dim] slide embedding.
        """
        x = nn.Dense(self.dim, name="patch_embed")(feats)

        cls = self.param("cls_token", nn.initializers.zeros, (1, self.dim))
        x = jnp.concatenate([cls, x], axis=0)[None]  # [1, N+1, dim]

        n = feats.shape[0]
        slopes = jnp.asarray(alibi_slopes(self.num_heads))
        use_flash = (
            n >= self.flash_min_tiles and jax.default_backend() == "tpu"
        )
        if use_flash:
            bias = None
            # CLS coords are a placeholder — the kernel exempts position 0
            flash_coords = jnp.concatenate(
                [jnp.zeros((1, 2), jnp.float32), grid_coords.astype(jnp.float32)]
            )
            flash_slopes = slopes
        else:
            # dense 2-D ALiBi bias [1, H, N+1, N+1]; CLS row/col unpenalised
            coords = grid_coords.astype(jnp.float32)
            delta = coords[:, None, :] - coords[None, :, :]
            dist = jnp.sqrt((delta**2).sum(-1) + 1e-12)  # [N, N]
            dist = jnp.pad(dist, ((1, 0), (1, 0)))  # CLS row/col = 0
            bias = (-slopes[:, None, None] * dist[None])[None]
            flash_coords = flash_slopes = None

        for i in range(self.depth):
            x = _TransformerBlock(self.dim, self.num_heads, name=f"block_{i}")(
                x, bias, flash_coords, flash_slopes
            )
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[0, 0]  # CLS


# ---------------------------------------------------------------------------
# GigaPath slide encoder (LongNetViT)
# ---------------------------------------------------------------------------


def sincos_position_embedding(coords: jax.Array, dim: int) -> jax.Array:
    """2-D sin-cos position embedding from continuous tile coordinates.

    Half the channels encode x, half y, each with geometrically spaced
    frequencies (the ViT/MAE convention, applied to real coordinates instead
    of grid indices).
    """
    half = dim // 2
    quarter = half // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))

    def encode(pos):  # [N] -> [N, half]
        angles = pos[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)

    return jnp.concatenate([encode(coords[:, 0]), encode(coords[:, 1])], axis=-1)


class _LongNetBlock(nn.Module):
    dim: int
    num_heads: int
    segment_lengths: tuple[int, ...]
    dilation_rates: tuple[int, ...]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [N, dim]
        n = x.shape[0]
        head_dim = self.dim // self.num_heads
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * self.dim, name="qkv")(h)
        qkv = qkv.reshape(n, 3, self.num_heads, head_dim).transpose(1, 2, 0, 3)
        out = dilated_attention(
            qkv[0],
            qkv[1],
            qkv[2],
            segment_lengths=self.segment_lengths,
            dilation_rates=self.dilation_rates,
        )  # [H, N, head_dim]
        out = out.transpose(1, 0, 2).reshape(n, self.dim)
        x = x + nn.Dense(self.dim, name="proj")(out)

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="fc2")(h)


class LongNetViT(nn.Module):
    """GigaPath slide encoder: dilated-attention ViT over tile embeddings.

    ``gigapath_slide_enc12l768d``: input 1536-d tile features, 12 layers,
    768-d, coordinate sin-cos position embeddings, mean-pooled output
    (``global_pool=True`` in reference encoding/encoder/gigapath.py:33-38).
    """

    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    segment_lengths: tuple[int, ...] = (128, 512, 2048, 8192)
    dilation_rates: tuple[int, ...] = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, feats: jax.Array, grid_coords: jax.Array) -> jax.Array:
        """feats: [N, 1536]; grid_coords: [N, 2] coordinates in *tile-grid
        units* (pixel coordinates divided by the actual tile stride — the
        caller owns that normalization, since the stride depends on the
        extraction config) → [dim]."""
        x = nn.Dense(self.dim, name="patch_embed")(feats)
        x = x + sincos_position_embedding(
            grid_coords.astype(jnp.float32), self.dim
        ).astype(x.dtype)

        cls = self.param("cls_token", nn.initializers.zeros, (1, self.dim))
        x = jnp.concatenate([cls, x], axis=0)

        for i in range(self.depth):
            x = _LongNetBlock(
                self.dim,
                self.num_heads,
                self.segment_lengths,
                self.dilation_rates,
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[1:].mean(axis=0)  # global average pool over patch tokens


# ---------------------------------------------------------------------------
# PRISM (Perceiver resampler)
# ---------------------------------------------------------------------------


class PrismPerceiver(nn.Module):
    """PRISM slide encoder: latents cross-attend to tile embeddings.

    Virchow-full 2560-d tile embeddings → ``dim``-d latent space; repeated
    [cross-attention → latent self-attention] blocks; the mean latent is the
    ``image_embedding`` the reference reads from ``slide_representations``
    (reference encoding/encoder/prism.py:27-37).
    """

    dim: int = 1280
    input_dim: int = 2560
    num_latents: int = 512
    depth: int = 8
    num_heads: int = 16

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:  # [N, 2560] -> [dim]
        kv = nn.Dense(self.dim, name="input_proj")(feats)[None]  # [1, N, dim]

        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, self.dim)
        )
        x = latents[None]  # [1, L, dim]

        head_dim = self.dim // self.num_heads
        for i in range(self.depth):
            # cross-attention: latents ← tiles
            h = nn.LayerNorm(epsilon=1e-6, name=f"cross_norm_{i}")(x)
            q = nn.Dense(self.dim, name=f"cross_q_{i}")(h)
            k = nn.Dense(self.dim, name=f"cross_k_{i}")(kv)
            v = nn.Dense(self.dim, name=f"cross_v_{i}")(kv)

            def split(t):
                return t.reshape(1, -1, self.num_heads, head_dim).transpose(
                    0, 2, 1, 3
                )

            logits = jnp.einsum(
                "bhqd,bhkd->bhqk",
                split(q) * head_dim**-0.5,
                split(k),
                preferred_element_type=jnp.float32,
            )
            weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, split(v))
            out = out.transpose(0, 2, 1, 3).reshape(1, -1, self.dim)
            x = x + nn.Dense(self.dim, name=f"cross_proj_{i}")(out)

            # latent self-attention + MLP
            x = _TransformerBlock(self.dim, self.num_heads, name=f"block_{i}")(x)

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[0].mean(axis=0)


# ---------------------------------------------------------------------------
# COBRA (Mamba2 + gated-attention pooling)
# ---------------------------------------------------------------------------


class CobraNet(nn.Module):
    """COBRA slide aggregator: Mamba2 mixer → gated attention → weighted
    average of the *raw* tile features.

    COBRA-II accepts tiles from several extractors (CONCH 512 / UNI 1024 /
    H-Optimus-0 1536 / Virchow2 2560 — reference encoding/encoder/
    cobra.py:36-44); one input projection per dimensionality maps into the
    shared 768-d mixer space, and the output keeps the input's
    dimensionality because the pooled vector is a weighted sum of the raw
    input features.
    """

    d_model: int = 768
    depth: int = 2
    input_dims: Sequence[int] = (512, 1024, 1536, 2560)

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:  # [N, D_in] -> [D_in]
        d_in = feats.shape[-1]
        if d_in not in self.input_dims:
            raise ValueError(
                f"COBRA supports input dims {tuple(self.input_dims)}, got {d_in}"
            )
        x = nn.Dense(self.d_model, name=f"embed_{d_in}")(feats)  # [N, 768]

        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-6, name=f"norm_{i}")(x)
            x = x + Mamba2Block(self.d_model, name=f"mamba_{i}")(h)

        h = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        gate_a = jnp.tanh(nn.Dense(384, name="attn_a")(h))
        gate_b = jax.nn.sigmoid(nn.Dense(384, name="attn_b")(h))
        scores = nn.Dense(1, name="attn_c")(gate_a * gate_b)[:, 0]  # [N]
        weights = jax.nn.softmax(scores)
        return weights @ feats  # attention-weighted raw features


# ---------------------------------------------------------------------------
# MADELEINE
# ---------------------------------------------------------------------------


class MadeleineNet(nn.Module):
    """MADELEINE H&E slide encoder: multi-head gated-attention MIL over
    CONCH features with a post-attention projection (512-d embedding)."""

    dim: int = 512
    num_heads: int = 4

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:  # [N, 512] -> [512]
        h = nn.relu(nn.Dense(self.dim, name="pre_proj")(feats))  # [N, dim]

        gate_a = jnp.tanh(nn.Dense(self.dim, name="attn_a")(h))
        gate_b = jax.nn.sigmoid(nn.Dense(self.dim, name="attn_b")(h))
        scores = nn.Dense(self.num_heads, name="attn_c")(gate_a * gate_b)  # [N, H]
        weights = jax.nn.softmax(scores, axis=0)  # over tiles, per head

        head_dim = self.dim // self.num_heads
        pooled = jnp.einsum(
            "nh,nhd->hd", weights, h.reshape(-1, self.num_heads, head_dim)
        ).reshape(self.dim)
        return nn.Dense(self.dim, name="post_proj")(pooled)


# ---------------------------------------------------------------------------
# torch → flax state-dict converters
# ---------------------------------------------------------------------------

_PREFIXES = ("module.", "model.", "slide_encoder.", "vision_encoder.")


def _strip_prefixes(state_dict: dict) -> dict[str, np.ndarray]:
    sd = {}
    for k, v in state_dict.items():
        for p in _PREFIXES:
            if k.startswith(p):
                k = k[len(p) :]
        sd[k] = np.asarray(v)
    return sd


def _t(sd: dict, *names: str) -> np.ndarray:
    for name in names:
        if name in sd:
            return sd[name]
    raise KeyError(f"none of {names} found in checkpoint")


def _ln(sd: dict, *names: str) -> dict:
    return {
        "scale": _t(sd, *(f"{n}.weight" for n in names)),
        "bias": _t(sd, *(f"{n}.bias" for n in names)),
    }


def _linear(sd: dict, *names: str, bias: bool = True) -> dict:
    out = {"kernel": _t(sd, *(f"{n}.weight" for n in names)).T}
    if bias:
        out["bias"] = _t(sd, *(f"{n}.bias" for n in names))
    return out


def _packed_qkv(sd: dict, base: str) -> dict:
    """Pack separate q/k/v projections into one fused Dense kernel/bias."""
    qw = _t(sd, f"{base}.q_proj.weight")
    kw = _t(sd, f"{base}.k_proj.weight")
    vw = _t(sd, f"{base}.v_proj.weight")
    return {
        "kernel": np.concatenate([qw, kw, vw], axis=0).T,
        "bias": np.concatenate(
            [
                _t(sd, f"{base}.q_proj.bias"),
                _t(sd, f"{base}.k_proj.bias"),
                _t(sd, f"{base}.v_proj.bias"),
            ]
        ),
    }


def convert_titan_state_dict(state_dict: dict, depth: int = 12) -> dict:
    """TITAN slide ViT: timm-style block names (``blocks.{i}.norm1 /
    attn.qkv / attn.proj / norm2 / mlp.fc1 / mlp.fc2``), a Linear
    ``patch_embed`` over CONCH1.5 features, CLS token, final ``norm``."""
    sd = _strip_prefixes(state_dict)
    params = {
        "patch_embed": _linear(sd, "patch_embed.proj", "patch_embed"),
        "cls_token": _t(sd, "cls_token").reshape(1, -1),
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"block_{i}"] = {
            "norm1": _ln(sd, p + "norm1"),
            "norm2": _ln(sd, p + "norm2"),
            "attn": {
                "qkv": _linear(sd, p + "attn.qkv"),
                "proj": _linear(sd, p + "attn.proj"),
            },
            "fc1": _linear(sd, p + "mlp.fc1"),
            "fc2": _linear(sd, p + "mlp.fc2"),
        }
    return {"params": params}


def convert_gigapath_slide_state_dict(state_dict: dict, depth: int = 12) -> dict:
    """GigaPath LongNetViT: torchscale encoder naming (``encoder.layers.{i}.
    self_attn_layer_norm / self_attn.{q,k,v,out}_proj / final_layer_norm /
    ffn.{fc1,fc2}``, final ``encoder.layer_norm``) with a Linear
    ``patch_embed`` (1536 → 768) and CLS token; separate q/k/v projections
    are packed into the fused qkv Dense."""
    sd = _strip_prefixes(state_dict)
    params = {
        "patch_embed": _linear(sd, "patch_embed.proj", "patch_embed"),
        "cls_token": _t(sd, "cls_token").reshape(1, -1),
        "norm": _ln(sd, "encoder.layer_norm", "norm"),
    }
    for i in range(depth):
        p = f"encoder.layers.{i}."
        params[f"block_{i}"] = {
            "norm1": _ln(sd, p + "self_attn_layer_norm"),
            "qkv": _packed_qkv(sd, p + "self_attn"),
            "proj": _linear(sd, p + "self_attn.out_proj"),
            "norm2": _ln(sd, p + "final_layer_norm"),
            "fc1": _linear(sd, p + "ffn.fc1"),
            "fc2": _linear(sd, p + "ffn.fc2"),
        }
    return {"params": params}


def convert_prism_state_dict(state_dict: dict, depth: int = 8) -> dict:
    """PRISM Perceiver resampler: ``latents``, a ``media_proj`` Linear
    (2560 → 1280), per layer a cross-attention (``layers.{i}.cross_norm /
    cross_q / cross_k / cross_v / cross_proj``) followed by a latent
    transformer block (``layers.{i}.norm1 / attn.qkv / attn.proj / norm2 /
    mlp.fc1 / mlp.fc2``), final ``norm``; an ``image_resampler.`` prefix is
    tolerated."""
    sd = {}
    for k, v in _strip_prefixes(state_dict).items():
        sd[k.removeprefix("image_resampler.")] = v
    params = {
        "latents": _t(sd, "latents"),
        "input_proj": _linear(sd, "media_proj", "input_proj"),
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        p = f"layers.{i}."
        params[f"cross_norm_{i}"] = _ln(sd, p + "cross_norm")
        params[f"cross_q_{i}"] = _linear(sd, p + "cross_q")
        params[f"cross_k_{i}"] = _linear(sd, p + "cross_k")
        params[f"cross_v_{i}"] = _linear(sd, p + "cross_v")
        params[f"cross_proj_{i}"] = _linear(sd, p + "cross_proj")
        params[f"block_{i}"] = {
            "norm1": _ln(sd, p + "norm1"),
            "norm2": _ln(sd, p + "norm2"),
            "attn": {
                "qkv": _linear(sd, p + "attn.qkv"),
                "proj": _linear(sd, p + "attn.proj"),
            },
            "fc1": _linear(sd, p + "mlp.fc1"),
            "fc2": _linear(sd, p + "mlp.fc2"),
        }
    return {"params": params}


def convert_cobra_state_dict(state_dict: dict, depth: int = 2) -> dict:
    """COBRA: per-dimensionality ``embed.{d}`` Linear heads (a torch
    ModuleDict keyed by the input dim — every head present is converted, so
    one tree serves all supported extractors), ``mamba.layers.{i}.norm`` +
    ``.mixer`` in mamba-ssm's ``Mamba2`` layout (packed ``in_proj`` emitting
    [z, x, B, C, dt], depthwise ``conv1d`` [D, 1, K], ``A_log``/``D``/
    ``dt_bias`` per head, gated-RMSNorm ``norm.weight``, ``out_proj``), and
    a CLAM-style gated attention net (``attention.attention_{a,b}.0`` +
    ``attention.attention_c``)."""
    sd = _strip_prefixes(state_dict)
    params: dict = {
        "norm": _ln(sd, "norm"),
        "attn_a": _linear(sd, "attention.attention_a.0", "attention_a.0"),
        "attn_b": _linear(sd, "attention.attention_b.0", "attention_b.0"),
        "attn_c": _linear(sd, "attention.attention_c", "attention_c"),
    }
    for key in sd:
        if key.startswith("embed.") and key.endswith(".weight"):
            d_in = key.split(".")[1]
            params[f"embed_{d_in}"] = _linear(sd, f"embed.{d_in}")
    for i in range(depth):
        p = f"mamba.layers.{i}."
        params[f"norm_{i}"] = _ln(sd, p + "norm")
        conv_w = _t(sd, p + "mixer.conv1d.weight")  # [conv_dim, 1, K]
        params[f"mamba_{i}"] = {
            "in_proj": _linear(sd, p + "mixer.in_proj", bias=False),
            "conv1d_weight": conv_w[:, 0, :].T,  # → [K, conv_dim]
            "conv1d_bias": _t(sd, p + "mixer.conv1d.bias"),
            "A_log": _t(sd, p + "mixer.A_log"),
            "D": _t(sd, p + "mixer.D"),
            "dt_bias": _t(sd, p + "mixer.dt_bias"),
            "norm_weight": _t(sd, p + "mixer.norm.weight"),
            "out_proj": _linear(sd, p + "mixer.out_proj", bias=False),
        }
    return {"params": params}


def convert_madeleine_state_dict(state_dict: dict) -> dict:
    """MADELEINE: pre-attention projection (``patch_embedder.0``, a Linear →
    ReLU Sequential), CLAM-style gated attention heads and a post-attention
    projection (``post_attention``)."""
    sd = _strip_prefixes(state_dict)
    return {
        "params": {
            "pre_proj": _linear(sd, "patch_embedder.0", "pre_attn.0"),
            "attn_a": _linear(sd, "attention.attention_a.0", "attention_a.0"),
            "attn_b": _linear(sd, "attention.attention_b.0", "attention_b.0"),
            "attn_c": _linear(sd, "attention.attention_c", "attention_c"),
            "post_proj": _linear(sd, "post_attention", "post_proj"),
        }
    }
