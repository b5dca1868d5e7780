"""Attention-MIL Vision Transformer (the default tile-level model).

Behavioral port of reference src/stamp/modeling/models/vision_tranformer.py:
linear projection + GELU → prepended CLS token → ``n_layers`` pre-LN blocks
(self-attention + feed-forward residuals) → CLS head.  Attention is either
vanilla multi-head softmax attention or the reference's spatial **ALiBi**
variant whose running-mean distance normalization (`_RunningMeanScaler`
Welford buffer, vision_tranformer.py:15-31) is kept as a mutable flax variable
collection ``alibi_stats``.

TPU-first details:
  * bucket-padded bags are handled through ``key_mask`` (True = valid tile);
    padded keys are excluded from the softmax so results equal the reference's
    unpadded, unmasked full-bag evaluation bit-for-bit in exact arithmetic.
  * the per-head Q/K/V `nn.Linear`s of the reference are fused into single
    dense layers reshaped per head — identical math, one big MXU matmul.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jaxtyping import ArrayLike, Bool, Float

from stamp_tpu.ops.attention import (
    alibi_attention,
    multi_head_attention,
    pairwise_distances,
)
from stamp_tpu.utils.shapecheck import shapechecked

# Above this many tiles, attention switches to the fused Pallas flash
# kernels (O(T·D) memory instead of a [T,T] weight matrix) when running on
# TPU.  Both the vanilla and the ALiBi kernels are differentiable (custom
# VJPs), so this also covers full-slide *training*; the ALiBi Welford
# statistics stream blockwise alongside.
FLASH_ATTENTION_MIN_SEQ = 4096


def _use_flash(train: bool, seq_len: int, *, trainable: bool = False) -> bool:
    if seq_len < FLASH_ATTENTION_MIN_SEQ or (train and not trainable):
        return False
    return jax.default_backend() == "tpu"


class MultiHeadSelfAttention(nn.Module):
    """Vanilla MHA equivalent to torch ``nn.MultiheadAttention`` (batch_first)."""

    dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, D]
        *,
        key_mask: jax.Array | None,
        deterministic: bool,
        sow_weights: bool = False,
    ) -> jax.Array:
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        self.sow("intermediates", "attn_q", q)
        self.sow("intermediates", "attn_k", k)
        if sow_weights:
            # expose attention maps for attention rollout (heatmaps)
            depth = q.shape[-1]
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(depth)
            from stamp_tpu.ops.attention import masked_softmax

            mask = key_mask[:, None, None, :] if key_mask is not None else None
            weights = masked_softmax(logits, mask)
            self.sow("intermediates", "attn_weights", weights)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        elif _use_flash(
            not deterministic,
            x.shape[1],
            # flash has no attention-dropout path; only use it in training
            # when dropout is off (the MIL default)
            trainable=(self.dropout == 0.0 or deterministic),
        ):
            from stamp_tpu.ops.flash_attention import flash_mha

            b_, h_, s_, d_ = q.shape
            km = (
                key_mask
                if key_mask is not None
                else jnp.ones((b_, s_), dtype=bool)
            )
            km = jnp.broadcast_to(km[:, None, :], (b_, h_, s_)).reshape(b_ * h_, s_)
            out = flash_mha(
                q.reshape(b_ * h_, s_, d_),
                k.reshape(b_ * h_, s_, d_),
                v.reshape(b_ * h_, s_, d_),
                km,
            ).reshape(b_, h_, s_, d_)
        else:
            out = multi_head_attention(
                q,
                k,
                v,
                key_mask=key_mask,
                dropout_rate=self.dropout,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
            )
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(self.dim, name="out_proj")(out)


class MultiHeadALiBi(nn.Module):
    """Spatial ALiBi attention (reference vision_tranformer.py:34-154).

    Each head carries a learned ``bias_scale`` (init U[0,1)) and a Welford
    running mean of all pairwise tile distances seen during training; the
    normalized distance bias is subtracted from the attention weights *after*
    the softmax — faithfully nonstandard.
    """

    dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, D]
        *,
        coords: jax.Array,  # [B, T, 2]
        key_mask: jax.Array | None,
        alibi_mask: jax.Array | None,  # [B, T, T] True = no ALiBi on pair
        train: bool,
        sow_weights: bool = False,
    ) -> jax.Array:
        head_dim = self.dim // self.num_heads
        # Per-head q/k/v projections, fused: [D] -> [H * head_dim]
        q = nn.Dense(self.dim, name="q_proj")(x)
        k = nn.Dense(self.dim, name="k_proj")(x)
        v = nn.Dense(self.dim, name="v_proj")(x)

        def to_heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)

        bias_scale = self.param(
            "bias_scale",
            lambda rng: jax.random.uniform(rng, (self.num_heads,)),
        )
        running_mean = self.variable(
            "alibi_stats", "running_mean", lambda: jnp.ones((self.num_heads,))
        )
        items_so_far = self.variable(
            "alibi_stats", "items_so_far", lambda: jnp.ones((self.num_heads,))
        )

        use_flash_path = alibi_mask is None and _use_flash(
            train, x.shape[1], trainable=True
        )
        if not use_flash_path:
            distances = pairwise_distances(coords, coords)  # [B, T, T]

        if train:
            # Welford update (reference vision_tranformer.py:23-31):
            # running_mean ← mean(running_mean + (x − running_mean)/items)
            # = running_mean + (mean(x) − running_mean)/items — so only the
            # scalar mean pairwise distance is needed.  On the flash path it
            # streams in row blocks (no [B, T, T] materialization); on the
            # einsum path it reuses the dense matrix computed for the bias.
            if use_flash_path:
                from stamp_tpu.ops.attention import mean_pairwise_distance

                mean_d = mean_pairwise_distance(coords, mask=key_mask)
            elif key_mask is not None:
                pair_w = (
                    key_mask[:, :, None] & key_mask[:, None, :]
                ).astype(distances.dtype)
                mean_d = jnp.sum(distances * pair_w) / jnp.maximum(
                    jnp.sum(pair_w), 1.0
                )
            else:
                mean_d = jnp.mean(distances)

            rm = running_mean.value  # [H]
            items = items_so_far.value  # [H]
            new_rm = rm + (mean_d - rm) / items
            running_mean.value = new_rm
            items_so_far.value = items + 1.0
            rm_used = new_rm
        else:
            rm_used = running_mean.value

        if use_flash_path:
            # fused kernel: never materializes [T,T] weights or distances
            from stamp_tpu.ops.flash_attention import flash_alibi_mha

            b_, h_, s_, d_ = q.shape
            km = (
                key_mask
                if key_mask is not None
                else jnp.ones((b_, s_), dtype=bool)
            )
            km = jnp.broadcast_to(km[:, None, :], (b_, h_, s_)).reshape(b_ * h_, s_)
            dist_scale = jnp.broadcast_to(
                (bias_scale / rm_used)[None, :], (b_, h_)
            ).reshape(b_ * h_)
            cq = jnp.broadcast_to(
                coords[:, None, :, :], (b_, h_, s_, 2)
            ).reshape(b_ * h_, s_, 2)
            out = flash_alibi_mha(
                q.reshape(b_ * h_, s_, d_),
                k.reshape(b_ * h_, s_, d_),
                v.reshape(b_ * h_, s_, d_),
                cq,
                cq,
                dist_scale,
                km,
            ).reshape(b_, h_, s_, d_)
        else:
            # scaled distance bias per head: dist / running_mean × bias_scale
            scaled = (
                distances[:, None, :, :]
                / rm_used[None, :, None, None]
                * bias_scale[None, :, None, None]
            )
            out = alibi_attention(
                q,
                k,
                v,
                scaled_distances=scaled,
                key_mask=key_mask,
                alibi_mask=alibi_mask,
            )
        self.sow("intermediates", "attn_q", q)
        self.sow("intermediates", "attn_k", k)
        if sow_weights:
            # ALiBi "weights" are not a distribution; expose softmax part only.
            depth = q.shape[-1]
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(depth)
            from stamp_tpu.ops.attention import masked_softmax

            mask = key_mask[:, None, None, :] if key_mask is not None else None
            self.sow("intermediates", "attn_weights", masked_softmax(logits, mask))

        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(self.dim, name="fc")(out)


class FeedForward(nn.Module):
    """LayerNorm → Linear → GELU → Dropout → Linear → Dropout
    (reference vision_tranformer.py:157-169)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    dropout: float
    use_alibi: bool

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        coords: jax.Array,
        key_mask: jax.Array | None,
        alibi_mask: jax.Array | None,
        train: bool,
        sow_weights: bool = False,
    ) -> jax.Array:
        h = nn.LayerNorm(name="attn_norm")(x)
        if self.use_alibi:
            attn_out = MultiHeadALiBi(self.dim, self.heads, name="mhsa")(
                h,
                coords=coords,
                key_mask=key_mask,
                alibi_mask=alibi_mask,
                train=train,
                sow_weights=sow_weights,
            )
        else:
            attn_out = MultiHeadSelfAttention(
                self.dim, self.heads, self.dropout, name="mhsa"
            )(h, key_mask=key_mask, deterministic=not train, sow_weights=sow_weights)
        x = attn_out + x
        x = FeedForward(self.dim, self.mlp_dim, self.dropout, name="ff")(
            x, deterministic=not train
        ) + x
        return x


class VisionTransformer(nn.Module):
    """MIL aggregator over tile-feature bags (reference vision_tranformer.py:298-384)."""

    dim_output: int
    dim_input: int
    dim_model: int = 512
    n_layers: int = 2
    n_heads: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.0
    use_alibi: bool = False

    # Static metadata used by task wrappers
    supports_coords = True

    @nn.compact
    @shapechecked
    def __call__(
        self,
        bags: Float[ArrayLike, "batch tiles feat"],
        *,
        coords: Float[ArrayLike, "batch tiles 2"],
        key_mask: Bool[ArrayLike, "batch tiles"] | None = None,  # True = valid tile
        train: bool = False,
        sow_weights: bool = False,
    ) -> Float[ArrayLike, "batch out"]:
        batch_size = bags.shape[0]

        # project_features: Linear → GELU → Dropout
        x = nn.Dense(self.dim_model, name="project")(bags)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)

        cls_token = self.param(
            "class_token", nn.initializers.normal(stddev=1.0), (self.dim_model,)
        )
        cls = jnp.broadcast_to(cls_token, (batch_size, 1, self.dim_model))
        x = jnp.concatenate([cls, x], axis=1)
        coords = jnp.concatenate(
            [jnp.zeros((batch_size, 1, 2), coords.dtype), coords], axis=1
        )
        if key_mask is not None:
            key_mask = jnp.concatenate(
                [jnp.ones((batch_size, 1), bool), key_mask], axis=1
            )

        for i in range(self.n_layers):
            x = TransformerBlock(
                dim=self.dim_model,
                heads=self.n_heads,
                mlp_dim=self.dim_feedforward,
                dropout=self.dropout,
                use_alibi=self.use_alibi,
                name=f"block_{i}",
            )(
                x,
                coords=coords,
                key_mask=key_mask,
                alibi_mask=None,
                train=train,
                sow_weights=sow_weights,
            )

        x = nn.LayerNorm(name="norm")(x)
        cls_out = x[:, 0]
        return nn.Dense(self.dim_output, name="head")(cls_out)

    @staticmethod
    def model_params_keys() -> list[str]:
        return [
            "dim_model",
            "n_layers",
            "n_heads",
            "dim_feedforward",
            "dropout",
            "use_alibi",
        ]


def make_vision_transformer(**kwargs: Any) -> VisionTransformer:
    return VisionTransformer(**kwargs)
