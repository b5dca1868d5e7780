"""Barspoon encoder-decoder transformer for multi-target classification.

Behavioral port of reference src/stamp/modeling/models/barspoon.py:30-205
(itself a port of KatherLab/barspoon-transformer): feature projector →
sinusoidal 2-D positional encodings from tile coordinates → transformer
encoder → decoder over one learned class token per target → per-target heads.

The torch ``nn.TransformerEncoderLayer`` / ``DecoderLayer`` semantics with
``norm_first=True`` (pre-LN, ReLU feed-forward) are replicated.
"""

from __future__ import annotations

import re

import flax.linen as nn
import jax
import jax.numpy as jnp
from jaxtyping import ArrayLike, Bool, Float

from stamp_tpu.utils.shapecheck import shapechecked

from stamp_tpu.ops.attention import multi_head_attention


def sanitize(x: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", x)


class _MHA(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(
        self,
        q_in: jax.Array,
        kv_in: jax.Array,
        *,
        key_mask: jax.Array | None = None,
    ) -> jax.Array:
        head_dim = self.dim // self.heads

        def to_heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        q = to_heads(nn.Dense(self.dim, name="q")(q_in))
        k = to_heads(nn.Dense(self.dim, name="k")(kv_in))
        v = to_heads(nn.Dense(self.dim, name="v")(kv_in))
        out = multi_head_attention(q, k, v, key_mask=key_mask)
        b, h, s, d = out.shape
        return nn.Dense(self.dim, name="out")(out.transpose(0, 2, 1, 3).reshape(b, s, h * d))


class _EncoderLayer(nn.Module):
    dim: int
    heads: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x: jax.Array, *, key_mask: jax.Array | None) -> jax.Array:
        h = nn.LayerNorm(name="norm1")(x)
        x = x + _MHA(self.dim, self.heads, name="self_attn")(h, h, key_mask=key_mask)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.dim_feedforward, name="ff1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="ff2")(h)
        return x + h


class _DecoderLayer(nn.Module):
    dim: int
    heads: int
    dim_feedforward: int

    @nn.compact
    def __call__(
        self, tgt: jax.Array, memory: jax.Array, *, key_mask: jax.Array | None
    ) -> jax.Array:
        h = nn.LayerNorm(name="norm1")(tgt)
        tgt = tgt + _MHA(self.dim, self.heads, name="self_attn")(h, h)
        h = nn.LayerNorm(name="norm2")(tgt)
        tgt = tgt + _MHA(self.dim, self.heads, name="cross_attn")(
            h, memory, key_mask=key_mask
        )
        h = nn.LayerNorm(name="norm3")(tgt)
        h = nn.Dense(self.dim_feedforward, name="ff1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="ff2")(h)
        return tgt + h


class EncDecTransformer(nn.Module):
    """Reference barspoon.py:104-205."""

    dim_input: int
    target_n_outs: tuple[tuple[str, int], ...]  # ordered (target, n classes) pairs
    d_model: int = 512
    num_encoder_heads: int = 8
    num_decoder_heads: int = 8
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 2048
    positional_encoding: bool = True

    supports_coords = True

    @nn.compact
    @shapechecked
    def __call__(
        self,
        tile_tokens: Float[ArrayLike, "batch tiles feat"],
        *,
        coords: Float[ArrayLike, "batch tiles 2"],
        key_mask: Bool[ArrayLike, "batch tiles"] | None = None,
        train: bool = False,
        **_: object,
    ) -> dict[str, jax.Array]:
        batch_size = tile_tokens.shape[0]

        x = nn.Dense(self.d_model, name="projector")(tile_tokens)
        x = nn.relu(x)

        if self.positional_encoding:
            # Reference barspoon.py:173-186: sinusoidal encoding of the raw
            # tile positions; d_model//4 frequencies × {x,y} × {sin,cos}.
            d_model = x.shape[-1]
            freqs = 100_000 ** (
                jnp.arange(d_model // 4, dtype=x.dtype) / d_model
            )
            scaled = coords[..., None] / freqs  # [B, T, 2, d_model//4]
            pe = jnp.concatenate(
                [
                    jnp.sin(scaled).reshape(*scaled.shape[:-2], -1),
                    jnp.cos(scaled).reshape(*scaled.shape[:-2], -1),
                ],
                axis=-1,
            )
            x = x + pe

        for i in range(self.num_encoder_layers):
            x = _EncoderLayer(
                self.d_model,
                self.num_encoder_heads,
                self.dim_feedforward,
                name=f"encoder_{i}",
            )(x, key_mask=key_mask)

        class_tokens = jnp.stack(
            [
                self.param(
                    f"class_token_{sanitize(t)}",
                    lambda rng, shape=None: jax.random.uniform(rng, (self.d_model,)),
                )
                for t, _n in self.target_n_outs
            ]
        )  # [n_targets, d_model]
        tgt = jnp.broadcast_to(
            class_tokens[None, ...], (batch_size, *class_tokens.shape)
        )

        for i in range(self.num_decoder_layers):
            tgt = _DecoderLayer(
                self.d_model,
                self.num_decoder_heads,
                self.dim_feedforward,
                name=f"decoder_{i}",
            )(tgt, x, key_mask=key_mask)

        logits = {
            target_label: nn.Dense(n_out, name=f"head_{sanitize(target_label)}")(
                tgt[:, i]
            )
            for i, (target_label, n_out) in enumerate(self.target_n_outs)
        }
        return logits

    @staticmethod
    def model_params_keys() -> list[str]:
        return [
            "d_model",
            "num_encoder_heads",
            "num_decoder_heads",
            "num_encoder_layers",
            "num_decoder_layers",
            "dim_feedforward",
            "positional_encoding",
        ]
