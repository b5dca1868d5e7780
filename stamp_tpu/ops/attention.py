"""Attention primitives for MIL transformers.

Two families:

* ``multi_head_attention`` — standard softmax attention (equivalent to
  torch ``nn.MultiheadAttention`` as used by the reference ViT,
  src/stamp/modeling/models/vision_tranformer.py:191, 217-228).

* ``alibi_attention`` — the reference's nonstandard spatial-ALiBi attention:
  the learned, running-mean-normalized µm-distance bias is subtracted from the
  attention weights **after** the softmax (vision_tranformer.py:58-74).  That
  post-softmax subtraction is replicated exactly.

Both take an optional ``key_mask`` (True = valid key).  Padded keys are
excluded from the softmax itself, so a bucket-padded forward pass is
numerically identical to an unpadded one — this is how we map the reference's
"full bag, batch 1, no mask" evaluation onto XLA's static shapes.

A fused Pallas flash-attention kernel (ops/flash_attention.py) is used on TPU
for long sequences; this module provides the reference einsum path and the
dispatch logic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_softmax(
    logits: jax.Array, key_mask: jax.Array | None, axis: int = -1
) -> jax.Array:
    """Softmax over ``axis`` where invalid keys get zero weight.

    With ``key_mask=None`` this is a plain softmax.
    """
    if key_mask is None:
        return jax.nn.softmax(logits, axis=axis)
    logits = jnp.where(key_mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=axis)
    return jnp.where(key_mask, weights, 0.0)


def multi_head_attention(
    q: jax.Array,  # [B, H, Q, D]
    k: jax.Array,  # [B, H, K, D]
    v: jax.Array,  # [B, H, K, D]
    *,
    key_mask: jax.Array | None = None,  # [B, K] True = valid
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """Standard scaled-dot-product attention. Returns [B, H, Q, D]."""
    depth = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(depth).astype(q.dtype)
    mask = key_mask[:, None, None, :] if key_mask is not None else None
    weights = masked_softmax(logits, mask)
    if dropout_rate > 0.0 and not deterministic:
        assert dropout_rng is not None
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def pairwise_distances(
    coords_q: jax.Array,  # [B, Q, 2]
    coords_k: jax.Array,  # [B, K, 2]
) -> jax.Array:
    """Euclidean cdist [B, Q, K] (matches torch.cdist p=2)."""
    diff = coords_q[:, :, None, :] - coords_k[:, None, :, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))


def mean_pairwise_distance(
    coords: jax.Array,
    *,
    mask: jax.Array | None = None,  # [B, T] True = valid tile
    block: int = 512,
) -> jax.Array:
    """Mean pairwise Euclidean distance over valid tiles, streamed in row
    blocks.

    Feeds the ALiBi Welford running-mean update for full-slide training:
    the reference materializes the whole [B, T, T] cdist to take its mean
    (vision_tranformer.py:23-31); this computes the identical scalar with
    O(B·block·T) peak memory via lax.scan over row blocks.  With ``mask``
    (bucket-padded bags) only valid–valid pairs contribute.
    """
    b, t, _ = coords.shape
    col_valid = (
        mask.astype(coords.dtype)
        if mask is not None
        else jnp.ones((b, t), coords.dtype)
    )  # [B, T]

    pad = (-t) % block
    padded = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
    n_blocks = padded.shape[1] // block
    row_blocks = padded.reshape(b, n_blocks, block, 2).transpose(1, 0, 2, 3)
    row_valid = jnp.pad(col_valid, ((0, 0), (0, pad)))  # [B, Tp]
    row_valid_blocks = row_valid.reshape(b, n_blocks, block).transpose(1, 0, 2)

    def body(total, inputs):
        rows, rv = inputs  # [B, block, 2], [B, block]
        d = pairwise_distances(rows, coords)  # [B, block, T]
        return total + jnp.sum(d * rv[:, :, None] * col_valid[:, None, :]), None

    total, _ = jax.lax.scan(
        body, jnp.zeros((), coords.dtype), (row_blocks, row_valid_blocks)
    )
    n_pairs = jnp.sum(jnp.sum(col_valid, axis=1) ** 2)
    return total / jnp.maximum(n_pairs, 1.0)


def alibi_attention(
    q: jax.Array,  # [B, H, Q, D]
    k: jax.Array,  # [B, H, K, D]
    v: jax.Array,  # [B, H, K, D]
    *,
    scaled_distances: jax.Array,  # [B, H, Q, K] — already divided by running mean × bias_scale
    key_mask: jax.Array | None = None,  # [B, K] True = valid
    alibi_mask: jax.Array | None = None,  # [B, Q, K] True = do NOT apply ALiBi
) -> jax.Array:
    """Spatial-ALiBi attention with the reference's post-softmax bias.

    weights = softmax(QKᵀ/√d) − scaled_distances   (vision_tranformer.py:65-70)

    Invalid keys are excluded from the softmax and zeroed afterwards, so a
    padded bag behaves exactly like the corresponding unpadded one.
    """
    depth = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(depth).astype(q.dtype)
    mask = key_mask[:, None, None, :] if key_mask is not None else None
    weights = masked_softmax(logits, mask)

    if alibi_mask is not None:
        scaled_distances = jnp.where(
            alibi_mask[:, None, :, :], 0.0, scaled_distances
        )

    weights = weights - scaled_distances
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)

    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)
