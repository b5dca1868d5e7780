"""LongNet-style dilated attention (GigaPath slide-encoder building block).

The reference's GigaPath slide encoder is a 12-layer LongNet over tile
features (reference encoding/encoder/gigapath.py via the ``gigapath``
package; SURVEY.md §2.1 row 25).  This module provides the TPU-native
primitive per Ding et al., *LongNet: Scaling Transformers to 1,000,000,000
Tokens* (2023):

For each (segment length w, dilation r) pair, the sequence is split into
segments of length w; each segment attends only among its own positions with
stride r (r interleaved sparse groups per segment).  Heads are distributed
across the (w, r) configurations, and per-head outputs are combined.  All of
it reshapes into dense batched attention over [n_segments × r, w/r] blocks —
pure MXU matmuls with static shapes.

``dilated_attention_reference`` is the naive masked implementation used by
the tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segment_dilated(
    q: jax.Array,  # [H, L, D] (heads for this config)
    k: jax.Array,
    v: jax.Array,
    w: int,
    r: int,
) -> jax.Array:
    """Dense attention within segments of length w at dilation r."""
    h, L, d = q.shape
    assert L % w == 0, "sequence must be padded to a multiple of the segment"
    n_seg = L // w
    sub = w // r

    def regroup(t):
        # [H, L, D] → [H, n_seg, r, sub, D]: position i of segment s belongs
        # to sparse group i % r at offset i // r
        t = t.reshape(h, n_seg, sub, r, d)
        return t.transpose(0, 1, 3, 2, 4)  # [H, n_seg, r, sub, D]

    qg, kg, vg = regroup(q), regroup(k), regroup(v)

    logits = jnp.einsum(
        "hsrid,hsrjd->hsrij", qg * (d**-0.5), kg, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("hsrij,hsrjd->hsrid", weights, vg)

    # back to [H, L, D]
    out = out.transpose(0, 1, 3, 2, 4).reshape(h, L, d)
    return out


def dilated_attention(
    q: jax.Array,  # [H, L, D]
    k: jax.Array,
    v: jax.Array,
    *,
    segment_lengths: tuple[int, ...],
    dilation_rates: tuple[int, ...],
) -> jax.Array:
    """Distribute heads across (w, r) configs; pad L to the largest segment."""
    h, L, d = q.shape
    n_cfg = len(segment_lengths)
    assert len(dilation_rates) == n_cfg
    assert h % n_cfg == 0, "heads must divide evenly across configurations"
    hc = h // n_cfg

    w_max = max(segment_lengths)
    pad = (-L) % w_max
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))

    outs = []
    for i, (w, r) in enumerate(zip(segment_lengths, dilation_rates)):
        sl = slice(i * hc, (i + 1) * hc)
        outs.append(_segment_dilated(q[sl], k[sl], v[sl], min(w, q.shape[1]), r))
    out = jnp.concatenate(outs, axis=0)
    return out[:, :L]


def dilated_attention_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, *, w: int, r: int
) -> jax.Array:
    """Naive masked implementation of one (w, r) config (test oracle)."""
    h, L, d = q.shape
    idx = jnp.arange(L)
    same_segment = (idx[:, None] // w) == (idx[None, :] // w)
    same_group = (idx[:, None] % r) == (idx[None, :] % r)
    mask = same_segment & same_group

    logits = jnp.einsum("hqd,hkd->hqk", q * (d**-0.5), k)
    logits = jnp.where(mask[None], logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1)
    weights = jnp.where(mask[None], weights, 0.0)
    return jnp.einsum("hqk,hkd->hqd", weights, v)
