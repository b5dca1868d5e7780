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
from jaxtyping import Array, Float

from stamp_tpu.utils.shapecheck import shapechecked


def _segment_dilated(
    q: jax.Array,  # [H, L, D] (heads for this config)
    k: jax.Array,
    v: jax.Array,
    w: int,
    r: int,
    n_valid: int,
) -> jax.Array:
    """Dense attention within segments of length w at dilation r.

    Positions ≥ n_valid are padding: their keys are masked out so real
    queries never attend to them.
    """
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
    if n_valid < L:
        # global position of regrouped element (s, g, j) = s·w + g + j·r
        seg = jax.lax.broadcasted_iota(jnp.int32, (n_seg, r, sub), 0)
        grp = jax.lax.broadcasted_iota(jnp.int32, (n_seg, r, sub), 1)
        off = jax.lax.broadcasted_iota(jnp.int32, (n_seg, r, sub), 2)
        pos = seg * w + grp + off * r  # [n_seg, r, sub]
        logits = jnp.where(
            (pos < n_valid)[None, :, :, None, :], logits, -1e30
        )
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("hsrij,hsrjd->hsrid", weights, vg)

    # back to [H, L, D]
    out = out.transpose(0, 1, 3, 2, 4).reshape(h, L, d)
    return out


@shapechecked
def dilated_attention(
    q: Float[Array, "h l d"],
    k: Float[Array, "h l d"],
    v: Float[Array, "h l d"],
    *,
    segment_lengths: tuple[int, ...],
    dilation_rates: tuple[int, ...],
) -> jax.Array:
    """Distribute heads across (w, r) configs.

    Each config pads only as far as it needs: a sequence shorter than the
    configured segment uses one segment rounded up to the dilation group
    size instead of the full w — the mask semantics (same segment ∧ same
    sparse group) are unchanged, but a 30-tile slide no longer pays for an
    8192-token segment.  Padded keys are masked.
    """
    h, L, d = q.shape
    n_cfg = len(segment_lengths)
    assert len(dilation_rates) == n_cfg
    assert h % n_cfg == 0, "heads must divide evenly across configurations"
    hc = h // n_cfg

    outs = []
    for i, (w, r) in enumerate(zip(segment_lengths, dilation_rates)):
        unit = r * 8  # keeps sub = w/r integral and sublane-aligned
        w_eff = min(w, -(-L // unit) * unit)
        pad = (-L) % w_eff
        sl = slice(i * hc, (i + 1) * hc)
        qi, ki, vi = q[sl], k[sl], v[sl]
        if pad:
            qi = jnp.pad(qi, ((0, 0), (0, pad), (0, 0)))
            ki = jnp.pad(ki, ((0, 0), (0, pad), (0, 0)))
            vi = jnp.pad(vi, ((0, 0), (0, pad), (0, 0)))
        outs.append(_segment_dilated(qi, ki, vi, w_eff, r, L)[:, :L])
    return jnp.concatenate(outs, axis=0)


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
