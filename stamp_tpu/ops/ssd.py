"""Mamba2 state-space duality (SSD) selective scan, TPU-style.

The reference's COBRA slide encoder depends on the CUDA ``mamba-ssm`` /
``causal-conv1d`` kernels (reference encoding/encoder/cobra.py, SURVEY.md
§2.2).  This module provides the TPU-native primitive: the chunked SSD
formulation of the Mamba2 recurrence

    h_t = exp(Δ_t·A) · h_{t-1} + Δ_t · B_t ⊗ x_t
    y_t = C_tᵀ h_t  (+ D·x_t)

computed as dense block matmuls (intra-chunk) plus an associative scan over
chunk boundary states (inter-chunk) — the layout that maps onto the MXU
instead of a sequential scan.  ``ssd_reference`` is the naive recurrence used
by the tests.

Also provides ``causal_conv1d`` (the depthwise pre-conv of a Mamba block) and
a full ``Mamba2Block`` flax module so upstream COBRA weights can be ported
once available.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jaxtyping import Array, Float

from stamp_tpu.utils.shapecheck import shapechecked


def ssd_reference(
    x: jax.Array,  # [L, H, P]
    dt: jax.Array,  # [L, H]
    A: jax.Array,  # [H] (negative values)
    B: jax.Array,  # [L, N]
    C: jax.Array,  # [L, N]
) -> jax.Array:
    """Naive sequential recurrence (ground truth for tests)."""
    L, H, P = x.shape
    N = B.shape[-1]

    def step(h, inputs):
        x_t, dt_t, b_t, c_t = inputs  # [H,P], [H], [N], [N]
        decay = jnp.exp(dt_t * A)  # [H]
        h = h * decay[:, None, None] + (
            dt_t[:, None, None] * x_t[:, :, None]
        ) * b_t[None, None, :]  # [H, P, N]
        y = jnp.einsum("hpn,n->hp", h, c_t)
        return h, y

    h0 = jnp.zeros((H, P, N), x.dtype)
    _, ys = jax.lax.scan(step, h0, (x, dt, B, C))
    return ys  # [L, H, P]


@shapechecked
def ssd_chunked(
    x: Float[Array, "l h p"],
    dt: Float[Array, "l h"],
    A: Float[Array, "h"],
    B: Float[Array, "l n"],
    C: Float[Array, "l n"],
    *,
    chunk: int = 64,
) -> jax.Array:
    """Chunked SSD: O(L·chunk) matmul work, scan only over L/chunk chunks."""
    L, H, P = x.shape
    N = B.shape[-1]
    pad = (-L) % chunk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, pad), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
        C = jnp.pad(C, ((0, pad), (0, 0)))
    Lp = x.shape[0]
    n_chunks = Lp // chunk

    xc = x.reshape(n_chunks, chunk, H, P)
    dtc = dt.reshape(n_chunks, chunk, H)
    Bc = B.reshape(n_chunks, chunk, N)
    Cc = C.reshape(n_chunks, chunk, N)

    # log-decay within each chunk: a[t] = dt[t]·A  (negative)
    a = dtc * A[None, None, :]  # [nc, chunk, H]
    a_cum = jnp.cumsum(a, axis=1)  # [nc, chunk, H] — cumulative through t
    a_total = a_cum[:, -1]  # [nc, H]

    # --- intra-chunk (strictly causal within chunk) ---
    # L_mat[t, s] = exp(a_cum[t] − a_cum[s]) for s ≤ t else 0
    seg = a_cum[:, :, None, :] - a_cum[:, None, :, :]  # [nc, t, s, H]
    causal = jnp.tril(jnp.ones((chunk, chunk), bool))
    L_mat = jnp.where(causal[None, :, :, None], jnp.exp(seg), 0.0)

    # G[t, s] = C_t · B_s  ;  y_intra[t] = Σ_s≤t G[t,s]·L[t,s]·dt_s·x_s
    G = jnp.einsum("ctn,csn->cts", Cc, Bc)  # [nc, t, s]
    M = G[:, :, :, None] * L_mat  # [nc, t, s, H]
    y_intra = jnp.einsum("ctsh,csh,cshp->cthp", M, dtc, xc)

    # --- chunk-boundary states ---
    # state after chunk c (before scan): S_c = Σ_s exp(a_total − a_cum[s])·dt_s·(x_s ⊗ B_s)
    decay_to_end = jnp.exp(a_total[:, None, :] - a_cum)  # [nc, s, H]
    S = jnp.einsum(
        "csh,csh,cshp,csn->chpn", decay_to_end, dtc, xc, Bc
    )  # [nc, H, P, N]

    # inter-chunk scan: S_prev_{c} = exp(a_total_c)·S_prev_{c-1} + S_c
    decay_chunk = jnp.exp(a_total)  # [nc, H]

    def combine(left, right):
        d_l, s_l = left
        d_r, s_r = right
        return d_l * d_r, s_l * d_r[:, :, None, None] + s_r

    _, S_scan = jax.lax.associative_scan(combine, (decay_chunk, S), axis=0)
    # state entering chunk c = S_scan[c-1]
    S_prev = jnp.concatenate(
        [jnp.zeros_like(S_scan[:1]), S_scan[:-1]], axis=0
    )  # [nc, H, P, N]

    # --- inter-chunk contribution ---
    # y_inter[t] = exp(a_cum[t]) · (C_t · S_prev)
    decay_in = jnp.exp(a_cum)  # [nc, t, H]
    y_inter = jnp.einsum("chpn,ctn,cth->cthp", S_prev, Cc, decay_in)

    y = (y_intra + y_inter).reshape(Lp, H, P)
    return y[:L]


def causal_conv1d(x: jax.Array, weight: jax.Array, bias: jax.Array | None) -> jax.Array:
    """Depthwise causal 1-D convolution.

    x: [L, D]; weight: [K, D]; returns [L, D] with left padding K−1.
    """
    k = weight.shape[0]
    x_pad = jnp.pad(x, ((k - 1, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x_pad[None, :, :],  # NHC → use (N, W, C)
        weight[:, None, :],  # (K, 1, D) KIO with feature groups
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
    )[0]
    if bias is not None:
        out = out + bias
    return out


class Mamba2Block(nn.Module):
    """A Mamba2 mixer block (SSD core + gating), weight-port ready.

    Layout follows mamba-ssm's ``Mamba2``: in_proj → [z, x, B, C, dt],
    causal depthwise conv on (x, B, C), SSD scan, gated RMSNorm, out_proj.
    """

    d_model: int
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    chunk: int = 64

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:  # [L, d_model]
        d_inner = self.expand * self.d_model
        nheads = d_inner // self.headdim

        zxbcdt = nn.Dense(
            2 * d_inner + 2 * self.d_state + nheads, use_bias=False, name="in_proj"
        )(u)
        z, xbc, dt = jnp.split(
            zxbcdt, [d_inner, 2 * d_inner + 2 * self.d_state], axis=-1
        )

        conv_w = self.param(
            "conv1d_weight",
            nn.initializers.lecun_normal(),
            (self.d_conv, d_inner + 2 * self.d_state),
        )
        conv_b = self.param(
            "conv1d_bias", nn.initializers.zeros, (d_inner + 2 * self.d_state,)
        )
        xbc = jax.nn.silu(causal_conv1d(xbc, conv_w, conv_b))
        x, B, C = jnp.split(xbc, [d_inner, d_inner + self.d_state], axis=-1)

        A_log = self.param(
            "A_log", lambda rng: jnp.log(jnp.arange(1, nheads + 1, dtype=jnp.float32))
        )
        D = self.param("D", nn.initializers.ones, (nheads,))
        dt_bias = self.param("dt_bias", nn.initializers.zeros, (nheads,))

        dt = jax.nn.softplus(dt + dt_bias)  # [L, nheads]
        A = -jnp.exp(A_log)  # [nheads]

        x_heads = x.reshape(-1, nheads, self.headdim)
        y = ssd_chunked(x_heads, dt, A, B, C, chunk=self.chunk)
        y = y + D[None, :, None] * x_heads
        y = y.reshape(-1, d_inner)

        # gated RMSNorm (mamba2's norm_before_gate=False layout)
        y = y * jax.nn.silu(z)
        scale = self.param("norm_weight", nn.initializers.ones, (d_inner,))
        y = y * jax.lax.rsqrt(jnp.mean(y * y, axis=-1, keepdims=True) + 1e-5) * scale

        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)
