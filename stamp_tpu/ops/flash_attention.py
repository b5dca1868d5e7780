"""Fused flash attention (+ spatial-ALiBi variant) as Pallas TPU kernels.

Why: full-slide MIL inference attends over every tile of a slide — up to
~10⁵ tokens.  The einsum path materializes a [T, T] weight matrix (40 GB at
T=10⁵), which is why the reference disables masks "to reduce memory"
(reference models/__init__.py:302-313) and still cannot scale.  These kernels
stream K/V blocks through VMEM with an online softmax, so memory is O(T·D)
and the matmuls stay on the MXU.

The ALiBi variant exploits linearity of the reference's *post-softmax* bias
(vision_tranformer.py:65-70):

    out = (softmax(QKᵀ/√d) − s·D) V = softmax(QKᵀ/√d)V − s·(D V)

so one fused pass accumulates both the online-softmax numerator and the
distance-weighted value sum ``D V`` blockwise — the [T, T] distance matrix is
never materialized either.

Both ``flash_mha`` and ``flash_alibi_mha`` carry custom VJPs (standard
flash backward with probabilities recomputed blockwise from the saved
log-sum-exp; the ALiBi bias branch's ``D·V`` pullback reuses the
distance-weighted-sum kernel transposed), so full-slide *training* is
O(T·D) memory too.  The ALiBi Welford statistics stream through
``ops.attention.mean_pairwise_distance`` during training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jaxtyping import Array, Bool, Float

from stamp_tpu.utils.shapecheck import shapechecked

_NEG_INF = -1e30

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(
    q_ref,  # [1, Bq, D]
    k_ref,  # [1, Bk, D]
    v_ref,  # [1, Bk, D]
    mask_ref,  # [1, 8, Bk] float (1 = valid; sublane-replicated for Mosaic)
    o_ref,  # [1, Bq, D]
    lse_ref,  # [1, 8, Bq] log-sum-exp per query row (sublane-replicated)
    m_scratch,  # [Bq, 128]
    l_scratch,  # [Bq, 128]
    acc_scratch,  # [Bq, D]
    *,
    scale: float,
    n_k_blocks: int,
):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0, 0]  # [Bk]

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Bq, Bk]
    s = jnp.where(mask[None, :] > 0, s, _NEG_INF)

    m_prev = m_scratch[:, :1]  # [Bq, 1]
    l_prev = l_scratch[:, :1]

    m_cur = jnp.max(s, axis=1, keepdims=True)  # [Bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)  # [Bq, Bk]
    alpha = jnp.exp(m_prev - m_new)  # [Bq, 1]

    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(k_idx == n_k_blocks - 1)
    def _final():
        l = l_scratch[:, :1]
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_row = m_scratch[:, 0] + jnp.log(jnp.maximum(l_scratch[:, 0], 1e-30))
        lse_ref[0] = jnp.broadcast_to(lse_row[None, :], lse_ref.shape[1:])


def _flash_forward(q, k, v, mask_f, *, scale, block_q, block_k):
    """Padded, block-aligned forward; returns (out, lse)."""
    bh, q_len, d = q.shape
    n_q = q_len // block_q
    n_k = k.shape[1] // block_k
    kernel = functools.partial(_flash_kernel, scale=scale, n_k_blocks=n_k)
    return pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 8, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, q_len), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, mask_f)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, mask_ref, dq_ref,
    dq_scratch, *, scale: float, n_k_blocks: int,
):
    """dQ = scale · Σ_j dS_ij K_j with dS = P ∘ (dO Vᵀ − D)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0, 0]  # [Bq]
    dvec = dvec_ref[0, 0]  # [Bq]
    mask = mask_ref[0, 0]  # [Bk]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :] > 0, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])  # [Bq, Bk]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dvec[:, None]) * scale
    dq_scratch[:] = dq_scratch[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_k_blocks - 1)
    def _final():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, mask_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch, *, scale: float, n_q_blocks: int,
):
    """dV = Pᵀ dO ; dK = scale · dSᵀ Q, accumulated over query blocks."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0, 0]
    dvec = dvec_ref[0, 0]
    mask = mask_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :] > 0, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])  # [Bq, Bk]
    dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dvec[:, None]) * scale
    dk_scratch[:] = dk_scratch[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_q_blocks - 1)
    def _final():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(q, k, v, mask_f, block_q, block_k):
    out, _ = _flash_forward(
        q, k, v, mask_f, scale=q.shape[-1] ** -0.5,
        block_q=block_q, block_k=block_k,
    )
    return out


def _flash_core_fwd(q, k, v, mask_f, block_q, block_k):
    out, lse = _flash_forward(
        q, k, v, mask_f, scale=q.shape[-1] ** -0.5,
        block_q=block_q, block_k=block_k,
    )
    return out, (q, k, v, mask_f, out, lse)


def _flash_core_bwd(block_q, block_k, residuals, do):
    q, k, v, mask_f, out, lse = residuals
    bh, q_len, d = q.shape
    scale = d**-0.5
    n_q = q_len // block_q
    n_k = k.shape[1] // block_k

    # D_i = Σ_d dO_id · O_id (the softmax-normalization correction term),
    # sublane-replicated to satisfy Mosaic block-divisibility like the mask
    dvec = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dvec = jnp.broadcast_to(dvec[:, None, :], (bh, 8, q_len))

    q_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),  # q
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),  # k
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),  # v
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),  # do
        pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),  # lse
        pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),  # dvec
        pl.BlockSpec((1, 8, block_k), lambda b, i, j: (b, 0, j)),  # mask
    ]
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, n_k_blocks=n_k),
        grid=(bh, n_q, n_k),
        in_specs=q_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse, dvec, mask_f)

    kv_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),  # q
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),  # k
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),  # v
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),  # do
        pl.BlockSpec((1, 8, block_q), lambda b, j, i: (b, 0, i)),  # lse
        pl.BlockSpec((1, 8, block_q), lambda b, j, i: (b, 0, i)),  # dvec
        pl.BlockSpec((1, 8, block_k), lambda b, j, i: (b, 0, j)),  # mask
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, n_q_blocks=n_q),
        grid=(bh, n_k, n_q),
        in_specs=kv_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse, dvec, mask_f)

    return dq, dk, dv, None  # mask is not differentiable


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
@shapechecked
def flash_mha(
    q: Float[Array, "bh q d"],
    k: Float[Array, "bh k d"],
    v: Float[Array, "bh k d"],
    key_mask: Bool[Array, "bh k"],
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Masked flash attention over flattened (batch×head) sequences.

    Differentiable: a custom VJP recomputes the probabilities blockwise from
    the saved log-sum-exp (the standard flash backward), so full-slide
    *training* never materializes a [T, T] matrix either.
    """
    bh, q_len, d = q.shape
    k_len = k.shape[1]

    q_pad = (-q_len) % block_q
    k_pad = (-k_len) % block_k
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, k_pad), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, k_pad)))
    # Mosaic wants the last-two block dims divisible by (8, 128): replicate
    # the mask across an 8-wide sublane dim.
    mask_f = jnp.broadcast_to(
        key_mask.astype(jnp.float32)[:, None, :], (bh, 8, k.shape[1])
    )

    out = _flash_core(q, k, v, mask_f, block_q, block_k)
    return out[:, :q_len]


def _flash_prebias_kernel(
    q_ref,  # [1, Bq, D]
    k_ref,  # [1, Bk, D]
    v_ref,  # [1, Bk, D]
    cq_ref,  # [1, Bq, 128] coords (xy in lanes 0..1)
    ck_ref,  # [1, Bk, 128]
    slope_ref,  # [1, 8, 128] per-(batch·head) ALiBi slope in [0, 0]
    o_ref,  # [1, Bq, D]
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    scale: float,
    n_k_blocks: int,
    block_q: int,
    block_k: int,
    n_valid: int,
    exempt_first: bool,
):
    """Flash attention with a *pre-softmax* ALiBi distance bias
    ``logits −= slope · euclid(coords_i, coords_j)``.

    Used by the TITAN slide encoder (2-D ALiBi over the tile grid): the
    [N, N] bias matrix is computed blockwise from the coordinates and never
    materialized.  ``exempt_first`` zeroes the bias on the first global
    row/column (the CLS token attends and is attended without penalty);
    keys ≥ ``n_valid`` (padding) are masked.
    """
    q_idx = pl.program_id(1)
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    slope = slope_ref[0, 0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Bq, Bk]

    # blockwise pairwise distances via exact per-axis differences (VPU)
    cq = cq_ref[0]
    ck = ck_ref[0]
    dx = cq[:, 0:1] - ck[:, 0:1].T
    dy = cq[:, 1:2] - ck[:, 1:2].T
    dist = jnp.sqrt(dx * dx + dy * dy)

    row_pos = q_idx * block_q + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 0
    )
    col_pos = k_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1
    )
    bias = -slope * dist
    if exempt_first:
        bias = jnp.where((row_pos == 0) | (col_pos == 0), 0.0, bias)
    s = s + bias
    s = jnp.where(col_pos < n_valid, s, _NEG_INF)

    m_prev = m_scratch[:, :1]
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(k_idx == n_k_blocks - 1)
    def _final():
        l = l_scratch[:, :1]
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("exempt_first", "block_q", "block_k")
)
@shapechecked
def flash_alibi2d_mha(
    q: Float[Array, "bh n d"],
    k: Float[Array, "bh n d"],
    v: Float[Array, "bh n d"],
    coords: Float[Array, "bh n 2"],
    slopes: Float[Array, "bh"],
    *,
    exempt_first: bool = True,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Pre-softmax 2-D-ALiBi flash attention (TITAN slide encoder)."""
    bh, n, d = q.shape
    scale = d**-0.5

    import math

    # q and k share the sequence here, so the padded length must be a
    # multiple of BOTH block sizes or trailing keys would never be visited
    pad = (-n) % math.lcm(block_q, block_k)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
    np_ = q.shape[1]

    c128 = jnp.pad(coords.astype(jnp.float32), ((0, 0), (0, 0), (0, 126)))
    slope_rep = jnp.broadcast_to(
        slopes.astype(jnp.float32)[:, None, None], (bh, 8, 128)
    )

    n_q = np_ // block_q
    n_k = np_ // block_k
    kernel = functools.partial(
        _flash_prebias_kernel,
        scale=scale,
        n_k_blocks=n_k,
        block_q=block_q,
        block_k=block_k,
        n_valid=n,
        exempt_first=exempt_first,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, 128), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, np_, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, c128, c128, slope_rep)
    return out[:, :n]


def _fused_qkv_attn_kernel_interleaved(
    qkv_ref,  # [1, Np, 3·H·D]
    o_ref,  # [1, Np, H·D]
    *,
    scale: float,
    n_valid: int,
    num_heads: int,
    head_dim: int,
):
    """Interleaved per-head variant: one [Np, Np] score matrix live at a
    time.  Used when the phase-split scratch (H·Np² f32) would not fit
    VMEM (large tile sizes)."""
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, _NEG_INF).astype(jnp.float32)
    for h in range(num_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, dim + h * head_dim : dim + (h + 1) * head_dim]
        v = qkv[:, 2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_row[0:1, :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        w = (p / l).astype(v.dtype)
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
            w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _fused_qkv_attn_kernel(
    qkv_ref,  # [1, Np, 3·H·D] — packed Dense output, heads folded in lanes
    o_ref,  # [1, Np, H·D]
    s_scratch,  # [H, Np, Np] f32 — per-head score matrices
    *,
    scale: float,
    n_valid: int,
    num_heads: int,
    head_dim: int,
):
    """All-head softmax attention for one batch item, straight off the packed
    qkv projection.

    Head slicing happens in VMEM (64-lane offsets), so HBM never sees the
    [B, H, N, D] relayout *or* the [N, N] score matrices.  ``n_valid`` is a
    compile-time constant → no mask tensor.

    The per-head work is phase-split — all QKᵀ dots, then all softmaxes,
    then all PV dots — so each phase issues a run of independent same-kind
    ops the scheduler can pipeline across the MXUs / the VPU (measured 12%
    faster than interleaving the phases per head; scripts/attn_probe.py).
    """
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    # key-padding mask folded into one fused scale+bias pass over the scores
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, _NEG_INF).astype(jnp.float32)
    for h in range(num_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, dim + h * head_dim : dim + (h + 1) * head_dim]
        s_scratch[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    for h in range(num_heads):
        s = s_scratch[h] * scale + bias_row[0:1, :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        # divide in f32 — same order as the einsum path
        # (softmax f32 → bf16 → PV matmul)
        s_scratch[h] = p / l
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim]
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
            s_scratch[h].astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
@shapechecked
def fused_qkv_mha(
    qkv: Float[Array, "b n three_dim"], num_heads: int
) -> Float[Array, "b n dim"]:
    """Fused multi-head attention over a packed qkv tensor.

    The hot path of the tile-extractor ViTs (N ≈ 265 tokens per 224px tile;
    the reference runs flash-attn/xformers here, SURVEY.md §2.2).  The
    unfused einsum path materializes [B, H, N, N] float32 scores in HBM every
    layer (~1.7 GB write+read per ViT-H layer at batch 256), measured as
    ~half the forward time on v5e (scripts/perf_probe.py).  Here one grid
    step = one batch item: all heads' attention runs in VMEM, and HBM
    traffic is exactly qkv in + attention-out out.

    Args:
        qkv: [B, N, 3·dim] packed projection, lane order [q | k | v], each
            ``dim`` wide with heads contiguous (timm qkv convention).
        num_heads: number of attention heads; dim % num_heads == 0.

    Returns: [B, N, dim] attention output (pre-proj).
    """
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    scale = head_dim**-0.5

    n_pad = (-n) % 8  # sublane alignment; lanes are padded by Mosaic
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]

    # phase-split needs H·Np·pad128(Np) f32 of VMEM scratch; fall back to
    # the interleaved kernel when the TOTAL working set (scratch plus the
    # double-buffered qkv-in and out blocks) would crowd VMEM.  Budget is
    # conservative (32 MiB of the ~128 MiB physical) so it holds under the
    # default scoped-vmem configuration, not just the tuned bench env.
    lanes = -(-np_ // 128) * 128
    scratch_bytes = num_heads * np_ * lanes * 4
    io_bytes = 2 * np_ * (three_dim + dim) * qkv.dtype.itemsize
    if scratch_bytes + io_bytes <= 32 * 1024 * 1024:
        kernel = functools.partial(
            _fused_qkv_attn_kernel,
            scale=scale,
            n_valid=n,
            num_heads=num_heads,
            head_dim=head_dim,
        )
        scratch_shapes = [pltpu.VMEM((num_heads, np_, np_), jnp.float32)]
    else:
        kernel = functools.partial(
            _fused_qkv_attn_kernel_interleaved,
            scale=scale,
            n_valid=n,
            num_heads=num_heads,
            head_dim=head_dim,
        )
        scratch_shapes = []
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # batch items are independent: parallel semantics lets Mosaic
            # reorder/pipeline grid steps (+2%, scripts/attn_probe.py)
            dimension_semantics=("parallel",),
        ),
    )(qkv)
    return out[:, :n]


def _dws_kernel(
    ca_ref,  # [1, Ba, 128] output-side coords (xy in lanes 0..1)
    cb_ref,  # [1, Bb, 128] summation-side coords
    val_ref,  # [1, Bb, D]
    mask_ref,  # [1, 8, Bb] — 1 = include summation index
    o_ref,  # [1, Ba, D]
    acc_scratch,  # [Ba, D]
    *,
    n_b_blocks: int,
):
    """out_a = Σ_b euclid(c_a, c_b) · val_b, accumulated over b blocks."""
    b_idx = pl.program_id(2)

    @pl.when(b_idx == 0)
    def _init():
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # exact per-axis differences on the VPU: the Gram-matrix identity
    # |a|²+|b|²−2a·b cancels catastrophically for nearby µm coordinates
    ca = ca_ref[0]
    cb = cb_ref[0]
    mask = mask_ref[0, 0]
    dx = ca[:, 0:1] - cb[:, 0:1].T
    dy = ca[:, 1:2] - cb[:, 1:2].T
    dist = jnp.sqrt(dx * dx + dy * dy)
    dist = jnp.where(mask[None, :] > 0, dist, 0.0)

    val = val_ref[0]
    acc_scratch[:] = acc_scratch[:] + jax.lax.dot_general(
        dist.astype(val.dtype),
        val,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(b_idx == n_b_blocks - 1)
    def _final():
        o_ref[0] = acc_scratch[:].astype(o_ref.dtype)


def _dist_weighted_sum(coords_a, coords_b, values, mask_f, *, block_a, block_b):
    """[bh, A, D] ← Σ_b euclid(c_a, c_b)·values_b.  Shapes pre-padded.

    Its own transpose: the VJP of ``dacc = D·V`` wrt V is ``Dᵀ·dO``, which is
    this same kernel with the coordinate sides swapped.
    """
    bh, a_len, d = coords_a.shape[0], coords_a.shape[1], values.shape[-1]
    n_a = a_len // block_a
    n_b = coords_b.shape[1] // block_b
    kernel = functools.partial(_dws_kernel, n_b_blocks=n_b)
    return pl.pallas_call(
        kernel,
        grid=(bh, n_a, n_b),
        in_specs=[
            pl.BlockSpec((1, block_a, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_b, 128), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_b, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 8, block_b), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_a, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, a_len, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_a, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(coords_a, coords_b, values, mask_f)


def _flash_alibi_kernel(
    q_ref,  # [1, Bq, D]
    k_ref,  # [1, Bk, D]
    v_ref,  # [1, Bk, D]
    cq_ref,  # [1, Bq, 128]  (xy in cols 0..1, zero-padded)
    ck_ref,  # [1, Bk, 128]
    mask_ref,  # [1, 8, Bk] (sublane-replicated)
    o_ref,  # [1, Bq, D]
    dacc_out_ref,  # [1, Bq, D]  distance-weighted value accumulator output
    lse_ref,  # [1, 8, Bq] log-sum-exp (saved for the VJP)
    m_scratch,
    l_scratch,
    acc_scratch,
    dacc_scratch,
    *,
    scale: float,
    n_k_blocks: int,
):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)
        dacc_scratch[:] = jnp.zeros_like(dacc_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :] > 0, s, _NEG_INF)

    m_prev = m_scratch[:, :1]
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # pairwise Euclidean distances via exact per-axis differences on the VPU:
    # the Gram-matrix identity |a|²+|b|²−2a·b cancels catastrophically for
    # nearby µm-scale coordinates once the cross term hits the MXU.
    cq = cq_ref[0]  # [Bq, 128] — x in lane 0, y in lane 1
    ck = ck_ref[0]  # [Bk, 128]
    dx = cq[:, 0:1] - ck[:, 0:1].T  # [Bq, Bk]
    dy = cq[:, 1:2] - ck[:, 1:2].T
    dist = jnp.sqrt(dx * dx + dy * dy)
    dist = jnp.where(mask[None, :] > 0, dist, 0.0)

    dacc_scratch[:] = dacc_scratch[:] + jax.lax.dot_general(
        dist.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(k_idx == n_k_blocks - 1)
    def _final():
        l = l_scratch[:, :1]
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        dacc_out_ref[0] = dacc_scratch[:].astype(dacc_out_ref.dtype)
        lse_row = m_scratch[:, 0] + jnp.log(jnp.maximum(l_scratch[:, 0], 1e-30))
        lse_ref[0] = jnp.broadcast_to(lse_row[None, :], lse_ref.shape[1:])


def _flash_alibi_forward(q, k, v, cq, ck, mask_f, *, scale, block_q, block_k):
    """Padded fused pass → (softmax_out, dacc = D·V, lse)."""
    bh, q_len, d = q.shape
    n_q = q_len // block_q
    n_k = k.shape[1] // block_k
    kernel = functools.partial(_flash_alibi_kernel, scale=scale, n_k_blocks=n_k)
    return pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, 128), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 8, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_len, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, 8, q_len), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, cq, ck, mask_f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _alibi_core(q, k, v, cq, ck, dist_scale, mask_f, block_q, block_k):
    out_sm, dacc, _ = _flash_alibi_forward(
        q, k, v, cq, ck, mask_f,
        scale=q.shape[-1] ** -0.5, block_q=block_q, block_k=block_k,
    )
    return out_sm - dist_scale[:, None, None] * dacc


def _alibi_core_fwd(q, k, v, cq, ck, dist_scale, mask_f, block_q, block_k):
    out_sm, dacc, lse = _flash_alibi_forward(
        q, k, v, cq, ck, mask_f,
        scale=q.shape[-1] ** -0.5, block_q=block_q, block_k=block_k,
    )
    out = out_sm - dist_scale[:, None, None] * dacc
    return out, (q, k, v, cq, ck, dist_scale, mask_f, out_sm, dacc, lse)


def _alibi_core_bwd(block_q, block_k, residuals, do):
    q, k, v, cq, ck, dist_scale, mask_f, out_sm, dacc, lse = residuals
    bh, q_len, d = q.shape
    scale = d**-0.5
    n_q = q_len // block_q
    n_k = k.shape[1] // block_k

    # --- softmax branch: standard flash backward (same kernels as flash_mha)
    dvec = jnp.sum(do.astype(jnp.float32) * out_sm.astype(jnp.float32), axis=-1)
    dvec = jnp.broadcast_to(dvec[:, None, :], (bh, 8, q_len))

    q_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, 8, block_k), lambda b, i, j: (b, 0, j)),
    ]
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, n_k_blocks=n_k),
        grid=(bh, n_q, n_k),
        in_specs=q_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse, dvec, mask_f)

    kv_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, 8, block_q), lambda b, j, i: (b, 0, i)),
        pl.BlockSpec((1, 8, block_q), lambda b, j, i: (b, 0, i)),
        pl.BlockSpec((1, 8, block_k), lambda b, j, i: (b, 0, j)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, n_q_blocks=n_q),
        grid=(bh, n_k, n_q),
        in_specs=kv_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse, dvec, mask_f)

    # --- post-softmax bias branch: out -= dist_scale · (D V)
    ddist_scale = -jnp.sum(
        do.astype(jnp.float32) * dacc, axis=(1, 2)
    ).astype(dist_scale.dtype)
    # dV_bias = −dist_scale · Dᵀ dO (the D·V kernel with coord sides swapped);
    # masked keys contribute nothing to dacc, so zero their v gradients
    all_valid = jnp.ones((bh, 8, q_len), jnp.float32)
    dv_bias = _dist_weighted_sum(
        ck, cq, (do * dist_scale[:, None, None]).astype(do.dtype), all_valid,
        block_a=block_k, block_b=block_q,
    )
    key_valid = mask_f[:, 0, :, None] > 0  # [bh, K, 1]
    dv = dv - jnp.where(key_valid, dv_bias, 0.0).astype(dv.dtype)

    return dq, dk, dv, None, None, ddist_scale, None


_alibi_core.defvjp(_alibi_core_fwd, _alibi_core_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_alibi_mha(
    q: jax.Array,  # [BH, Q, D]
    k: jax.Array,  # [BH, K, D]
    v: jax.Array,  # [BH, K, D]
    coords_q: jax.Array,  # [BH, Q, 2]
    coords_k: jax.Array,  # [BH, K, 2]
    dist_scale: jax.Array,  # [BH] — bias_scale / running_mean per (batch, head)
    key_mask: jax.Array,  # [BH, K] bool
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Fused spatial-ALiBi attention (post-softmax distance bias).

    Differentiable: the softmax branch uses the standard flash backward and
    the bias branch's ``D·V`` pullback reuses the distance-weighted-sum
    kernel transposed — full-slide ALiBi *training* never materializes a
    [T, T] matrix.  ``dist_scale`` gets a gradient (it is a function of the
    learned per-head bias_scale); coordinates and the mask do not.
    """
    bh, q_len, d = q.shape
    k_len = k.shape[1]

    q_pad = (-q_len) % block_q
    k_pad = (-k_len) % block_k
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0)))
        coords_q = jnp.pad(coords_q, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, k_pad), (0, 0)))
        coords_k = jnp.pad(coords_k, ((0, 0), (0, k_pad), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, k_pad)))
    mask_f = jnp.broadcast_to(
        key_mask.astype(jnp.float32)[:, None, :], (bh, 8, k.shape[1])
    )

    # pad coords' xy into 128 lanes so they tile cleanly
    cq = jnp.pad(coords_q.astype(jnp.float32), ((0, 0), (0, 0), (0, 126)))
    ck = jnp.pad(coords_k.astype(jnp.float32), ((0, 0), (0, 0), (0, 126)))

    out = _alibi_core(q, k, v, cq, ck, dist_scale, mask_f, block_q, block_k)
    return out[:, :q_len]
