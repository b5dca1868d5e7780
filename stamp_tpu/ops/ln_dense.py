"""Fused LayerNorm→matmul Pallas kernel for the extractor ViT towers.

Every pre-LN transformer block feeds a LayerNorm straight into a matmul
(norm1→qkv, norm2→fc1, and timm SwiGLUPacked's inner norm→fc2).  XLA runs
the LN as a standalone VPU pass that materializes the normalized activation
to HBM before the matmul reads it back; the round-3 LN probe
(scripts/ln_probe.py) showed the cost is the f32 stats/normalize VPU work
itself (~0.55 ms over the traffic floor at [256·272, 1536]), so the only way
to hide it is to fuse it into the *matmul*, where Mosaic overlaps the VPU
prologue with the MXU dots and weight DMAs.

This kernel does exactly that: for each row block the first n-grid step
computes the LN once into VMEM scratch (VPU), and every n step runs one MXU
dot of that scratch against the streamed weight column block, adding the
dense bias in the f32 epilogue.  Measured on the UNI2 hot shapes
(scripts/ln_dense_probe.py, [69632, 1536] bf16): qkv N=4608 — 6.90 ms fused
vs 8.35 ms XLA LN+matmul (1.21×), faster even than XLA's matmul *alone*
(7.02 ms); the standalone LN pass (1.33 ms/site × 48-72 sites) disappears
entirely.

The reference leaves this to torch/cuBLAS (timm `Block`,
reference extractor/uni2.py and friends load stock timm ViTs); there is no
reference counterpart to cite for the fusion itself.

Gradients: a custom VJP recomputes the LN and uses plain-XLA matmul/LN
backward rules — extraction is inference-only, so backward-path speed is
irrelevant, but heatmap jacobians and any future fine-tuning must not trap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Candidate tile sizes, best-measured first (scripts/ln_dense_probe.py:
# bm=bn=1024 beat 1024/512, 512/512 and 2048/512 at the UNI2 shapes).
_BM_CANDIDATES = (1024, 512, 256)
_BN_CANDIDATES = (1024, 512, 256)
# Leave headroom under the ~128 MiB v5e VMEM for Mosaic's double buffering.
_VMEM_BUDGET = 96 * 1024 * 1024


def _pick_tiles(m: int, k: int, n: int, itemsize: int) -> tuple[int, int] | None:
    """Largest (bm, bn) whose working set fits VMEM, or None if the shape
    doesn't tile (fall back to the unfused path)."""
    if k % 128 or n % 128:
        return None
    for bm in _BM_CANDIDATES:
        if m % bm:
            continue
        for bn in _BN_CANDIDATES:
            if n % bn:
                continue
            # x block + xn scratch are grid-invariant along n; the streamed
            # w/out blocks are double-buffered by Mosaic.
            vmem = (
                2 * (bm * k * itemsize)
                + 2 * (k * bn * itemsize)
                + 2 * (bm * bn * 4)
            )
            if vmem <= _VMEM_BUDGET:
                return bm, bn
    return None


def _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, d_ref, o_ref, xn_ref, *, eps):
    # First n step of each row block: LayerNorm once into VMEM scratch (VPU,
    # overlapped by Mosaic with the MXU dots and weight DMAs of other steps).
    @pl.when(pl.program_id(1) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        c = xf - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        y = c * jax.lax.rsqrt(var + eps)
        y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        xn_ref[:] = y.astype(xn_ref.dtype)

    acc = jnp.dot(xn_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (acc + d_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_dense_pallas(x, scale, bias, kernel, dense_bias, eps, bm, bn):
    m, k = x.shape
    n = kernel.shape[1]
    return pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        # the matmul consumes the activation-dtype normalized value, exactly
        # like the unfused formulation (bf16 on the extraction path)
        scratch_shapes=[pltpu.VMEM((bm, k), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(
        x,
        scale.reshape(1, k),
        bias.reshape(1, k),
        kernel,
        dense_bias.reshape(1, n),
    )


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    xhat = c * jax.lax.rsqrt(var + eps)
    return xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def ln_dense_reference(x, scale, bias, kernel, dense_bias=None, *, eps=1e-6):
    """Unfused XLA semantics the kernel is pinned against: f32 LN, cast to
    the activation dtype, f32-accumulated matmul, f32 bias epilogue."""
    y = _ln(x, scale, bias, eps).astype(x.dtype)
    acc = jnp.dot(
        y, kernel.astype(x.dtype), preferred_element_type=jnp.float32
    )
    if dense_bias is not None:
        acc = acc + dense_bias.astype(jnp.float32)
    return acc.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ln_dense_core(x, scale, bias, kernel, dense_bias, eps, bm, bn):
    return _ln_dense_pallas(x, scale, bias, kernel, dense_bias, eps, bm, bn)


def _ln_dense_core_fwd(x, scale, bias, kernel, dense_bias, eps, bm, bn):
    out = _ln_dense_pallas(x, scale, bias, kernel, dense_bias, eps, bm, bn)
    return out, (x, scale, bias, kernel)


def _ln_dense_core_bwd(eps, bm, bn, residuals, dy):
    # Plain-XLA recompute backward: LN stats are cheap next to the matmul
    # grads, and this path only runs under jacobians/fine-tuning.
    x, scale, bias, kernel = residuals
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = c * inv
    # the forward feeds the matmul the *activation-dtype* normalized value
    y = (xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )
    dyf = dy.astype(jnp.float32)
    d_dense_bias = dyf.sum(axis=0).astype(dy.dtype)
    d_kernel = jnp.dot(
        y.T, dy, preferred_element_type=jnp.float32
    ).astype(kernel.dtype)
    dyn = jnp.dot(
        dy, kernel.T.astype(dy.dtype), preferred_element_type=jnp.float32
    )
    d_scale = (dyn * xhat).sum(axis=0).astype(scale.dtype)
    d_bias = dyn.sum(axis=0).astype(bias.dtype)
    dxhat = dyn * scale.astype(jnp.float32)
    dx = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return (dx.astype(x.dtype), d_scale, d_bias, d_kernel, d_dense_bias)


_ln_dense_core.defvjp(_ln_dense_core_fwd, _ln_dense_core_bwd)


def ln_dense(x, scale, bias, kernel, dense_bias=None, *, eps=1e-6):
    """``LayerNorm(x; scale, bias) @ kernel + dense_bias`` as one kernel.

    ``x``: [..., K]; ``scale``/``bias``: [K]; ``kernel``: [K, N];
    ``dense_bias``: [N] or None.  Falls back to the unfused XLA formulation
    when the flattened row count / N don't tile onto the MXU grid (callers
    gate on backend themselves, matching the other fused ops).
    """
    k = x.shape[-1]
    n = kernel.shape[1]
    x2d = x.reshape(-1, k)
    tiles = _pick_tiles(x2d.shape[0], k, n, x.dtype.itemsize)
    if tiles is None:
        out = ln_dense_reference(
            x2d, scale, bias, kernel, dense_bias, eps=eps
        )
    else:
        db = (
            dense_bias
            if dense_bias is not None
            else jnp.zeros((n,), jnp.float32)
        )
        out = _ln_dense_core(x2d, scale, bias, kernel, db, eps, *tiles)
    return out.reshape(*x.shape[:-1], n)


# ---------------------------------------------------------------------------
# int8 variant: LayerNorm → static-scale quantize → int8 MXU dot → dequant
# ---------------------------------------------------------------------------
#
# The int8 extraction path (models/vit_image.py QuantDense) consumes a
# *quantized* activation, so the bf16 ln_dense above can't serve it: the chain
# is LN (f32 VPU) → static-scale quantize → int8 dot → f32 dequant epilogue.
# Unfused, XLA runs LN+quantize as a standalone pass that writes an int8 copy
# of the activation to HBM (~48 ms of the 520 ms UNI2 int8 batch,
# scripts/int8_ablate.py).  Fusing the whole chain into the matmul quantizes
# straight into an int8 VMEM scratch at n-grid step 0 and streams the int8
# weight column blocks through the MXU.  Measured (scripts/
# ln_quant_dense_probe.py, UNI2 int8 hot shapes [69632, 1536]): qkv N=4608 —
# 4.51 ms fused vs 5.69 ms XLA (1.26×, best tiling bm=2048 bn=1024).
#
# Larger row blocks win here than in the bf16 kernel because the int8 scratch
# halves the VMEM cost per row; the candidate list leads with 2048.

_QBM_CANDIDATES = (2048, 1024, 512, 256)
_QBN_CANDIDATES = (1024, 512, 256)


def _pick_quant_tiles(m: int, k: int, n: int, itemsize: int):
    if k % 128 or n % 128:
        return None
    for bm in _QBM_CANDIDATES:
        if m % bm:
            continue
        for bn in _QBN_CANDIDATES:
            if n % bn:
                continue
            # bf16 x block (double-buffered) + int8 scratch (grid-invariant
            # along n) + int8 weight blocks + f32-epilogue out blocks
            vmem = (
                2 * (bm * k * itemsize)
                + bm * k
                + 2 * (k * bn)
                + 2 * (bm * bn * 4)
            )
            if vmem <= _VMEM_BUDGET:
                return bm, bn
    return None


def _ln_quant_dense_kernel(
    x_ref, g_ref, b_ref, sx_ref, w_ref, ws_ref, d_ref, o_ref, xq_ref, *, eps
):
    # First n step of each row block: LN, cast to the activation dtype
    # (matching the unfused QuantDense semantics bit-for-bit), then quantize
    # with the static per-tensor scale straight into int8 VMEM scratch.
    @pl.when(pl.program_id(1) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        c = xf - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        y = c * jax.lax.rsqrt(var + eps)
        y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        y = y.astype(x_ref.dtype).astype(jnp.float32)
        q = jnp.clip(jnp.round(y * (127.0 / sx_ref[0])), -127, 127)
        xq_ref[:] = q.astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (
        acc.astype(jnp.float32) * (sx_ref[0] / 127.0) * ws_ref[:]
        + d_ref[:]
    ).astype(o_ref.dtype)


def ln_quant_dense_reference(
    x, scale, bias, s_x, kernel_q, w_scale, dense_bias=None, *, eps=1e-6
):
    """Unfused XLA semantics the kernel is pinned against, matching the
    QuantDense int8 branch: f32 LN cast to the activation dtype, static-scale
    int8 quantize, int8 dot with i32 accumulation, f32 dequant.  One caveat:
    here (and in the fused kernel) ``dense_bias`` is added in f32 *before*
    the output cast, while the unfused QuantDense branch adds it after
    casting to ``x.dtype`` — up to ~1 ulp of the activation dtype apart
    (measured 5e-7 in f32)."""
    y = _ln(x, scale, bias, eps).astype(x.dtype)
    xq = jnp.clip(
        jnp.round(y.astype(jnp.float32) * (127.0 / s_x)), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = (
        acc.astype(jnp.float32)
        * (s_x / 127.0)
        * w_scale.astype(jnp.float32)
    )
    if dense_bias is not None:
        out = out + dense_bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _ln_quant_dense_pallas(x2d, scale, bias, s_x, kernel_q, w_scale, db, eps, bm, bn):
    m, k = x2d.shape
    n = kernel_q.shape[1]
    return pl.pallas_call(
        functools.partial(_ln_quant_dense_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(
        x2d,
        scale.reshape(1, k).astype(jnp.float32),
        bias.reshape(1, k).astype(jnp.float32),
        jnp.asarray(s_x, jnp.float32).reshape(1),
        kernel_q,
        w_scale.reshape(1, n).astype(jnp.float32),
        db.reshape(1, n).astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_quant_dense_core(x2d, scale, bias, s_x, kernel_q, w_scale, db, eps, bm, bn):
    return _ln_quant_dense_pallas(
        x2d, scale, bias, s_x, kernel_q, w_scale, db, eps, bm, bn
    )


def _ln_quant_dense_core_fwd(x2d, scale, bias, s_x, kernel_q, w_scale, db, eps, bm, bn):
    out = _ln_quant_dense_pallas(
        x2d, scale, bias, s_x, kernel_q, w_scale, db, eps, bm, bn
    )
    return out, (x2d, scale, bias, s_x, kernel_q, w_scale, db)


def _ln_quant_dense_core_bwd(eps, bm, bn, residuals, dy):
    # Differentiate the unfused reference formulation (ln_dense precedent):
    # the round/clip quantize stops gradients to x exactly like the unfused
    # QuantDense int8 branch, so jacobians through an int8 extractor agree
    # between fused and unfused paths instead of trapping on a missing
    # pallas AD rule.
    def ref(x2d, scale, bias, s_x, kernel_q, w_scale, db):
        return ln_quant_dense_reference(
            x2d, scale, bias, s_x, kernel_q, w_scale, db, eps=eps
        )

    _, vjp = jax.vjp(ref, *residuals)
    return vjp(dy)


_ln_quant_dense_core.defvjp(_ln_quant_dense_core_fwd, _ln_quant_dense_core_bwd)


def ln_quant_dense(
    x, scale, bias, s_x, kernel_q, w_scale, dense_bias=None, *, eps=1e-6
):
    """Fused ``int8_dot(quantize(LayerNorm(x)), kernel_q)`` with f32 dequant.

    ``x``: [..., K] activation; ``scale``/``bias``: [K] LN params; ``s_x``:
    scalar static activation scale (calibrated amax with headroom);
    ``kernel_q``: [K, N] int8; ``w_scale``: [N] f32 per-out-channel dequant
    scale; ``dense_bias``: [N] or None.  The production path is
    inference-only; differentiating through it recomputes via the unfused
    reference (custom VJP), whose round/clip quantize blocks gradients to
    ``x`` exactly like the unfused int8 branch.
    """
    k = x.shape[-1]
    n = kernel_q.shape[1]
    x2d = x.reshape(-1, k)
    tiles = _pick_quant_tiles(x2d.shape[0], k, n, x.dtype.itemsize)
    if tiles is None:
        out = ln_quant_dense_reference(
            x2d, scale, bias, s_x, kernel_q, w_scale, dense_bias, eps=eps
        )
    else:
        bm, bn = tiles
        db = (
            dense_bias
            if dense_bias is not None
            else jnp.zeros((n,), jnp.float32)
        )
        out = _ln_quant_dense_core(
            x2d,
            scale,
            bias,
            jnp.asarray(s_x, jnp.float32),
            kernel_q,
            w_scale,
            db,
            eps,
            bm,
            bn,
        )
    return out.reshape(*x.shape[:-1], n)
