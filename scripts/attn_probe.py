"""Micro-benchmark for the extractor attention hot path (UNI2 shapes).

Isolates multi-head attention over a packed qkv tensor [B, N, 3·H·dh]
(B=256, N=272, H=24, dh=64) and times layout variants:

  * fused_qkv   — current production kernel (per-head 64-lane slices)
  * einsum      — XLA batched matmul path (relayout to [B,H,N,dh] in HBM)
  * fused_t     — transposed kernel: head slices on sublanes (8-aligned)

FLOPs per call: B·H·2·(2·N²·dh) → reports achieved TFLOP/s.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=49152")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stamp_tpu.ops.flash_attention import fused_qkv_mha

B, N, H, DH = 256, 265, 24, 64
DIM = H * DH
ITERS = 20


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    _ = float(jnp.asarray(outs[-1]).ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    flops = B * H * 2 * (2 * N * N * DH)
    print(f"{name:24s} {dt * 1e3:8.2f} ms  ({flops / dt / 1e12:6.1f} TFLOP/s)  [compile {compile_t:.0f}s]",
          flush=True)
    return jnp.asarray(outs[-1])


# --- variant: einsum over relayouted heads ---------------------------------
@jax.jit
def einsum_mha(qkv):
    b, n, _ = qkv.shape
    qkv_h = qkv.reshape(b, n, 3, H, DH)
    q = qkv_h[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv_h[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv_h[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q * (DH**-0.5), k,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return o.transpose(0, 2, 1, 3).reshape(b, n, DIM)


# --- variant: transposed kernel (head slices on sublanes) -------------------
def _fused_t_kernel(qkv_ref, o_ref, qt_s, kt_s, vt_s, ot_s, *, scale, n_valid,
                    num_heads, head_dim):
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    # one transpose per operand: [Np, dim] -> [dim, Np]; head h then lives on
    # sublanes [h*dh, (h+1)*dh) — 8-aligned slices instead of 64-lane offsets
    qt_s[:] = qkv[:, :dim].T
    kt_s[:] = qkv[:, dim : 2 * dim].T
    vt_s[:] = qkv[:, 2 * dim :].T
    for h in range(num_heads):
        qt = qt_s[h * head_dim : (h + 1) * head_dim, :]
        kt = kt_s[h * head_dim : (h + 1) * head_dim, :]
        vt = vt_s[h * head_dim : (h + 1) * head_dim, :]
        s = jax.lax.dot_general(
            qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Np(q), Np(k)]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        w = (p / l).astype(qkv.dtype)
        # o^T_h = v^T_h @ w^T : [dh, Np] — sublane-aligned write
        ot_s[h * head_dim : (h + 1) * head_dim, :] = jax.lax.dot_general(
            vt, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(ot_s.dtype)
    o_ref[0] = ot_s[:].T


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_t_mha(qkv, num_heads):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    scale = head_dim**-0.5
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _fused_t_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        head_dim=head_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((dim, np_), qkv.dtype),
            pltpu.VMEM((dim, np_), qkv.dtype),
            pltpu.VMEM((dim, np_), qkv.dtype),
            pltpu.VMEM((dim, np_), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qkv)
    return out[:, :n]


# --- variant: VPU-lean kernel: fused scale+mask, deferred row norm ---------
def _fused_opt_kernel(qkv_ref, o_ref, *, scale, n_valid, num_heads, head_dim):
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    # mask+scale fold into ONE elementwise pass over the scores; bias row is
    # built once per item (lanes = key index)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    for h in range(num_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, dim + h * head_dim : dim + (h + 1) * head_dim]
        v = qkv[:, 2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_row[0:1, :]      # one fused VPU pass
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)                     # one pass (sub+exp fused)
        l = jnp.sum(p, axis=1, keepdims=True)
        o_h = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # normalize AFTER the PV matmul: divide [Np, dh] instead of [Np, Np]
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = (
            o_h / l
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_opt_mha(qkv, num_heads):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    scale = head_dim**-0.5
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _fused_opt_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        head_dim=head_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qkv)
    return out[:, :n]


# --- variant: phase-split (all QK dots, then softmaxes, then PV dots) ------
def _fused_ps_kernel(qkv_ref, o_ref, s_s, *, scale, n_valid, num_heads, head_dim):
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    # phase 1: all QK^T dots back-to-back (independent -> MXU pipelining)
    for h in range(num_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, dim + h * head_dim : dim + (h + 1) * head_dim]
        s_s[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    # phase 2: softmaxes (VPU)
    for h in range(num_heads):
        s = s_s[h] * scale + bias_row[0:1, :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        s_s[h] = p / l
    # phase 3: all PV dots
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim]
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
            s_s[h].astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_ps_mha(qkv, num_heads):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    scale = head_dim**-0.5
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _fused_ps_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        head_dim=head_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((num_heads, np_, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qkv)
    return out[:, :n]


# --- variant: 2 items per grid step ----------------------------------------
def _fused_m2_kernel(qkv_ref, o_ref, *, scale, n_valid, num_heads, head_dim):
    dim = num_heads * head_dim
    npad = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    for i in range(2):
        qkv = qkv_ref[i]
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
            o_h = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[i, :, h * head_dim : (h + 1) * head_dim] = (o_h / l).astype(
                o_ref.dtype
            )


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_m2_mha(qkv, num_heads):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    scale = head_dim**-0.5
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _fused_m2_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        head_dim=head_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // 2,),
        in_specs=[pl.BlockSpec((2, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((2, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qkv)
    return out[:, :n]


# --- variant: phase-split with parallel grid semantics ---------------------
@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_pp_mha(qkv, num_heads):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    scale = head_dim**-0.5
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _fused_ps_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        head_dim=head_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((num_heads, np_, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qkv)
    return out[:, :n]


# --- variant: software-pipelined (stagger MXU and VPU work per head) -------
def _fused_sp_kernel(qkv_ref, o_ref, s_s, *, scale, n_valid, num_heads, head_dim):
    """Stage heads so each loop step issues: QK dot for head h, softmax for
    head h-1, PV dot for head h-2 — independent ops the scheduler can run
    on the MXU and VPU concurrently."""
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)

    def qk(h):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, dim + h * head_dim : dim + (h + 1) * head_dim]
        s_s[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def sm(h):
        s = s_s[h] * scale + bias_row[0:1, :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        s_s[h] = p / l

    def pv(h):
        v = qkv[:, 2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim]
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
            s_s[h].astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    for h in range(num_heads + 2):
        if h < num_heads:
            qk(h)
        if 1 <= h < num_heads + 1:
            sm(h - 1)
        if h >= 2:
            pv(h - 2)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def fused_sp_mha(qkv, num_heads):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    scale = head_dim**-0.5
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _fused_sp_kernel, scale=scale, n_valid=n, num_heads=num_heads,
        head_dim=head_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((num_heads, np_, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qkv)
    return out[:, :n]


def main():
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    qkv = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * DIM), jnp.bfloat16),
        jax.devices()[0],
    )

    fq = functools.partial(fused_qkv_mha, num_heads=H)
    o0 = timeit("fused_qkv (current)", jax.jit(fq), qkv)
    o1 = timeit("einsum relayout", einsum_mha, qkv)
    o2 = timeit("fused_t (sublane heads)", functools.partial(fused_t_mha, num_heads=H), qkv)
    o3 = timeit("fused_opt (VPU-lean)", functools.partial(fused_opt_mha, num_heads=H), qkv)
    o4 = timeit("fused_ps (phase-split)", functools.partial(fused_ps_mha, num_heads=H), qkv)
    o5 = timeit("fused_m2 (2 items/step)", functools.partial(fused_m2_mha, num_heads=H), qkv)
    o6 = timeit("fused_pp (parallel grid)", functools.partial(fused_pp_mha, num_heads=H), qkv)
    o7 = timeit("fused_sp (sw-pipelined)", functools.partial(fused_sp_mha, num_heads=H), qkv)

    for name, o in [("einsum", o1), ("fused_t", o2), ("fused_opt", o3),
                    ("fused_ps", o4), ("fused_m2", o5), ("fused_pp", o6),
                    ("fused_sp", o7)]:
        d = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o0.astype(jnp.float32))))
        print(f"max|{name} - fused_qkv| = {d:.5f}")


if __name__ == "__main__":
    main()
