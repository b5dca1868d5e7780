"""Attention probe, round 3 follow-up: whole-array phases + batched dots.

The shipped fused-qkv kernel (ops/flash_attention.py:_fused_qkv_attn_kernel)
phase-splits per head but still issues 24 separate softmax op-chains and
24 separate QK/PV dots from a Python loop.  This probe measures whether
collapsing the per-head loops into single whole-array ops buys anything:

  * ps_flat   — phase-split, but the softmax phase runs as ONE op chain
                over the full [H·Np, Np] scratch (loop only for the dots).
  * ps_flat2  — ps_flat plus deferred normalization (divide the [Np, dh]
                PV output instead of the [Np, Np] weights).
  * bd        — relayout q/k/v into [H·dh(sublanes), Np] scratch once,
                then per-head 128-aligned sublane slices (transposed dots),
                softmax as one whole-array op chain.
  * nomax     — ps_flat without the running-max subtraction (numerics
                probe only: quantifies what the max-reduce pass costs).

UNI2 shapes: B=256, N=265(→272), H=24, dh=64.  Run on a real chip.
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
    print(
        f"{name:24s} {dt * 1e3:8.2f} ms  ({flops / dt / 1e12:6.1f} TFLOP/s)"
        f"  [compile {compile_t:.0f}s]",
        flush=True,
    )
    return jnp.asarray(outs[-1])


def _pad(qkv):
    b, n, three_dim = qkv.shape
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    return qkv


# --- ps_flat: softmax phase as one whole-array op chain ---------------------
def _ps_flat_kernel(qkv_ref, o_ref, s_s, *, scale, n_valid, num_heads,
                    head_dim, defer_norm, subtract_max):
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    for h in range(num_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, dim + h * head_dim : dim + (h + 1) * head_dim]
        s_s[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    # softmax over ALL heads in one op chain (axis 2 = lanes)
    s = s_s[:, :, :] * scale + bias_row[0:1, :][None]
    if subtract_max:
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
    else:
        p = jnp.exp(s)
    if defer_norm:
        s_s[:, :, :] = p
        l_all = jnp.sum(p, axis=2)  # [H, Np]
    else:
        l = jnp.sum(p, axis=2, keepdims=True)
        s_s[:, :, :] = p / l
        l_all = None
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim]
        o_h = jax.lax.dot_general(
            s_s[h].astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if defer_norm:
            o_h = o_h / l_all[h][:, None]
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = o_h.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "defer_norm", "subtract_max")
)
def ps_flat_mha(qkv, num_heads, defer_norm=False, subtract_max=True):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    qkv = _pad(qkv)
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _ps_flat_kernel, scale=head_dim**-0.5, n_valid=n, num_heads=num_heads,
        head_dim=head_dim, defer_norm=defer_norm, subtract_max=subtract_max,
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


# --- bd: transposed scratch, 128-aligned sublane head slices ----------------
def _bd_kernel(qkv_ref, o_ref, qt_s, kt_s, vt_s, s_s, *, scale, n_valid,
               num_heads, head_dim):
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    # one relayout per operand: heads land on sublanes, 64-aligned
    qt_s[:, :] = qkv[:, :dim].T
    kt_s[:, :] = qkv[:, dim : 2 * dim].T
    vt_s[:, :] = qkv[:, 2 * dim :].T
    for h in range(num_heads):
        qt = qt_s[h * head_dim : (h + 1) * head_dim, :]
        kt = kt_s[h * head_dim : (h + 1) * head_dim, :]
        s_s[h] = jax.lax.dot_general(
            qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    s = s_s[:, :, :] * scale + bias_row[0:1, :][None]
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    s_s[:, :, :] = p / l
    for h in range(num_heads):
        vt = vt_s[h * head_dim : (h + 1) * head_dim, :]
        # o_h^T = v^T @ w^T: [dh, Np]
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
            s_s[h].astype(vt.dtype), vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def bd_mha(qkv, num_heads):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    qkv = _pad(qkv)
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _bd_kernel, scale=head_dim**-0.5, n_valid=n, num_heads=num_heads,
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
            pltpu.VMEM((num_heads, np_, np_), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qkv)
    return out[:, :n]


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    qkv = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * DIM), jnp.bfloat16),
        jax.devices()[0],
    )

    # the relay's AOT compile service ignores LIBTPU_INIT_ARGS (observed
    # 2026-08-20) — forward the scoped-vmem limit per-compile instead
    _jit = functools.partial(
        jax.jit, compiler_options={"xla_tpu_scoped_vmem_limit_kib": "49152"}
    )
    fq = functools.partial(fused_qkv_mha, num_heads=H)
    o0 = timeit("fused_qkv (shipped)", _jit(fq), qkv)
    o1 = timeit("ps_flat (1-op softmax)", _jit(functools.partial(ps_flat_mha, num_heads=H)), qkv)
    o2 = timeit(
        "ps_flat2 (defer norm)",
        _jit(functools.partial(ps_flat_mha, num_heads=H, defer_norm=True)),
        qkv,
    )
    o3 = timeit(
        "nomax (numerics probe)",
        _jit(functools.partial(ps_flat_mha, num_heads=H, subtract_max=False)),
        qkv,
    )
    o4 = timeit("bd (transposed+flat)", _jit(functools.partial(bd_mha, num_heads=H)), qkv)

    for name, o in [("ps_flat", o1), ("ps_flat2", o2), ("nomax", o3), ("bd", o4)]:
        d = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o0.astype(jnp.float32))))
        print(f"max|{name} - fused_qkv| = {d:.5f}")


if __name__ == "__main__":
    main()
