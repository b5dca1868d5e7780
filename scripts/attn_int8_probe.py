"""Standalone attention-kernel experiments for the int8 extraction mode.

The int8 batch breakdown (ROADMAP.md) puts attention at ~130 ms of 520 ms
with an estimated 65-70 ms floor.  This probe times kernel variants in
isolation (UNI2 shapes: B=256, N=265→272, H=24, D=64) against the shipped
phase-split kernel:

  A. shipped `fused_qkv_mha` (f32 score scratch, bf16 PV)
  B. bf16 score scratch (halves scratch traffic; exp in f32 via upcast)
  C. B + int8 PV: P is softmax output in [0,1] → fixed-scale int8
     (round(p·127)), V quantized per head with one abs-max pass; the PV
     contraction (depth Np=272) then runs on the int8 MXU path.

Variants live here until one earns its way into ops/flash_attention.py.
Prints one JSON line per variant.
"""

import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache"
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stamp_tpu.ops.flash_attention import fused_qkv_mha  # noqa: E402

B, N, H, D = 256, 265, 24, 64
DIM = H * D
_NEG_INF = -1e30


def _variant_kernel(
    qkv_ref, o_ref, s_scratch, *, scale, n_valid, num_heads, head_dim,
    int8_pv: bool,
):
    dim = num_heads * head_dim
    qkv = qkv_ref[0]
    npad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 1)
    bias_row = jnp.where(col < n_valid, 0.0, _NEG_INF).astype(jnp.float32)
    for h in range(num_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, dim + h * head_dim : dim + (h + 1) * head_dim]
        s_scratch[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(s_scratch.dtype)
    for h in range(num_heads):
        s = s_scratch[h].astype(jnp.float32) * scale + bias_row[0:1, :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        s_scratch[h] = (p / l).astype(s_scratch.dtype)
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim]
        if int8_pv:
            # P ∈ [0,1] → fixed-scale int8; V per-head abs-max int8
            pq = jnp.round(
                s_scratch[h].astype(jnp.float32) * 127.0
            ).astype(jnp.int8)
            v_scale = jnp.max(jnp.abs(v.astype(jnp.float32))) + 1e-8
            vq = jnp.round(v.astype(jnp.float32) * (127.0 / v_scale)).astype(
                jnp.int8
            )
            acc = jax.lax.dot_general(
                pq, vq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = acc.astype(jnp.float32) * (v_scale / (127.0 * 127.0))
        else:
            out = jax.lax.dot_general(
                s_scratch[h].astype(v.dtype), v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = out.astype(o_ref.dtype)


def variant_mha(qkv, num_heads, *, scratch_dtype, int8_pv):
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    head_dim = dim // num_heads
    n_pad = (-n) % 8
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
    np_ = qkv.shape[1]
    kernel = functools.partial(
        _variant_kernel,
        scale=head_dim**-0.5,
        n_valid=n,
        num_heads=num_heads,
        head_dim=head_dim,
        int8_pv=int8_pv,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, np_, three_dim), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, dim), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((num_heads, np_, np_), scratch_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qkv)
    return out[:, :n]


def timeit(fn, qkv, label):
    out = fn(qkv)
    _ = float(out[0, 0, 0])  # compile + sync
    t0 = time.perf_counter()
    outs = [fn(qkv) for _ in range(10)]
    _ = float(outs[-1][0, 0, 0])
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"variant": label, "ms_per_call": round(dt * 1e3, 2)}))
    return out, dt


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.normal(0, 1, (B, N, 3 * DIM)).astype(np.float32), jnp.bfloat16
    )

    base_fn = jax.jit(
        lambda x: fused_qkv_mha(x, H),
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "49152"},
    )
    ref, base_dt = timeit(base_fn, qkv, "A-shipped-f32scratch")

    for label, kw in (
        ("B-bf16-scratch", dict(scratch_dtype=jnp.bfloat16, int8_pv=False)),
        ("C-bf16-scratch+int8PV", dict(scratch_dtype=jnp.bfloat16, int8_pv=True)),
    ):
        fn = jax.jit(
            lambda x, kw=kw: variant_mha(x, H, **kw),
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "49152"},
        )
        out, dt = timeit(fn, qkv, label)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(json.dumps({"variant": label, "max_abs_err_vs_shipped": round(err, 5)}))


if __name__ == "__main__":
    main()
