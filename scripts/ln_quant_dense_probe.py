"""Does fusing LayerNorm→quantize into the int8 matmul pay on the int8 path?

Round-4 context: the bf16 LN→matmul fusion (scripts/ln_dense_probe.py →
ops/ln_dense.py) won 1.21× at the qkv site.  The int8 extraction path still
runs the LN standalone (~48 ms of the 520 ms UNI2 int8 batch,
scripts/int8_ablate.py) because its matmul consumes a *quantized* activation:
the chain is LN (VPU, f32) → static-scale quantize (elementwise) → int8 MXU
dot → f32 dequant epilogue.  XLA fuses the quantize into the LN's epilogue,
but the fused LN+quantize pass still materializes an int8 copy of the
activation to HBM and the stats work stays an un-overlapped VPU pass.

This probe fuses the whole chain into one Pallas kernel: n-grid step 0 of
each row block computes LN and quantizes straight into an int8 VMEM scratch;
every n step runs one int8 MXU dot against the streamed int8 weight
column-block with the f32 dequant (s_x · w_scale) + bias epilogue.

Shapes: UNI2 int8 hot sites, [256·272, 1536] rows → qkv N=4608, fc1 N=8192.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache"
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 256 * 272
K = 1536
EPS = 1e-6
ITERS = 30


def _kernel(x_ref, g_ref, b_ref, sx_ref, w_ref, ws_ref, d_ref, o_ref, xq_ref):
    # step 0 along n: LN + static-scale quantize once into int8 VMEM scratch
    @pl.when(pl.program_id(1) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        c = xf - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        y = c * jax.lax.rsqrt(var + EPS)
        y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        q = jnp.clip(jnp.round(y * (127.0 / sx_ref[0, 0])), -127, 127)
        xq_ref[:] = q.astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (
        acc.astype(jnp.float32) * (sx_ref[0, 0] / 127.0) * ws_ref[:]
        + d_ref[:]
    ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("bm", "bn"))
def fused(x, g, b, sx, wq, ws, d, bm=1024, bn=1024):
    m, k = x.shape
    n = wq.shape[1]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
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
    )(x, g, b, sx.reshape(1, 1), wq, ws.reshape(1, -1), d.reshape(1, -1))


@jax.jit
def baseline(x, g, b, sx, wq, ws, d):
    """The shipped int8 path: XLA LN → static quantize → int8 dot → dequant."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = (c * jax.lax.rsqrt(var + EPS)) * g + b
    xq = jnp.clip(jnp.round(y * (127.0 / sx)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * (sx / 127.0) * ws + d).astype(x.dtype)


@jax.jit
def int8_mm_alone(xq, sx, wq, ws, d):
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * (sx / 127.0) * ws + d).astype(jnp.bfloat16)


def timeit(name, many, flops):
    t0 = time.perf_counter()
    float(many())
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many())
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"  {name:34s} {dt * 1e3:8.2f} ms  ({flops / dt / 1e12:6.1f} TOP/s)"
        f"  [compile {compile_t:.0f}s]",
        flush=True,
    )
    return dt


def chain(step, x, args):
    """fori_loop chain with a non-foldable feedback term (see ln_dense_probe)."""

    @jax.jit
    def many(x):
        def body(_, x):
            y = step(x, *args)
            return x + (1e-6 * y[:, :K]).astype(x.dtype)

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32))

    return lambda: many(x)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(ROWS, K)).astype(np.float32), dtype=jnp.bfloat16
    )
    g = jnp.ones((1, K), jnp.float32)
    b = jnp.zeros((1, K), jnp.float32)
    sx = jnp.asarray(6.0, jnp.float32)

    sites = {"qkv": (3 * K, "qkv  N=4608"), "fc1": (8192, "fc1  N=8192")}
    wanted = sys.argv[1:] or list(sites)
    for n_out, label in (sites[s] for s in wanted):
        wq = jnp.asarray(
            rng.integers(-127, 128, size=(K, n_out)), dtype=jnp.int8
        )
        ws = jnp.full((1, n_out), 2e-4, jnp.float32)
        d = jnp.zeros((1, n_out), jnp.float32)
        flops = 2.0 * ROWS * K * n_out
        print(f"[{label}] rows={ROWS} K={K}")
        want = np.asarray(baseline(x, g, b, sx, wq, ws, d), dtype=np.float32)
        got = np.asarray(fused(x, g, b, sx, wq, ws, d), dtype=np.float32)
        err = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
        print(f"  max rel err fused vs XLA: {err:.2e}")
        t_base = timeit(
            "XLA LN+quant+int8 matmul",
            chain(baseline, x, (g, b, sx, wq, ws, d)),
            flops,
        )
        xq0 = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (127.0 / 6.0)), -127, 127
        ).astype(jnp.int8)

        @jax.jit
        def mm_many(xq=xq0, wq=wq, ws=ws, d=d):
            def body(_, acc):
                y = int8_mm_alone(xq, sx, wq, ws, d)
                return acc + jnp.sum(y[:1, :1].astype(jnp.float32))

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        timeit("int8 matmul alone", lambda: mm_many(), flops)
        best = None
        for bm, bn in ((1024, 1024), (1024, 512), (512, 512), (2048, 1024)):
            try:
                t = timeit(
                    f"fused ln_q_dense bm={bm} bn={bn}",
                    chain(partial(fused, bm=bm, bn=bn), x, (g, b, sx, wq, ws, d)),
                    flops,
                )
                best = t if best is None else min(best, t)
            except Exception as e:
                print(f"  fused bm={bm} bn={bn}: FAILED {type(e).__name__}: {e}")
        if best is not None:
            print(
                f"  best fused vs baseline: {best * 1e3:.2f} vs "
                f"{t_base * 1e3:.2f} ms ({t_base / best:.2f}x)",
                flush=True,
            )


if __name__ == "__main__":
    main()
