"""Does fusing LayerNorm into the *following* matmul beat XLA's LN + matmul?

Round-3 result (scripts/ln_probe.py): a fused single-pass Pallas LN ties
XLA's LN (~1.15 ms at [256·272, 1536]) because the cost is VPU stats work,
not HBM traffic — and the probe concluded the only remaining lever is
epilogue/prologue fusion into a custom Pallas *matmul* with MXU/VPU
co-scheduling.  This probe measures exactly that: ``Dense(LN(x))`` as one
Pallas kernel that computes the LN of each row-block once into VMEM scratch
(on the VPU, overlapped by Mosaic with the matmul's MXU work and DMAs) and
streams weight column-blocks through the MXU — versus the XLA baseline of a
separate LN pass materializing the normalized activation to HBM before the
matmul reads it back.

Shapes: the UNI2 extraction hot sites, [256·272, 1536] rows into the qkv
projection (N=4608) and the SwiGLU fc1 (N=8192).  48 such LN sites cost
~55 ms of the 680 ms bf16 step; eliminating the standalone LN pass is worth
up to ~8% end-to-end IF the fused matmul itself keeps XLA's MXU utilization.

Timing: N back-to-back dispatches, materialize the last output (valid sync
through the relay — the single core executes in order; see
.claude/skills/verify/SKILL.md).
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

ROWS = 256 * 272  # UNI2 batch 256 × 272 tokens
K = 1536
EPS = 1e-6
ITERS = 30


def _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, xn_ref):
    # n-grid step 0 of each row-block: LN once into VMEM scratch (VPU);
    # every n step: one MXU dot against the streamed weight column-block.
    @pl.when(pl.program_id(1) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        c = xf - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        y = c * jax.lax.rsqrt(var + EPS)
        y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        xn_ref[:] = y.astype(xn_ref.dtype)

    o_ref[:] = jnp.dot(
        xn_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("bm", "bn"))
def ln_dense_fused(x, g, b, w, bm=1024, bn=512):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        _ln_dense_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, g, b, w)


@jax.jit
def ln_dense_xla(x, g, b, w):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = ((c * jax.lax.rsqrt(var + EPS)) * g + b).astype(x.dtype)
    return jnp.dot(y, w, preferred_element_type=jnp.float32).astype(x.dtype)


@jax.jit
def dense_xla(x, w):
    """Matmul alone — the floor the fused kernel must not fall behind."""
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def timeit(name, step, x, g, b, w, flops):
    """One jitted fori_loop chains ITERS calls through a tiny feedback term
    (non-foldable, identical across variants), so per-dispatch relay cost is
    paid once and device buffers never pile up (a list of [M, N] outputs OOMs
    16 GB HBM at these shapes)."""

    @jax.jit
    def many(x, g, b, w):
        def body(_, x):
            y = step(x, g, b, w)
            return x + (1e-6 * y[:, :K]).astype(x.dtype)

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32))

    t0 = time.perf_counter()
    float(many(x, g, b, w))  # compile + first run
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(x, g, b, w))
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"  {name:34s} {dt * 1e3:8.2f} ms  ({flops / dt / 1e12:6.1f} TFLOP/s)"
        f"  [compile {compile_t:.0f}s]",
        flush=True,
    )
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(ROWS, K)).astype(np.float32), dtype=jnp.bfloat16
    )
    g = jnp.ones((1, K), jnp.bfloat16)
    b = jnp.zeros((1, K), jnp.bfloat16)

    sites = {"qkv": (3 * K, "qkv  N=4608"), "fc1": (8192, "fc1  N=8192")}
    wanted = sys.argv[1:] or list(sites)
    for n_out, label in (sites[s] for s in wanted):
        w = jnp.asarray(
            (rng.normal(size=(K, n_out)) * 0.02).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        flops = 2.0 * ROWS * K * n_out
        print(f"[{label}] rows={ROWS} K={K}")
        # numerics check first
        want = np.asarray(ln_dense_xla(x, g, b, w), dtype=np.float32)
        got = np.asarray(ln_dense_fused(x, g, b, w), dtype=np.float32)
        err = np.abs(want - got).max() / (np.abs(want).max() + 1e-9)
        print(f"  max rel err fused vs XLA: {err:.2e}")
        t_base = timeit("XLA LN + matmul", ln_dense_xla, x, g, b, w, flops=flops)
        t_mm = timeit(
            "XLA matmul alone",
            lambda x, g, b, w: dense_xla(x, w),
            x, g, b, w,
            flops=flops,
        )
        best = None
        for bm, bn in ((1024, 512), (512, 512), (1024, 1024), (2048, 512)):
            try:
                t = timeit(
                    f"fused ln_dense bm={bm} bn={bn}",
                    partial(ln_dense_fused, bm=bm, bn=bn),
                    x, g, b, w,
                    flops=flops,
                )
                best = t if best is None else min(best, t)
            except Exception as e:
                print(f"  fused bm={bm} bn={bn}: FAILED {type(e).__name__}: {e}")
        print(f"  standalone-LN share of baseline: {(t_base - t_mm) * 1e3:.2f} ms")
        if best is not None:
            print(
                f"  best fused vs baseline: {best * 1e3:.2f} vs "
                f"{t_base * 1e3:.2f} ms ({t_base / best:.2f}x)",
                flush=True,
            )


if __name__ == "__main__":
    main()
