"""Is flax nn.LayerNorm at the true HBM floor, or is there a fused-kernel win?

scripts/int8_ablate.py measured the UNI2 int8 batch's 48 LayerNorms at
~1 ms each and assumed that was the elementwise floor.  Calibrating the
actual floor at the extraction shape [256·272, 1536] bf16 with a cheap
non-foldable elementwise op (y = a + 0.25·a²) gives ~0.42 ms per pass
(~1 TB/s effective read+write), while XLA's LN lowering runs ~1.22 ms —
~3× the floor (the row-stats reduction becomes extra HBM passes).  This
probe times XLA LN vs a fused single-pass Pallas LN (stats + normalize in
VMEM) at several block sizes.

Timing gotcha (see .claude/skills/verify/SKILL.md): through the relay,
``block_until_ready`` does NOT wait for device completion and trivial
fori_loops are folded by XLA.  So every variant (a) chains a
non-simplifiable op inside one jitted fori_loop, (b) forces completion by
fetching a scalar sum, and (c) reports the (250-iter − 50-iter)/200
difference so the relay's fixed dispatch+fetch cost cancels.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 256 * 272
DIM = 1536
EPS = 1e-6


def ln_kernel(x_ref, scale_ref, bias_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + EPS)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("block_rows",))
def pallas_ln(x, scale, bias, block_rows=512):
    n = x.shape[0]
    return pl.pallas_call(
        ln_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, DIM), lambda i: (i, 0)),
            pl.BlockSpec((1, DIM), lambda i: (0, 0)),
            pl.BlockSpec((1, DIM), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, DIM), lambda i: (i, 0)),
    )(x, scale, bias)


def flax_ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + EPS)
    return (y * scale + bias).astype(x.dtype)


def run(iters, step, x, *args):
    @jax.jit
    def many(x, *args):
        y = jax.lax.fori_loop(0, iters, lambda _, a: step(a, *args), x)
        return jnp.sum(y.astype(jnp.float32))

    float(many(x, *args))  # compile + warm
    t0 = time.perf_counter()
    float(many(x, *args))
    return time.perf_counter() - t0


def measure(name, step, x, *args):
    t50 = run(50, step, x, *args)
    t250 = run(250, step, x, *args)
    per = (t250 - t50) / 200
    gb = ROWS * DIM * 2 * 2 / 1e9
    print(f"{name:36s} {per * 1e3:7.3f} ms/pass  ({gb / per:5.0f} GB/s eff)", flush=True)
    return per


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (ROWS, DIM), jnp.bfloat16) * 3 + 0.5)
    scale = jax.device_put(jnp.ones((1, DIM), jnp.bfloat16) * 1.1)
    bias = jax.device_put(jnp.zeros((1, DIM), jnp.bfloat16) + 0.2)

    ref = flax_ln(x, scale, bias)
    got = pallas_ln(x, scale, bias)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    print(f"pallas vs flax max abs err: {float(err):.5f}")

    measure("elementwise floor (a+0.25*a*a)", lambda a: a + jnp.bfloat16(0.25) * a * a, x)
    measure("flax/XLA LayerNorm", flax_ln, x, scale, bias)
    for br in (128, 256, 512, 1024):
        measure(f"pallas fused LN block={br}",
                lambda a, s, b, br=br: pallas_ln(a, s, b, block_rows=br),
                x, scale, bias)


if __name__ == "__main__":
    main()
