"""Raw MXU MFU probe — distinguishes 'chip/toolchain globally slower' from
'a specific fused kernel regressed'.

Round 3 recorded the plain-matmul path at ~86% of the v5e 197 bf16 TFLOPs
peak (scripts/perf_probe.py, ROADMAP.md).  BENCH_r05 shows the full UNI2
forward at 0.41 MFU (was 0.71) with bf16 AND int8 slowed by the same ~1.8×,
which points at a global cause.  This probe times a bare bf16 (and int8)
matmul chain of comparable FLOP volume — if raw matmul MFU also fell ~1.8×,
the regression is the platform (libtpu/relay refresh between Aug 17 and
Aug 19), not this repo's kernels.

Usage: python scripts/mxu_probe.py [m] [k] [n] [chain]
Prints one JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")

import jax
import jax.numpy as jnp

M = int(sys.argv[1]) if len(sys.argv) > 1 else 67840  # 256 tiles × 265 tokens
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
N = int(sys.argv[3]) if len(sys.argv) > 3 else 1536
CHAIN = int(sys.argv[4]) if len(sys.argv) > 4 else 8

V5E_PEAK = {"bf16": 197e12, "int8": 394e12}


def bench(dtype_label, make_ops):
    a, chain_fn = make_ops()

    @jax.jit
    def run(a):
        return chain_fn(a)

    t0 = time.perf_counter()
    float(jnp.asarray(run(a)).ravel()[0].astype(jnp.float32))
    compile_s = time.perf_counter() - t0
    iters = 6
    t0 = time.perf_counter()
    outs = [run(a) for _ in range(iters)]
    _ = float(jnp.asarray(outs[-1]).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    flops = 2.0 * M * K * N * CHAIN
    return {
        "dtype": dtype_label,
        "ms_per_chain": round(dt * 1e3, 2),
        "tflops": round(flops / dt / 1e12, 1),
        "mfu": round(flops / dt / V5E_PEAK[dtype_label], 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    key = jax.random.PRNGKey(0)

    def bf16_ops():
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        ws = [
            jax.random.normal(jax.random.PRNGKey(i + 1), (K, N), jnp.bfloat16)
            for i in range(CHAIN)
        ]
        ws = [jax.device_put(w) for w in ws]

        def chain(a):
            out = a
            for w in ws:
                out = jnp.dot(out, w, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )
            return out

        return a, chain

    def int8_ops():
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        ws = [
            jax.random.randint(
                jax.random.PRNGKey(i + 1), (K, N), -127, 127, jnp.int8
            )
            for i in range(CHAIN)
        ]
        ws = [jax.device_put(w) for w in ws]

        def chain(a):
            out = a
            for w in ws:
                acc = jax.lax.dot_general(
                    out, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out = jnp.clip(acc // 1024, -127, 127).astype(jnp.int8)
            return out

        return a, chain

    res = [bench("bf16", bf16_ops), bench("int8", int8_ops)]
    print(json.dumps({"m": M, "k": K, "n": N, "chain": CHAIN, "results": res}))


if __name__ == "__main__":
    main()
