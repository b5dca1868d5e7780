"""Bisect the round-4 throughput regression (377 → 217 t/s bf16).

BENCH_r05 shows the drop is deterministic and compute-bound (per-dispatch ≈
pipelined, trials within 0.2%), so the cause is the toolchain (jax 0.9.0 /
libtpu refresh between Aug 17 and Aug 19), not tunnel noise.  This probe
measures the UNI2 bf16 forward under feature toggles to localize it:

  base        — the bench.py configuration (fused attention + fused LN→GEMM)
  no-flash    — STAMP_NO_FUSED_ATTENTION=1 (XLA-native attention)
  no-lndense  — STAMP_NO_FUSED_LN_DENSE=1 (XLA-native LN)
  no-fused    — both off (pure XLA)
  vmem-64m    — scoped VMEM 65536 KiB instead of 49152
  vmem-def    — no scoped-VMEM override (16 MiB default)

Usage: python scripts/perf_bisect_probe.py [variant ...]
Prints one JSON line per variant (each variant runs in a subprocess so env
toggles apply before module import; one TPU claim at a time).
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

VARIANTS: dict[str, dict] = {
    "base": {},
    "no-flash": {"STAMP_NO_FUSED_ATTENTION": "1"},
    "no-lndense": {"STAMP_NO_FUSED_LN_DENSE": "1"},
    "no-fused": {"STAMP_NO_FUSED_ATTENTION": "1", "STAMP_NO_FUSED_LN_DENSE": "1"},
    "vmem-64m": {"STAMP_PROBE_VMEM_KIB": "65536"},
    "vmem-def": {"STAMP_PROBE_VMEM_KIB": "none"},
}


def run_variant() -> None:
    import functools

    # repo root on sys.path (PYTHONPATH would break the axon TPU claim)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache"
    )
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stamp_tpu.models.vit_image import VIT_CONFIGS, ImageViT

    cfg = VIT_CONFIGS["uni2"]
    batch = int(os.environ.get("STAMP_PROBE_BATCH", "256"))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = ImageViT(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
        )
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), variables
        )
    if os.environ.get("STAMP_PROBE_INT8") == "1":
        from dataclasses import replace

        from stamp_tpu.models.vit_image import quantize_vit_params

        with jax.default_device(cpu):
            qparams = quantize_vit_params(variables["params"], cfg)
            act_stats = {
                f"block_{i}": {
                    "attn": {k: {"amax": jnp.float32(30.0)} for k in ("qkv", "proj")},
                    "mlp": {k: {"amax": jnp.float32(30.0)} for k in ("fc1", "fc2")},
                }
                for i in range(cfg.depth)
            }
        cfg = replace(cfg, quant="int8")
        variables = {"params": qparams, "act_stats": act_stats}
    dev = jax.devices()[0]
    vars_dev = jax.device_put(variables, dev)

    vmem = os.environ.get("STAMP_PROBE_VMEM_KIB", "49152")
    options = {} if vmem == "none" else {"xla_tpu_scoped_vmem_limit_kib": vmem}

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0
    module = ImageViT(cfg)

    @functools.partial(jax.jit, compiler_options=options)
    def forward(v, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return module.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32)

    batches = [
        jax.random.randint(
            jax.random.PRNGKey(i), (batch, 224, 224, 3), 0, 255, jnp.uint8
        )
        for i in range(2)
    ]
    t0 = time.perf_counter()
    float(forward(vars_dev, batches[0])[0, 0])
    compile_s = time.perf_counter() - t0

    n_iters = 10
    trials = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [forward(vars_dev, batches[i % 2]) for i in range(n_iters)]
        _ = float(outs[-1][0, 0])
        trials.append(batch * n_iters / (time.perf_counter() - t0))
    print(
        json.dumps(
            {
                "variant": os.environ.get("STAMP_PROBE_VARIANT", "?"),
                "batch": batch,
                "tps": round(max(trials), 1),
                "trials": [round(t, 1) for t in trials],
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        sys.exit(f"unknown variant(s) {unknown}; choose from {list(VARIANTS)}")
    here = Path(__file__).resolve().parent.parent
    for name in names:
        env = dict(os.environ)
        env.update(VARIANTS.get(name, {}))
        env["STAMP_PROBE_VARIANT"] = name
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker"],
                env=env,
                cwd=here,
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # the no-flash variant's remote compile exceeded 30 min on
            # 2026-08-20 — report and continue instead of sinking the sweep
            print(json.dumps({"variant": name, "error": "compile/run >1800s"}),
                  flush=True)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                break
        else:
            print(
                json.dumps({"variant": name, "error": proc.stderr[-300:]}),
                flush=True,
            )


if __name__ == "__main__":
    if "--worker" in sys.argv:
        run_variant()
    else:
        main()
