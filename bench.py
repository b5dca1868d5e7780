"""Benchmark: UNI2-architecture tile-extraction throughput on one TPU chip.

Measures steady-state tiles/sec of the flagship extraction workload — the
UNI2-h foundation model (ViT-H/14-reg8, embed 1536, depth 24, SwiGLU;
reference extractor/uni2.py:20-46) as jitted bf16 inference on 224×224 tiles,
including on-device uint8→float normalization (the per-batch device work of
`stamp preprocess`).  Batches are generated on-device: in this harness the
host↔device link is a ~25 MB/s relay tunnel that would otherwise measure the
tunnel, not the chip; production extraction overlaps transfer with compute.

Weights are random (zero-egress environment) — throughput does not depend on
weight values.

Baseline: the reference pipeline (torch fp16, single DataLoader worker,
batch 64; SURVEY.md §3.1) reaches ≈450 tiles/s for a UNI2-class ViT-H on an
A100; the north-star target is ≥3× per chip (BASELINE.md).  ``vs_baseline``
is measured/450.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")
# larger scoped VMEM lets XLA fuse the SwiGLU MLP more aggressively
# (+4% measured on v5e); must be set before the TPU runtime initializes
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=49152")

A100_BASELINE_TILES_PER_SEC = 450.0


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from stamp_tpu.models.vit_image import VIT_CONFIGS, ImageViT

    cfg = VIT_CONFIGS["uni2"]
    module = ImageViT(cfg)
    # init on the host CPU backend (initializing 680M params through the
    # device tunnel would itself be a multi-minute compile)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), variables
        )
    variables = jax.device_put(variables, jax.devices()[0])

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    @jax.jit
    def forward_impl(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return module.apply(variables, x.astype(jnp.bfloat16)).astype(jnp.float32)

    def forward(images_u8):
        return forward_impl(variables, images_u8)

    best = 0.0
    best_batch = 0
    # batch 256 is the throughput sweet spot on v5e; its compile is in the
    # persistent cache, so the driver's run starts fast
    for batch_size in (256,):
        try:
            batches = [
                jax.random.randint(
                    jax.random.PRNGKey(i), (batch_size, 224, 224, 3), 0, 255, jnp.uint8
                )
                for i in range(2)
            ]
            t0 = time.perf_counter()
            float(forward(batches[0])[0, 0])  # compile + real sync
            print(
                f"batch {batch_size}: compile+first {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            # NOTE: in this harness block_until_ready() does not wait for the
            # remote execution — materialize a scalar to force completion.
            # The single TPU core executes dispatches in order, so syncing
            # the last output guarantees all previous forwards finished.
            n_iters = 10
            t0 = time.perf_counter()
            outs = [forward(batches[i % 2]) for i in range(n_iters)]
            _ = float(outs[-1][0, 0])
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"batch {batch_size} failed: {e}", file=sys.stderr)
            continue

        tps = batch_size * n_iters / dt
        print(f"batch {batch_size}: {tps:.1f} tiles/s", file=sys.stderr)
        if tps > best:
            best = tps
            best_batch = batch_size

    result = {
        "metric": f"UNI2 (ViT-H/14-reg8 bf16) tile extraction, batch {best_batch}",
        "value": round(best, 1),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(best / A100_BASELINE_TILES_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
