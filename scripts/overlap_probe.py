"""Measure the pipelined double-buffer dispatch lever (VERDICT r3 item 7).

bench.py generates batches on-device, so its 377 t/s bf16 figure is the
pure compute rate.  End-to-end extraction additionally ships every tile
batch host→HBM; the named lever is overlapping that transfer with the
previous batch's forward (`parallel/prefetch.py` double-buffering, the
role torch DataLoader workers play for the reference).

This probe measures, through the real device link, UNI2-bf16 batch-256
forwards fed from HOST buffers:

  serial     — device_put then forward, one batch fully after another
               (what a naive loop pays: T_transfer + T_compute per batch)
  overlapped — prefetch_to_device(size=2) feeding the same forwards
               (the extraction path: ideally max(T_transfer, T_compute))

In this harness the link is a ~25 MB/s relay tunnel (38.5 MB/batch ⇒
T_transfer ≈ 1.5 s vs T_compute ≈ 0.68 s), so the ABSOLUTE overlapped
rate is tunnel-bound; the question the probe answers is whether the
dispatch machinery actually hides one leg under the other (ratio →
(T_t+T_c)/max(T_t,T_c)) or the relay serializes transfers with execution
(ratio → 1.0, meaning the lever cannot be exercised from this harness
and is a production-host measurement).

Prints one JSON line.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=49152")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 256
N_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stamp_tpu.models.vit_image import VIT_CONFIGS, ImageViT
    from stamp_tpu.parallel.prefetch import prefetch_to_device

    cfg = VIT_CONFIGS["uni2"]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = ImageViT(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
        )
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), variables
        )
    dev = jax.devices()[0]
    vars_dev = jax.device_put(variables, dev)

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0
    model = ImageViT(cfg)

    @functools.partial(
        jax.jit, compiler_options={"xla_tpu_scoped_vmem_limit_kib": "49152"}
    )
    def forward(v, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return model.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32)

    rng = np.random.default_rng(0)
    host_batches = [
        rng.integers(0, 255, size=(BATCH, 224, 224, 3), dtype=np.uint8)
        for _ in range(2)
    ]

    # compile + measure pure compute rate from a resident device buffer
    resident = jax.device_put(host_batches[0], dev)
    float(forward(vars_dev, resident)[0, 0])
    t0 = time.perf_counter()
    outs = [forward(vars_dev, resident) for _ in range(N_ITERS)]
    float(outs[-1][0, 0])
    t_compute = (time.perf_counter() - t0) / N_ITERS

    # transfer-only rate
    t0 = time.perf_counter()
    for i in range(N_ITERS):
        moved = jax.device_put(host_batches[i % 2], dev)
    float(jnp.asarray(moved)[0, 0, 0, 0])
    t_transfer = (time.perf_counter() - t0) / N_ITERS

    # serial: transfer fully, then forward, syncing each iteration
    t0 = time.perf_counter()
    for i in range(N_ITERS):
        moved = jax.device_put(host_batches[i % 2], dev)
        float(forward(vars_dev, moved)[0, 0])
    t_serial = (time.perf_counter() - t0) / N_ITERS

    # overlapped: double-buffered prefetch feeding the same forwards
    feed = (host_batches[i % 2] for i in range(N_ITERS))
    t0 = time.perf_counter()
    out = None
    for moved in prefetch_to_device(feed, size=2, device=dev):
        out = forward(vars_dev, moved)
    float(out[0, 0])
    t_overlap = (time.perf_counter() - t0) / N_ITERS

    ideal = max(t_transfer, t_compute)
    result = {
        "metric": "host_to_device_overlap",
        "batch": BATCH,
        "t_compute_s": round(t_compute, 3),
        "t_transfer_s": round(t_transfer, 3),
        "t_serial_s": round(t_serial, 3),
        "t_overlap_s": round(t_overlap, 3),
        "speedup_serial_over_overlap": round(t_serial / t_overlap, 3),
        "overlap_efficiency": round(
            (t_serial - t_overlap) / max(t_serial - ideal, 1e-9), 3
        ),
        "tiles_per_s_overlapped": round(BATCH / t_overlap, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
