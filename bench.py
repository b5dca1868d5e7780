"""Benchmark: UNI2-architecture tile-extraction throughput on one TPU chip.

Measures steady-state tiles/sec of the flagship extraction workload — the
UNI2-h foundation model (ViT-H/14-reg8, embed 1536, depth 24, SwiGLU;
reference extractor/uni2.py:20-46) running as jitted bf16 inference on
224×224 tiles, including the uint8 host→device transfer and on-device
normalization, i.e. exactly the per-batch work of `stamp preprocess`.

Weights are random (zero-egress environment) — throughput is independent of
weight values.

Baseline: the reference pipeline (torch fp16, single DataLoader worker,
batch 64; SURVEY.md §3.1) reaches ≈450 tiles/s for a UNI2-class ViT-H on an
A100; the north-star target is ≥3× that per chip (BASELINE.md).
``vs_baseline`` reports measured / 450.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

os.environ["STAMP_RANDOM_WEIGHTS"] = "1"

A100_BASELINE_TILES_PER_SEC = 450.0


def main() -> None:
    import jax
    import numpy as np

    from stamp_tpu.preprocessing.extractor import make_vit_extractor

    extractor = make_vit_extractor(
        identifier="bench-uni2", arch="uni2", weight_files=[]
    )

    rng = np.random.default_rng(0)

    best = 0.0
    best_batch = 0
    for batch_size in (64, 128, 256):
        batch = rng.integers(0, 255, (batch_size, 224, 224, 3), dtype=np.uint8)
        try:
            # warmup (compile)
            extractor.forward(batch)
            extractor.forward(batch)

            n_iters = 8
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = extractor.forward(batch)
            out.block_until_ready() if hasattr(out, "block_until_ready") else None
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM at large batch → keep best so far
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
