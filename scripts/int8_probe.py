"""Measure UNI2 extraction throughput: bf16 vs opt-in int8 (W8A8) on one chip.

Run from the repo root with the chip free.  Prints tiles/s for both paths and
the feature agreement between them.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=49152")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stamp_tpu.models.vit_image import (
    VIT_CONFIGS,
    ImageViT,
    ViTConfig,
    calibrate_act_stats,
    quantize_vit_params,
)

BATCH = int(os.environ.get("PROBE_BATCH", "256"))
ITERS = int(os.environ.get("PROBE_ITERS", "10"))


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = VIT_CONFIGS["uni2"]
    module = ImageViT(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        variables = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    images = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(0), (BATCH, 224, 224, 3), 0, 255, jnp.uint8),
        dev,
    )

    def bench(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(ITERS)]
        _ = float(jnp.asarray(outs[-1]).ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{name}: {BATCH * ITERS / dt:.1f} tiles/s", flush=True)
        return np.asarray(outs[-1], np.float32)

    @jax.jit
    def fwd_bf16(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return module.apply(variables, x.astype(jnp.bfloat16)).astype(jnp.float32)

    ref = bench("bf16", fwd_bf16, variables, images)

    # calibrate + quantize
    cfg_obs = ViTConfig(**{**cfg.__dict__, "quant": "observe"})
    cfg_q = ViTConfig(**{**cfg.__dict__, "quant": "int8"})

    @jax.jit
    def calib(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        _, mut = ImageViT(cfg_obs).apply(
            variables, x.astype(jnp.bfloat16), mutable=["act_stats"]
        )
        return mut["act_stats"]

    t0 = time.perf_counter()
    act_stats = calib(variables, images)
    qparams = quantize_vit_params(variables["params"], cfg)
    qvars = {"params": qparams, "act_stats": act_stats}
    qvars = jax.tree_util.tree_map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, qvars)
    print(f"calibrate+quantize: {time.perf_counter() - t0:.1f}s", flush=True)

    module_q = ImageViT(cfg_q)

    @jax.jit
    def fwd_int8(qvars, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return module_q.apply(qvars, x.astype(jnp.bfloat16)).astype(jnp.float32)

    out = bench("int8", fwd_int8, qvars, images)

    cos = (ref * out).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    print(f"cos(bf16, int8): min {cos.min():.5f} mean {cos.mean():.5f}")


if __name__ == "__main__":
    main()
