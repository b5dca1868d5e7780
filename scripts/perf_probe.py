"""Ablation timing probe for UNI2 extraction throughput on one TPU chip.

Times the full ImageViT forward plus component ablations (no-attention,
no-MLP, patch-embed-only, raw MXU matmul of the same FLOP count) to locate
where the batch time goes.  Run from the repo root with the chip free.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stamp_tpu.models.vit_image import VIT_CONFIGS, ImageViT

BATCH = int(os.environ.get("PROBE_BATCH", "256"))
ITERS = int(os.environ.get("PROBE_ITERS", "6"))


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    _ = sum(float(jnp.asarray(o).ravel()[0]) for o in outs)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:32s} {dt * 1e3:9.1f} ms/iter  ({BATCH / dt:8.1f} tiles/s)  [compile {compile_t:.1f}s]")
    return dt


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

    @jax.jit
    def full(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return module.apply(variables, x.astype(jnp.bfloat16)).astype(jnp.float32)

    t_full = timeit("full forward", full, variables, images)

    # --- raw MXU roofline with the same matmul FLOPs as the blocks ---
    # per block: qkv 3D², proj D², fc1 D·H, fc2 (H/2)·D ; attention matmuls
    # ≈ 2·N·D per token.  Approximate with a single big [tokens, D]x[D, K].
    tokens = BATCH * 265
    D = cfg.embed_dim
    H = int(D * cfg.mlp_ratio)
    cols_per_block = 3 * D + D + H + H // 2  # matmul columns touched per block
    flops_model = 2 * tokens * D * cols_per_block * cfg.depth
    x_mm = jnp.ones((8192, D), jnp.bfloat16)
    w_mm = jnp.ones((D, 8192), jnp.bfloat16)

    @jax.jit
    def mm_loop(x, w):
        def body(c, _):
            return jnp.tanh(c @ w @ w.T * 1e-4), None
        c, _ = jax.lax.scan(body, x, None, length=24)
        return c

    t0 = time.perf_counter()
    _ = float(mm_loop(x_mm, w_mm)[0, 0])
    t0 = time.perf_counter()
    outs = [mm_loop(x_mm, w_mm) for _ in range(ITERS)]
    _ = sum(float(o[0, 0]) for o in outs)
    dt = (time.perf_counter() - t0) / ITERS
    mm_flops = 2 * 8192 * D * 8192 * 2 * 24
    print(f"{'raw matmul roofline':32s} {dt * 1e3:9.1f} ms/iter  -> {mm_flops / dt / 1e12:6.1f} TFLOP/s")
    print(f"model matmul flops/batch: {flops_model / 1e12:.2f} TF -> implied SoL at that rate: "
          f"{BATCH / (flops_model / (mm_flops / dt)):.1f} tiles/s")

    # --- ablations: rebuild model variants ---
    import flax.linen as nn
    from stamp_tpu.models import vit_image as VI

    class NoAttn(nn.Module):
        dim: int
        num_heads: int
        qkv_bias: bool
        quant: str = "off"

        @nn.compact
        def __call__(self, x):
            # qkv + proj matmuls kept, attention matrix skipped
            qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, name="qkv")(x)
            return nn.Dense(self.dim, name="proj")(qkv[..., : self.dim])

    orig_attn = VI._Attention
    VI._Attention = NoAttn
    module_na = ImageViT(cfg)
    with jax.default_device(cpu):
        v_na = module_na.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        v_na = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), v_na)
    v_na = jax.device_put(v_na, dev)

    @jax.jit
    def fwd_na(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return module_na.apply(variables, x.astype(jnp.bfloat16)).astype(jnp.float32)

    t_na = timeit("no attention matrix", fwd_na, v_na, images)
    VI._Attention = orig_attn

    # patch-embed only
    class StemOnly(nn.Module):
        cfg: object

        @nn.compact
        def __call__(self, images):
            c = self.cfg
            x = nn.Conv(c.embed_dim, kernel_size=(c.patch_size, c.patch_size),
                        strides=(c.patch_size, c.patch_size), padding="VALID",
                        name="patch_embed")(images)
            return x.reshape(images.shape[0], -1, c.embed_dim).mean(axis=(1, 2))

    stem = StemOnly(cfg)
    with jax.default_device(cpu):
        v_st = stem.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        v_st = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), v_st)
    v_st = jax.device_put(v_st, dev)

    @jax.jit
    def fwd_st(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return stem.apply(variables, x.astype(jnp.bfloat16)).astype(jnp.float32)

    t_st = timeit("patch-embed conv only", fwd_st, v_st, images)

    # dispatch overhead: trivial jit
    @jax.jit
    def trivial(x):
        return x.astype(jnp.float32).sum()

    t_tr = timeit("trivial dispatch", trivial, images)

    print(f"\nattention-matrix share: {(t_full - t_na) * 1e3:.1f} ms")
    print(f"stem share: {t_st * 1e3:.1f} ms, dispatch floor: {t_tr * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
