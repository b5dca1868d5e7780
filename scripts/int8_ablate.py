"""Ablation probe for the int8 UNI2 forward: where does non-matmul time go?

Variants timed on one chip:
  * int8 full forward            (baseline)
  * int8, attention matrix off   (qkv+proj kept → delta = attention cost)
  * int8 matmul roofline         (same-shape dot chain → achievable int8 TOPS)
  * int8, LayerNorms replaced by identity (delta = LN + quantize epilogues)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache")
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=49152")

import flax.linen as nn
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stamp_tpu.models import vit_image as VI
from stamp_tpu.models.vit_image import VIT_CONFIGS, ImageViT, ViTConfig, quantize_vit_params

BATCH = int(os.environ.get("PROBE_BATCH", "256"))
ITERS = int(os.environ.get("PROBE_ITERS", "8"))


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    _ = float(jnp.asarray(outs[-1]).ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:32s} {dt * 1e3:9.1f} ms/iter  ({BATCH / dt:8.1f} tiles/s)  [compile {compile_t:.0f}s]",
          flush=True)
    return dt


def build_int8(cfg):
    cfg_off = ViTConfig(**{**cfg.__dict__, "quant": "off"})
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = ImageViT(cfg_off).init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        variables = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables)
        qparams = quantize_vit_params(variables["params"], cfg)
        act_stats = {
            f"block_{i}": {
                "attn": {k: {"amax": jnp.float32(30.0)} for k in ("qkv", "proj")},
                "mlp": {k: {"amax": jnp.float32(30.0)} for k in ("fc1", "fc2")},
            }
            for i in range(cfg.depth)
        }
    return jax.device_put({"params": qparams, "act_stats": act_stats}, jax.devices()[0])


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = VIT_CONFIGS["uni2"]
    cfg_q = ViTConfig(**{**cfg.__dict__, "quant": "int8"})
    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0
    dev = jax.devices()[0]
    images = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(0), (BATCH, 224, 224, 3), 0, 255, jnp.uint8), dev
    )

    def make_fwd(module):
        @jax.jit
        def fwd(v, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return module.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32)
        return fwd

    # 1. full int8 forward
    qvars = build_int8(cfg_q)
    t_full = timeit("int8 full", make_fwd(ImageViT(cfg_q)), qvars, images)

    # 2. attention matrix off (qkv + proj matmuls kept)
    class NoAttn(nn.Module):
        dim: int
        num_heads: int
        qkv_bias: bool
        quant: str = "off"

        @nn.compact
        def __call__(self, x):
            qkv = VI.QuantDense(3 * self.dim, use_bias=self.qkv_bias,
                                mode=self.quant, name="qkv")(x)
            return VI.QuantDense(self.dim, mode=self.quant, name="proj")(
                qkv[..., : self.dim])

    orig = VI._Attention
    VI._Attention = NoAttn
    try:
        qvars_na = build_int8(cfg_q)
        t_na = timeit("int8 no attention matrix", make_fwd(ImageViT(cfg_q)), qvars_na, images)
    finally:
        VI._Attention = orig

    # 3. int8 matmul roofline: [8192,1536]x[1536,8192] int8 chain
    xq = jnp.ones((8192, 1536), jnp.int8)
    wq = jnp.ones((1536, 8192), jnp.int8)

    @jax.jit
    def mm_loop(x, w):
        def body(c, _):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return c + y[:1536, :1536].astype(jnp.int32).T % 7, None
        c, _ = jax.lax.scan(body, jnp.zeros((1536, 1536), jnp.int32), None, length=24)
        return c

    t0 = time.perf_counter()
    _ = int(mm_loop(xq, wq)[0, 0])
    t0 = time.perf_counter()
    outs = [mm_loop(xq, wq) for _ in range(ITERS)]
    _ = int(outs[-1][0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    ops = 2 * 8192 * 1536 * 8192 * 24
    print(f"{'int8 matmul roofline':32s} {dt * 1e3:9.1f} ms/iter  -> {ops / dt / 1e12:6.1f} TOPS", flush=True)

    # 4. LayerNorms replaced by identity (delta = LN + quantize epilogues)
    import flax.linen as nn2

    class NoNorm(nn2.Module):
        epsilon: float = 1e-6
        use_bias: bool = True
        use_scale: bool = True

        @nn2.compact
        def __call__(self, x):
            return x

    orig_ln = nn.LayerNorm
    import flax.linen
    flax.linen.LayerNorm = NoNorm
    VI.nn.LayerNorm = NoNorm
    try:
        qvars_nl = build_int8(cfg_q)
        t_nl = timeit("int8 no layernorm", make_fwd(ImageViT(cfg_q)), qvars_nl, images)
    finally:
        flax.linen.LayerNorm = orig_ln
        VI.nn.LayerNorm = orig_ln

    print(f"\nattention share: {(t_full - t_na) * 1e3:.1f} ms/iter")
    print(f"layernorm share: {(t_full - t_nl) * 1e3:.1f} ms/iter")


if __name__ == "__main__":
    main()
