"""Tile-extractor abstraction.

The reference wraps each foundation model in a frozen ``Extractor`` dataclass
(model + PIL transform + identifier; reference extractor/__init__.py:18-28).
The TPU-native counterpart splits the work across the host/device boundary:

* ``transform_host``: PIL tile → uint8 HWC array (resize/crop only — cheap)
* ``forward``: jitted device function, uint8 batch [B,H,W,3] → float32
  features [B,D].  Normalization (x/255 − mean)/std and the backbone run
  on-device in bfloat16, so the host↔HBM transfer is 1 byte/pixel.

Weight loading: published weights are ported from torch checkpoints found in
the shared ``~/.cache/stamp`` / HuggingFace cache (zero-egress environments
can pre-seed them).  ``STAMP_RANDOM_WEIGHTS=1`` substitutes random
initialization — for throughput benchmarking only.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from stamp_tpu.models.vit_image import (
    VIT_CONFIGS,
    ImageViT,
    ViTConfig,
    convert_torch_state_dict,
)

_logger = logging.getLogger("stamp")

# process-wide override for int8 (W8A8) extraction, settable from the config
# layer (preprocessing.extractor_precision) without touching the environment;
# None defers to the STAMP_INT8_EXTRACTION env var
_INT8_OVERRIDE: bool | None = None


def set_int8_extraction(enabled: bool | None) -> None:
    """Force int8 extraction on/off for subsequently-built extractors
    (None = defer to the STAMP_INT8_EXTRACTION environment variable)."""
    global _INT8_OVERRIDE
    _INT8_OVERRIDE = enabled


def _int8_requested() -> bool:
    if _INT8_OVERRIDE is not None:
        return _INT8_OVERRIDE
    return os.environ.get("STAMP_INT8_EXTRACTION") == "1"


@dataclass(frozen=True)
class Extractor:
    """A tile feature extractor."""

    identifier: str
    input_px: int
    feat_dim: int
    transform_host: Callable[[Image.Image], np.ndarray]
    forward: Callable[[np.ndarray], np.ndarray]  # uint8 [B,H,W,3] → f32 [B,D]
    precision: str = "bfloat16"
    """Numeric mode the forward actually runs in ("bfloat16" | "int8") —
    the source of truth for output provenance and artifact dir naming."""


# The fused attention kernel (ops/flash_attention.py) needs more scoped
# VMEM than the 16 MiB default at production batch sizes.  Request it
# per-compile: remote/AOT compile services ignore the process-level
# LIBTPU_INIT_ARGS, but proto-backed --xla_* options are forwarded with
# every compile.  48 MiB measured best on v5e (ROADMAP.md: 64 MiB was
# slower, 16 MiB OOMs the kernel's stack allocation at batch 256).
TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "49152"}


def batch_floor() -> int:
    """Pad floor for extractor forwards — must track the producer batch size
    (STAMP_EXTRACT_BATCH, preprocessing/extract.py) so every slide's partial
    final batch pads to the one compiled shape instead of triggering a fresh
    multi-minute XLA compile per distinct size."""
    return int(os.environ.get("STAMP_EXTRACT_BATCH", "64"))


def tpu_jit(fn=None, **jit_kwargs):
    """jax.jit that pins the TPU compiler options above (no-op off-TPU)."""
    if jax.default_backend() == "tpu":
        jit_kwargs.setdefault("compiler_options", TPU_COMPILER_OPTIONS)
    if fn is None:
        return functools.partial(jax.jit, **jit_kwargs)
    return jax.jit(fn, **jit_kwargs)


def int8_tower_state(calibrate, quantize, variables, identifier: str):
    """Calibrate-once-then-W8A8 state machine for the non-ImageViT towers
    (Swin / CLIP / CoCa / BEiT3 / TICON; the ImageViT zoo has its own
    dp-mesh-aware variant in `make_vit_extractor`).

    ``calibrate(variables, batch)`` runs one observe-mode forward and
    returns the recorded ``act_stats`` collection; ``quantize(params)``
    emits the pre-quantized int8 tree.  Returns ``vars_for(batch)`` which
    calibrates on its first call and serves the int8 variables after.
    """
    _logger.warning(
        f"{identifier}: int8 (W8A8) inference enabled — features will "
        "deviate slightly from the fp16/bf16 reference output"
    )
    state: dict = {}

    def vars_for(batch):
        if "qvars" not in state:
            act_stats = calibrate(variables, batch)
            state["qvars"] = {
                "params": quantize(variables["params"]),
                "act_stats": act_stats,
            }
        return state["qvars"]

    return vars_for


def _resize_transform(size: int) -> Callable[[Image.Image], np.ndarray]:
    def transform(img: Image.Image) -> np.ndarray:
        if img.size != (size, size):
            img = img.resize((size, size), Image.Resampling.BILINEAR)
        return np.asarray(img.convert("RGB"), dtype=np.uint8)

    return transform


def _find_torch_weights(candidates: list[str]) -> str | None:
    """Look for a pre-seeded torch checkpoint in the local caches."""
    from pathlib import Path

    roots = [
        Path(os.environ.get("STAMP_WEIGHTS_DIR", "")),
        Path(os.environ.get("XDG_CACHE_HOME") or (Path.home() / ".cache")) / "stamp",
        Path(os.environ.get("HF_HOME") or (Path.home() / ".cache" / "huggingface")),
    ]
    for root in roots:
        if not root or not root.exists():
            continue
        for cand in candidates:
            for hit in root.rglob(cand):
                return str(hit)
    return None


def _load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(path)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def make_vit_extractor(
    *,
    identifier: str,
    arch: str,
    weight_files: list[str] | None = None,
    input_px: int = 224,
    pool: str | None = None,
    batch_pad: bool = True,
) -> Extractor:
    """Build a jitted ViT extractor from the shared architecture zoo."""
    cfg: ViTConfig = VIT_CONFIGS[arch]
    if input_px != cfg.img_size:
        cfg = ViTConfig(**{**cfg.__dict__, "img_size": input_px})
    if pool is not None:
        cfg = ViTConfig(**{**cfg.__dict__, "pool": pool})

    module = ImageViT(cfg)

    if os.environ.get("STAMP_RANDOM_WEIGHTS") == "1":
        _logger.warning(
            f"{identifier}: using RANDOM weights (STAMP_RANDOM_WEIGHTS=1) — "
            "features are only useful for benchmarking"
        )
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, input_px, input_px, 3))
            )
    else:
        path = _find_torch_weights(weight_files or [])
        if path is None:
            raise FileNotFoundError(
                f"no weights found for extractor '{identifier}' "
                f"(searched caches for {weight_files}). Pre-seed the weight "
                "file into ~/.cache/stamp or set STAMP_WEIGHTS_DIR; "
                "set STAMP_RANDOM_WEIGHTS=1 for benchmarking without weights."
            )
        _logger.info(f"{identifier}: porting torch weights from {path}")
        sd = _load_torch_state_dict(path)
        variables = convert_torch_state_dict(sd, cfg)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    # Keep weights on device and pass them as a jit ARGUMENT — closing over
    # them would bake gigabytes of constants into the HLO and make every
    # compile ship the weights.  Inference weights are bf16: f32 weights
    # would silently promote every matmul off the bf16 MXU path.
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), variables
    )

    # Multi-chip extraction: replicate weights, shard the tile batch over a
    # data-parallel mesh — XLA splits the work, no collectives needed.
    n_dev = len(jax.devices())
    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("dp",))
        repl = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("dp"))
        variables = jax.device_put(variables, repl)

        @tpu_jit(
            in_shardings=(repl, batch_sharding),
            out_shardings=batch_sharding,
        )
        def _forward_impl(variables, images_u8: jax.Array) -> jax.Array:
            x = (images_u8.astype(jnp.float32) - mean) / std
            return module.apply(variables, x.astype(jnp.bfloat16)).astype(
                jnp.float32
            )
    else:
        variables = jax.device_put(variables)

        @tpu_jit
        def _forward_impl(variables, images_u8: jax.Array) -> jax.Array:
            x = (images_u8.astype(jnp.float32) - mean) / std
            return module.apply(variables, x.astype(jnp.bfloat16)).astype(
                jnp.float32
            )

    # --- opt-in W8A8 int8 inference (STAMP_INT8_EXTRACTION=1) --------------
    # Per-out-channel int8 weights + static per-tensor activation scales
    # calibrated on the first real tile batch; ~2× matmul throughput on the
    # int8 MXU at a small feature error (see ROADMAP.md / test_int8_quant).
    # Off by default: bf16 matches the reference's fp16 numeric contract.
    # Works on the dp mesh too: weights replicated, batch sharded — the
    # calibration maxima all-reduce across chips automatically under jit.
    int8_state: dict = {}
    use_int8 = _int8_requested()
    if use_int8:
        _logger.warning(
            f"{identifier}: int8 (W8A8) inference enabled — features will "
            "deviate slightly from the fp16/bf16 reference output"
        )
        from stamp_tpu.models.vit_image import quantize_vit_params

        cfg_observe = ViTConfig(**{**cfg.__dict__, "quant": "observe"})
        cfg_int8 = ViTConfig(**{**cfg.__dict__, "quant": "int8"})

        if n_dev > 1:
            _int8_jit = tpu_jit(
                in_shardings=(repl, batch_sharding),
                out_shardings=batch_sharding,
            )
            _calib_jit = tpu_jit(in_shardings=(repl, batch_sharding))
        else:
            _int8_jit = tpu_jit()
            _calib_jit = tpu_jit()

        @_calib_jit
        def _calibrate_impl(variables, images_u8: jax.Array):
            x = (images_u8.astype(jnp.float32) - mean) / std
            _, mut = ImageViT(cfg_observe).apply(
                variables, x.astype(jnp.bfloat16), mutable=["act_stats"]
            )
            return mut["act_stats"]

        @_int8_jit
        def _forward_int8_impl(qvars, images_u8: jax.Array) -> jax.Array:
            x = (images_u8.astype(jnp.float32) - mean) / std
            return ImageViT(cfg_int8).apply(qvars, x.astype(jnp.bfloat16)).astype(
                jnp.float32
            )

        def _forward_quantized(images_u8: jax.Array) -> jax.Array:
            nonlocal variables
            if "qvars" not in int8_state:
                act_stats = _calibrate_impl(variables, images_u8)
                qparams = quantize_vit_params(variables["params"], cfg)
                int8_state["qvars"] = {"params": qparams, "act_stats": act_stats}
                # the big bf16 Dense kernels are only needed for this one
                # calibration pass — drop the reference so XLA frees ~2× the
                # int8 tree's HBM (LN/bias/embed leaves stay alive through
                # qvars, which shares them)
                variables = None
            return _forward_int8_impl(int8_state["qvars"], images_u8)

    feat_dim = {
        "token": cfg.embed_dim,
        "avg": cfg.embed_dim,
        "token_avg_concat": 2 * cfg.embed_dim,
    }[cfg.pool]

    def forward(batch: np.ndarray) -> jax.Array:
        """Non-blocking: returns the device array so transfers and compute of
        consecutive batches overlap; callers materialize at write time."""
        n = batch.shape[0]
        pad_to = (
            max(batch_floor(), ((n + n_dev - 1) // n_dev) * n_dev)
            if batch_pad
            else n
        )
        if n < pad_to:
            # pad to the steady-state batch so the jit cache stays warm and
            # the batch divides evenly across the dp mesh
            batch = np.concatenate(
                [batch, np.zeros((pad_to - n, *batch.shape[1:]), batch.dtype)]
            )
        if use_int8:
            return _forward_quantized(jnp.asarray(batch))[:n]
        return _forward_impl(variables, jnp.asarray(batch))[:n]

    return Extractor(
        identifier=identifier,
        input_px=input_px,
        feat_dim=feat_dim,
        transform_host=_resize_transform(input_px),
        forward=forward,
        precision="int8" if use_int8 else "bfloat16",
    )
