"""CONCH / CONCH1.5 (CoCa) and MUSK (BEiT3) extractor factories.

Reference behaviors: extractor/conch.py:23-41 (CoCa ``encode_image`` with
``proj_contrast=False``), extractor/conch1_5.py:13-18 (TITAN's
``return_conch()`` tower), extractor/musk.py:22-58 (BEiT3 vision path with
two-scale evaluation).  Architectures live in models/coca.py and
models/beit3.py; weights are ported from pre-seeded checkpoints or replaced
by random init under ``STAMP_RANDOM_WEIGHTS=1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.encoding.encoder._flax_params import load_or_init_params
from stamp_tpu.models.beit3 import (
    Beit3Config,
    Beit3VisionTower,
    convert_beit3_state_dict,
    multiscale_cls,
)
from stamp_tpu.models.coca import (
    COCA_CONFIGS,
    CoCaVisionTower,
    convert_coca_state_dict,
)
from stamp_tpu.preprocessing.extractor import (
    Extractor,
    batch_floor,
    _int8_requested,
    _resize_transform,
    int8_tower_state,
    tpu_jit,
)


def _bf16_on_device(tree):
    return jax.device_put(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), tree)
    )


def _batched(forward_impl):
    """Pad small batches to the shared extraction floor so the jitted
    forward compiles once for the whole run."""

    def forward(batch: np.ndarray) -> np.ndarray:
        n = batch.shape[0]
        if n < (floor := batch_floor()):
            batch = np.concatenate(
                [batch, np.zeros((floor - n, *batch.shape[1:]), batch.dtype)]
            )
        return forward_impl(jnp.asarray(batch))[:n]

    return forward


def make_conch_extractor(identifier: str, variant: str) -> Extractor:
    """CONCH v1.0 / v1.5 CoCa vision branch."""
    cfg = COCA_CONFIGS[variant]
    module = CoCaVisionTower(cfg)
    variables = load_or_init_params(
        module,
        (jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),),
        name=identifier,
        weight_files=(
            ["*conch*.bin", "*CONCH*.safetensors"]
            if variant == "conch"
            else ["*TITAN*.bin", "*conch*1*5*.safetensors"]
        ),
        convert=lambda sd: convert_coca_state_dict(sd, cfg),
    )
    variables = _bf16_on_device(variables)

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    use_int8 = _int8_requested()
    if use_int8:
        from dataclasses import replace

        from stamp_tpu.models.vit_image import quantize_sites, vit_quant_sites

        observe = CoCaVisionTower(replace(cfg, quant="observe"))
        int8 = CoCaVisionTower(replace(cfg, quant="int8"))

        @tpu_jit
        def _calibrate(variables, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            _, mut = observe.apply(
                variables, x.astype(jnp.bfloat16), mutable=["act_stats"]
            )
            return mut["act_stats"]

        @tpu_jit
        def _forward_int8(qvars, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return int8.apply(qvars, x.astype(jnp.bfloat16)).astype(jnp.float32)

        vars_for = int8_tower_state(
            _calibrate,
            lambda p: quantize_sites(p, vit_quant_sites(cfg.depth)),
            variables,
            identifier,
        )

        def _forward_impl(images_u8):
            return _forward_int8(vars_for(images_u8), images_u8)

    else:

        @tpu_jit
        def _forward_impl(images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return module.apply(variables, x.astype(jnp.bfloat16)).astype(
                jnp.float32
            )

    return Extractor(
        identifier=identifier,
        input_px=cfg.img_size,
        feat_dim=cfg.pooled_dim,
        transform_host=_resize_transform(cfg.img_size),
        forward=_batched(_forward_impl),
        precision="int8" if use_int8 else "bfloat16",
    )


def make_musk_extractor(identifier: str = "musk") -> Extractor:
    """MUSK BEiT3-L vision path, two-scale (reference musk.py:30-35)."""
    cfg = Beit3Config()
    module = Beit3VisionTower(cfg)
    variables = load_or_init_params(
        module,
        (jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),),
        name=identifier,
        weight_files=["*musk*.safetensors", "*MUSK*.pth"],
        convert=lambda sd: convert_beit3_state_dict(sd, cfg),
    )
    variables = _bf16_on_device(variables)

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    use_int8 = _int8_requested()
    if use_int8:
        from dataclasses import replace

        from stamp_tpu.models.beit3 import beit3_quant_sites
        from stamp_tpu.models.vit_image import quantize_sites

        observe = Beit3VisionTower(replace(cfg, quant="observe"))
        int8 = Beit3VisionTower(replace(cfg, quant="int8"))

        @tpu_jit
        def _calibrate(variables, images_u8):
            # the native-scale pass covers the crop passes' activation
            # ranges too (same normalization, same content at 2× zoom)
            x = (images_u8.astype(jnp.float32) - mean) / std
            _, mut = observe.apply(
                variables, x.astype(jnp.bfloat16), mutable=["act_stats"]
            )
            return mut["act_stats"]

        @tpu_jit
        def _forward_int8(qvars, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return multiscale_cls(int8, qvars, x.astype(jnp.bfloat16)).astype(
                jnp.float32
            )

        vars_for = int8_tower_state(
            _calibrate,
            lambda p: quantize_sites(p, beit3_quant_sites(cfg.depth)),
            variables,
            identifier,
        )

        def _forward_impl(images_u8):
            return _forward_int8(vars_for(images_u8), images_u8)

    else:

        @tpu_jit
        def _forward_impl(images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return multiscale_cls(module, variables, x.astype(jnp.bfloat16)).astype(
                jnp.float32
            )

    return Extractor(
        identifier=identifier,
        input_px=cfg.img_size,
        feat_dim=2 * cfg.width,
        transform_host=_resize_transform(cfg.img_size),
        forward=_batched(_forward_impl),
        precision="int8" if use_int8 else "bfloat16",
    )
