"""CTransPath / CHIEF-CTransPath extractor factories (Swin backbone)."""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.models.swin import SwinTransformer, convert_ctranspath_state_dict
from stamp_tpu.preprocessing.extractor import (
    Extractor,
    batch_floor,
    _find_torch_weights,
    _int8_requested,
    _load_torch_state_dict,
    _resize_transform,
    int8_tower_state,
)

_logger = logging.getLogger("stamp")

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def make_ctranspath_extractor(
    *, identifier: str, weight_hint: str = "ctranspath"
) -> Extractor:
    module = SwinTransformer()

    if os.environ.get("STAMP_RANDOM_WEIGHTS") == "1":
        _logger.warning(
            f"{identifier}: using RANDOM weights (STAMP_RANDOM_WEIGHTS=1)"
        )
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    else:
        path = _find_torch_weights(
            [f"*{weight_hint}*.pth", f"*{weight_hint}*.bin", f"{weight_hint}.pth"]
        )
        if path is None:
            raise FileNotFoundError(
                f"no weights found for extractor '{identifier}'. Pre-seed the "
                "checkpoint into ~/.cache/stamp or set STAMP_WEIGHTS_DIR; "
                "set STAMP_RANDOM_WEIGHTS=1 for benchmarking without weights."
            )
        _logger.info(f"{identifier}: porting torch weights from {path}")
        sd = _load_torch_state_dict(path)
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_ctranspath_state_dict(sd)
        )

    mean = jnp.asarray(_IMAGENET_MEAN, dtype=jnp.float32) * 255.0
    std = jnp.asarray(_IMAGENET_STD, dtype=jnp.float32) * 255.0

    variables = jax.device_put(variables)  # weights as jit args, not constants

    @jax.jit
    def _forward_impl(variables, images_u8: jax.Array) -> jax.Array:
        x = (images_u8.astype(jnp.float32) - mean) / std
        # full-f32 matmuls: the h5-parity contract is allclose(atol=1e-3)
        # against the reference (tests/test_feature_extractors.py:140-169);
        # TPU fp32 matmuls otherwise default to bf16 MXU passes
        with jax.default_matmul_precision("highest"):
            return module.apply(variables, x)

    use_int8 = _int8_requested()
    if use_int8:
        from stamp_tpu.models.swin import swin_quant_sites
        from stamp_tpu.models.vit_image import quantize_sites

        observe = module.clone(quant="observe")
        int8 = module.clone(quant="int8")

        @jax.jit
        def _calibrate(variables, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            _, mut = observe.apply(variables, x, mutable=["act_stats"])
            return mut["act_stats"]

        @jax.jit
        def _forward_int8(qvars, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return int8.apply(qvars, x).astype(jnp.float32)

        vars_for = int8_tower_state(
            _calibrate,
            lambda p: quantize_sites(p, swin_quant_sites(module.depths)),
            variables,
            identifier,
        )

    def forward(batch: np.ndarray) -> jax.Array:
        n = batch.shape[0]
        if n < (floor := batch_floor()):
            batch = np.concatenate(
                [batch, np.zeros((floor - n, *batch.shape[1:]), batch.dtype)]
            )
        images = jnp.asarray(batch)
        if use_int8:
            return _forward_int8(vars_for(images), images)[:n]
        return _forward_impl(variables, images)[:n]

    return Extractor(
        identifier=identifier,
        input_px=224,
        feat_dim=768,
        transform_host=_resize_transform(224),
        forward=forward,
        precision="int8" if use_int8 else "bfloat16",
    )
