"""TICON extractor: H-Optimus-1 tile encoder → TICON contextualizer
(reference extractor/ticon.py:624-741; single-tile mode with zero relative
coordinates)."""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.models.ticon import TiconEncoder, convert_ticon_state_dict
from stamp_tpu.models.vit_image import VIT_CONFIGS, ImageViT, convert_torch_state_dict
from stamp_tpu.preprocessing.extractor import (
    Extractor,
    batch_floor,
    _find_torch_weights,
    _int8_requested,
    _load_torch_state_dict,
    _resize_transform,
)

_logger = logging.getLogger("stamp")


def make_ticon_extractor(identifier: str = "ticon") -> Extractor:
    cfg = VIT_CONFIGS["h_optimus"]
    tile_module = ImageViT(cfg)
    ticon_module = TiconEncoder()

    if os.environ.get("STAMP_RANDOM_WEIGHTS") == "1":
        _logger.warning(f"{identifier}: using RANDOM weights")
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            tile_vars = tile_module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
            )
            ticon_vars = ticon_module.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, 1, 1536)),
                jnp.zeros((1, 1, 2)),
            )
    else:
        tile_path = _find_torch_weights(
            ["*h-optimus-1*.safetensors", "*h_optimus_1*.bin"]
        )
        ticon_path = _find_torch_weights(["*TICON*checkpoint.pth", "*ticon*.pth"])
        if tile_path is None or ticon_path is None:
            raise FileNotFoundError(
                f"weights for '{identifier}' not found (needs both the "
                "H-Optimus-1 and TICON checkpoints in ~/.cache/stamp or "
                "STAMP_WEIGHTS_DIR)."
            )
        tile_vars = convert_torch_state_dict(_load_torch_state_dict(tile_path), cfg)
        sd = _load_torch_state_dict(ticon_path)
        sd = {
            k.removeprefix("backbone."): v
            for k, v in sd.items()
            if k.startswith("backbone.")
        } or sd
        ticon_vars = convert_ticon_state_dict(sd)

    def bf16(tree):
        return jax.device_put(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), tree)
        )

    tile_vars = bf16(tile_vars)
    ticon_vars = bf16(ticon_vars)

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    @jax.jit
    def _forward_impl(tile_vars, ticon_vars, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        emb = tile_module.apply(tile_vars, x.astype(jnp.bfloat16))  # [B, 1536]
        emb = emb[:, None, :]  # [B, 1, 1536] — single-tile context
        coords = jnp.zeros((emb.shape[0], 1, 2), emb.dtype)
        out = ticon_module.apply(ticon_vars, emb, coords)
        return out[:, 0].astype(jnp.float32)

    use_int8 = _int8_requested()
    if use_int8:
        from stamp_tpu.models.ticon import ticon_quant_sites
        from stamp_tpu.models.vit_image import (
            ViTConfig,
            quantize_sites,
            quantize_vit_params,
        )

        tile_observe = ImageViT(ViTConfig(**{**cfg.__dict__, "quant": "observe"}))
        tile_int8 = ImageViT(ViTConfig(**{**cfg.__dict__, "quant": "int8"}))
        ticon_observe = ticon_module.clone(quant="observe")
        ticon_int8 = ticon_module.clone(quant="int8")

        @jax.jit
        def _calibrate(tile_vars, ticon_vars, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            emb, tile_mut = tile_observe.apply(
                tile_vars, x.astype(jnp.bfloat16), mutable=["act_stats"]
            )
            emb = emb[:, None, :]
            coords = jnp.zeros((emb.shape[0], 1, 2), emb.dtype)
            _, ticon_mut = ticon_observe.apply(
                ticon_vars, emb, coords, mutable=["act_stats"]
            )
            return tile_mut["act_stats"], ticon_mut["act_stats"]

        @jax.jit
        def _forward_int8(tile_qvars, ticon_qvars, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            emb = tile_int8.apply(tile_qvars, x.astype(jnp.bfloat16))
            emb = emb[:, None, :]
            coords = jnp.zeros((emb.shape[0], 1, 2), emb.dtype)
            out = ticon_int8.apply(ticon_qvars, emb, coords)
            return out[:, 0].astype(jnp.float32)

        _logger.warning(
            f"{identifier}: int8 (W8A8) inference enabled — features will "
            "deviate slightly from the fp16/bf16 reference output"
        )
        int8_state: dict = {}

        def _qvars(images):
            if "tile" not in int8_state:
                tile_act, ticon_act = _calibrate(tile_vars, ticon_vars, images)
                int8_state["tile"] = {
                    "params": quantize_vit_params(tile_vars["params"], cfg),
                    "act_stats": tile_act,
                }
                int8_state["ticon"] = {
                    "params": quantize_sites(
                        ticon_vars["params"],
                        ticon_quant_sites(ticon_module.depth),
                    ),
                    "act_stats": ticon_act,
                }
            return int8_state["tile"], int8_state["ticon"]

    def forward(batch: np.ndarray):
        n = batch.shape[0]
        if n < (floor := batch_floor()):
            batch = np.concatenate(
                [batch, np.zeros((floor - n, *batch.shape[1:]), batch.dtype)]
            )
        images = jnp.asarray(batch)
        if use_int8:
            tile_q, ticon_q = _qvars(images)
            return _forward_int8(tile_q, ticon_q, images)[:n]
        return _forward_impl(tile_vars, ticon_vars, images)[:n]

    return Extractor(
        identifier=identifier,
        input_px=224,
        feat_dim=1536,
        transform_host=_resize_transform(224),
        forward=forward,
        precision="int8" if use_int8 else "bfloat16",
    )
