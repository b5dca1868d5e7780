"""CLIP-family extractor factories: PLIP (CLIP ViT-B/32) and KEEP
(timm ViT-L + projection head)."""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from stamp_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionTower,
    convert_clip_vision_state_dict,
)
from stamp_tpu.models.vit_image import (
    VIT_CONFIGS,
    ImageViT,
    convert_torch_state_dict,
)
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


def _bf16(tree):
    return jax.device_put(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), tree)
    )


def make_plip_extractor(identifier: str = "plip") -> Extractor:
    """PLIP: CLIP ViT-B/32 image features (reference extractor/plip.py)."""
    cfg = CLIPVisionConfig()
    module = CLIPVisionTower(cfg)

    if os.environ.get("STAMP_RANDOM_WEIGHTS") == "1":
        _logger.warning(f"{identifier}: using RANDOM weights")
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
            )
    else:
        path = _find_torch_weights(
            ["*plip*pytorch_model.bin", "*plip*.safetensors"]
        )
        if path is None:
            raise FileNotFoundError(
                f"no weights found for extractor '{identifier}'. Pre-seed the "
                "vinid/plip checkpoint into ~/.cache/stamp or STAMP_WEIGHTS_DIR."
            )
        sd = _load_torch_state_dict(path)
        variables = convert_clip_vision_state_dict(sd, cfg)

    variables = _bf16(variables)

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    @jax.jit
    def _forward_impl(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        return module.apply(variables, x.astype(jnp.bfloat16)).astype(jnp.float32)

    use_int8 = _int8_requested()
    if use_int8:
        from dataclasses import replace

        from stamp_tpu.models.clip_vision import clip_quant_sites
        from stamp_tpu.models.vit_image import quantize_sites

        observe = CLIPVisionTower(replace(cfg, quant="observe"))
        int8 = CLIPVisionTower(replace(cfg, quant="int8"))

        @jax.jit
        def _calibrate(variables, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            _, mut = observe.apply(
                variables, x.astype(jnp.bfloat16), mutable=["act_stats"]
            )
            return mut["act_stats"]

        @jax.jit
        def _forward_int8(qvars, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            return int8.apply(qvars, x.astype(jnp.bfloat16)).astype(jnp.float32)

        vars_for = int8_tower_state(
            _calibrate,
            lambda p: quantize_sites(p, clip_quant_sites(cfg.depth)),
            variables,
            identifier,
        )

    def forward(batch: np.ndarray):
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
        input_px=cfg.img_size,
        feat_dim=cfg.projection_dim,
        transform_host=_resize_transform(cfg.img_size),
        forward=forward,
        precision="int8" if use_int8 else "bfloat16",
    )


def keep_split_state_dict(sd: dict) -> tuple[dict, dict]:
    """Split a KEEP checkpoint into (timm trunk sd, head params).

    The reference keep.py remaps ls1/ls2 ``.weight`` → ``.gamma`` and strips
    the ``visual.`` prefix before handing the trunk to timm; the
    ``visual_head`` Sequential (Linear → GELU → Linear) becomes the
    projection head.  Mirrored here so the trunk feeds
    ``convert_torch_state_dict`` unchanged."""
    trunk: dict = {}
    head_sd: dict = {}
    for k, v in sd.items():
        if k.startswith("visual_head."):
            head_sd[k] = v
        elif k.startswith("visual."):
            kk = k[len("visual.") :]
            if ".ls1.weight" in kk or ".ls2.weight" in kk:
                kk = kk.replace(".weight", ".gamma")
            trunk[kk] = v
    head = {
        "w0": np.asarray(head_sd["visual_head.0.weight"]),
        "b0": np.asarray(head_sd["visual_head.0.bias"]),
        "w2": np.asarray(head_sd["visual_head.2.weight"]),
        "b2": np.asarray(head_sd["visual_head.2.bias"]),
    }
    return trunk, head


def make_keep_extractor(identifier: str = "keep") -> Extractor:
    """KEEP: timm ViT-L/16 backbone + (Linear→GELU→Linear→ℓ2) head
    (reference extractor/keep.py)."""
    cfg = VIT_CONFIGS["uni"]  # ViT-L/16 w/ layerscale — same trunk family
    module = ImageViT(cfg)
    projection_dim = 768

    if os.environ.get("STAMP_RANDOM_WEIGHTS") == "1":
        _logger.warning(f"{identifier}: using RANDOM weights")
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
            )
        rng = np.random.default_rng(0)
        head = {
            "w0": rng.normal(0, 0.02, (projection_dim, cfg.embed_dim)).astype(
                np.float32
            ),
            "b0": np.zeros(projection_dim, np.float32),
            "w2": rng.normal(0, 0.02, (projection_dim, projection_dim)).astype(
                np.float32
            ),
            "b2": np.zeros(projection_dim, np.float32),
        }
    else:
        path = _find_torch_weights(["*KEEP*.safetensors", "*keep*model.safetensors"])
        if path is None:
            raise FileNotFoundError(
                f"no weights found for extractor '{identifier}'. Pre-seed the "
                "KEEP checkpoint into ~/.cache/stamp or STAMP_WEIGHTS_DIR."
            )
        sd = _load_torch_state_dict(path)
        trunk, head = keep_split_state_dict(sd)
        variables = convert_torch_state_dict(trunk, cfg)

    variables = _bf16(variables)
    head = jax.device_put(jax.tree_util.tree_map(jnp.asarray, head))

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, dtype=jnp.float32) * 255.0

    def _head_proj(feats, head):
        h = feats @ head["w0"].T + head["b0"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ head["w2"].T + head["b2"]
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)

    @jax.jit
    def _forward_impl(variables, head, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) / std
        feats = module.apply(variables, x.astype(jnp.bfloat16)).astype(jnp.float32)
        return _head_proj(feats, head)

    use_int8 = _int8_requested()
    if use_int8:
        from dataclasses import replace

        from stamp_tpu.models.vit_image import quantize_vit_params

        trunk_observe = ImageViT(replace(cfg, quant="observe"))
        trunk_int8 = ImageViT(replace(cfg, quant="int8"))

        @jax.jit
        def _calibrate(variables, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            _, mut = trunk_observe.apply(
                variables, x.astype(jnp.bfloat16), mutable=["act_stats"]
            )
            return mut["act_stats"]

        @jax.jit
        def _forward_int8(qvars, head, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) / std
            feats = trunk_int8.apply(qvars, x.astype(jnp.bfloat16)).astype(
                jnp.float32
            )
            return _head_proj(feats, head)

        vars_for = int8_tower_state(
            _calibrate,
            lambda p: quantize_vit_params(p, cfg),
            variables,
            identifier,
        )

    def forward(batch: np.ndarray):
        n = batch.shape[0]
        if n < (floor := batch_floor()):
            batch = np.concatenate(
                [batch, np.zeros((floor - n, *batch.shape[1:]), batch.dtype)]
            )
        images = jnp.asarray(batch)
        if use_int8:
            return _forward_int8(vars_for(images), head, images)[:n]
        return _forward_impl(variables, head, images)[:n]

    return Extractor(
        identifier=identifier,
        input_px=224,
        feat_dim=projection_dim,
        transform_host=_resize_transform(224),
        forward=forward,
        precision="int8" if use_int8 else "bfloat16",
    )
