"""Weight-converter manifest audit.

For every architecture in the zoo, at its REAL production dimensions:
  * the converter must read EVERY key of its vendored manifest
    (tests/manifest_util.py) and no key outside it — so an upstream rename
    shows up here as a failing test, not at a user's load time;
  * the converted tree must fill every parameter of the flax module with
    the exact shape (checked against ``jax.eval_shape`` of ``module.init``,
    so no weights or FLOPs are involved even for ViT-H/-g).

This kills the "converter key strings are guessed, a rename fails at load
time with no coverage" gap (ROADMAP.md): the manifests pin the expected
upstream schema as reviewable plain text (tests/data/manifests/*.json).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifest_util import MANIFEST_DIR, all_manifests, vit_manifest


class TrackingDict(dict):
    """State-dict stand-in that records which keys the converter touches."""

    def __init__(self, manifest: dict[str, tuple]):
        super().__init__(
            {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}
        )
        self.read: set[str] = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def pop(self, key, *default):
        self.read.add(key)
        return super().pop(key, *default)


def _shape_tree(tree) -> dict[tuple, tuple]:
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[path] = tuple(node.shape)

    walk(tree, ())
    return flat


def _assert_full_coverage(name, sd: TrackingDict, converted, want_shapes):
    unread = set(sd.keys()) - sd.read if isinstance(sd, TrackingDict) else set()
    assert not unread, f"{name}: converter never read manifest keys {sorted(unread)}"
    got = _shape_tree(converted)
    missing = set(want_shapes) - set(got)
    extra = set(got) - set(want_shapes)
    assert not missing, f"{name}: converted tree lacks params {sorted(missing)}"
    assert not extra, f"{name}: converted tree has unknown params {sorted(extra)}"
    for path in want_shapes:
        assert got[path] == want_shapes[path], (
            f"{name}: {'/'.join(path)} shape {got[path]} != "
            f"module's {want_shapes[path]}"
        )


@pytest.mark.parametrize(
    "arch", sorted(__import__("stamp_tpu.models.vit_image", fromlist=["VIT_CONFIGS"]).VIT_CONFIGS)
)
def test_vit_manifest_roundtrip(arch):
    from stamp_tpu.models.vit_image import VIT_CONFIGS, ImageViT, convert_torch_state_dict

    cfg = VIT_CONFIGS[arch]
    manifest = vit_manifest(cfg)
    sd = TrackingDict(manifest)
    converted = convert_torch_state_dict(sd, cfg)

    module = ImageViT(cfg)
    shapes = jax.eval_shape(
        module.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
    )
    _assert_full_coverage(arch, sd, converted, _shape_tree(shapes))


def test_swin_manifest_roundtrip():
    from manifest_util import swin_manifest

    from stamp_tpu.models.swin import SwinTransformer, convert_ctranspath_state_dict

    manifest = swin_manifest()
    sd = TrackingDict(manifest)
    converted = convert_ctranspath_state_dict(sd)

    module = SwinTransformer()
    shapes = jax.eval_shape(
        module.init, jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    _assert_full_coverage("ctranspath", sd, converted, _shape_tree(shapes))


def test_manifest_json_artifacts_current():
    """The committed tests/data/manifests/*.json must match the generators
    (regenerate with `python -m tests.manifest_util`)."""
    manifests = all_manifests()
    for name, manifest in manifests.items():
        path = MANIFEST_DIR / (name.replace("/", "__") + ".json")
        assert path.exists(), f"missing {path} — run python -m tests.manifest_util"
        on_disk = {k: tuple(v) for k, v in json.loads(path.read_text()).items()}
        assert on_disk == manifest, f"{path} is stale — regenerate"


# ---------------------------------------------------------------------------
# CLIP / CoCa / BEiT3 / TICON / KEEP / slide encoders / CHIEF
# (VERDICT r4 item 3: every converter in the repo is manifest-audited)
# ---------------------------------------------------------------------------
#
# Converters that read the state dict in place (clip, ticon) use the
# TrackingDict read-coverage check.  Converters that normalize keys into a
# fresh dict first (coca, beit3, the slide encoders, keep, chief) are
# audited with a *necessity sweep* at reduced depth — deleting any single
# manifest key must fail the conversion, which proves the converter reads
# 100% of the manifest — plus the shape-exact module-coverage check at full
# production dimensions.


def _assert_all_keys_necessary(name, manifest: dict, convert) -> None:
    base = {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}
    convert(dict(base))  # the full manifest must convert cleanly
    for key in manifest:
        sd = dict(base)
        del sd[key]
        with pytest.raises(KeyError):
            convert(sd)


def test_clip_manifest_roundtrip():
    from manifest_util import clip_manifest

    from stamp_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionTower,
        convert_clip_vision_state_dict,
    )

    cfg = CLIPVisionConfig()
    sd = TrackingDict(clip_manifest(cfg))
    converted = convert_clip_vision_state_dict(sd, cfg)
    shapes = jax.eval_shape(
        CLIPVisionTower(cfg).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
    )
    _assert_full_coverage("clip/plip", sd, converted, _shape_tree(shapes))


def test_ticon_manifest_roundtrip():
    from manifest_util import ticon_manifest

    from stamp_tpu.models.ticon import TiconEncoder, convert_ticon_state_dict

    sd = TrackingDict(ticon_manifest())
    converted = convert_ticon_state_dict(sd)
    shapes = jax.eval_shape(
        TiconEncoder().init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 1536), jnp.float32),
        jnp.zeros((1, 4, 2), jnp.float32),
    )
    _assert_full_coverage("ticon", sd, converted, _shape_tree(shapes))


@pytest.mark.parametrize("name", ["conch", "conch1_5"])
def test_coca_manifest_roundtrip(name):
    from manifest_util import coca_manifest

    from stamp_tpu.models.coca import (
        COCA_CONFIGS,
        CoCaVisionConfig,
        CoCaVisionTower,
        convert_coca_state_dict,
    )

    cfg = COCA_CONFIGS[name]
    manifest = coca_manifest(cfg)
    converted = convert_coca_state_dict(
        {k: np.zeros(s, np.float32) for k, s in manifest.items()}, cfg
    )
    shapes = jax.eval_shape(
        CoCaVisionTower(cfg).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
    )
    _assert_full_coverage(f"coca/{name}", {}, converted, _shape_tree(shapes))

    small = CoCaVisionConfig(
        img_size=32, patch_size=16, width=32, depth=2, num_heads=4,
        pooled_dim=16, pool_heads=2,
    )
    _assert_all_keys_necessary(
        f"coca/{name}",
        coca_manifest(small),
        lambda sd: convert_coca_state_dict(sd, small),
    )


def test_beit3_manifest_roundtrip():
    from manifest_util import beit3_manifest

    from stamp_tpu.models.beit3 import (
        Beit3Config,
        Beit3VisionTower,
        convert_beit3_state_dict,
    )

    cfg = Beit3Config()
    manifest = beit3_manifest(cfg)
    converted = convert_beit3_state_dict(
        {k: np.zeros(s, np.float32) for k, s in manifest.items()}, cfg
    )
    shapes = jax.eval_shape(
        Beit3VisionTower(cfg).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
    )
    _assert_full_coverage("beit3/musk", {}, converted, _shape_tree(shapes))

    small = Beit3Config(img_size=32, patch_size=16, width=32, depth=2, num_heads=4)
    _assert_all_keys_necessary(
        "beit3/musk",
        beit3_manifest(small),
        lambda sd: convert_beit3_state_dict(sd, small),
    )


def test_keep_manifest_roundtrip():
    """KEEP = visual.-prefixed ViT-L trunk (ls stored as .weight) + head."""
    from manifest_util import keep_manifest

    from stamp_tpu.models.vit_image import (
        VIT_CONFIGS,
        ImageViT,
        convert_torch_state_dict,
    )
    from stamp_tpu.preprocessing.extractor.clip_like import keep_split_state_dict

    cfg = VIT_CONFIGS["uni"]
    manifest = keep_manifest()
    sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    trunk, head = keep_split_state_dict(sd)
    tracked = TrackingDict({k: tuple(v.shape) for k, v in trunk.items()})
    converted = convert_torch_state_dict(tracked, cfg)
    shapes = jax.eval_shape(
        ImageViT(cfg).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
    )
    _assert_full_coverage("keep/trunk", tracked, converted, _shape_tree(shapes))
    assert {k: v.shape for k, v in head.items()} == {
        "w0": (768, cfg.embed_dim), "b0": (768,), "w2": (768, 768), "b2": (768,),
    }
    # every checkpoint key must land in exactly one of trunk/head
    assert len(trunk) + 4 == len(manifest)


@pytest.mark.parametrize(
    "name",
    ["titan", "gigapath", "prism", "cobra", "madeleine"],
)
def test_slide_encoder_manifest_roundtrip(name):
    import manifest_util as mu

    from stamp_tpu.models import slide_encoders as se

    key = jax.random.PRNGKey(0)
    if name == "titan":
        manifest, convert = mu.titan_manifest(), se.convert_titan_state_dict
        shapes = jax.eval_shape(
            se.TitanViT().init, key,
            jnp.zeros((16, 768), jnp.float32), jnp.zeros((16, 2), jnp.int32),
        )
        small = (mu.titan_manifest(depth=2),
                 lambda sd: se.convert_titan_state_dict(sd, depth=2))
    elif name == "gigapath":
        manifest, convert = (
            mu.gigapath_slide_manifest(), se.convert_gigapath_slide_state_dict,
        )
        shapes = jax.eval_shape(
            se.LongNetViT().init, key,
            jnp.zeros((64, 1536), jnp.float32), jnp.zeros((64, 2), jnp.int32),
        )
        small = (mu.gigapath_slide_manifest(depth=2),
                 lambda sd: se.convert_gigapath_slide_state_dict(sd, depth=2))
    elif name == "prism":
        manifest, convert = mu.prism_manifest(), se.convert_prism_state_dict
        shapes = jax.eval_shape(
            se.PrismPerceiver().init, key, jnp.zeros((8, 2560), jnp.float32)
        )
        small = (mu.prism_manifest(depth=2),
                 lambda sd: se.convert_prism_state_dict(sd, depth=2))
    elif name == "cobra":
        manifest, convert = mu.cobra_manifest(), se.convert_cobra_state_dict
        merged: dict = {}
        for d_in in (512, 1024, 1536, 2560):
            tree = jax.eval_shape(
                se.CobraNet().init, key, jnp.zeros((64, d_in), jnp.float32)
            )
            merged.update(_shape_tree(tree))
        shapes = merged
        # embed.* heads are discovered dynamically (one per dimensionality
        # present) — a missing head is legitimately skipped, not an error,
        # so they are excluded from the necessity sweep and checked below
        small = (mu.cobra_manifest(depth=1, input_dims=()),
                 lambda sd: se.convert_cobra_state_dict(sd, depth=1))
        full = {k: np.zeros(s, np.float32) for k, s in mu.cobra_manifest().items()}
        del full["embed.1024.weight"], full["embed.1024.bias"]
        partial = se.convert_cobra_state_dict(full)
        assert "embed_512" in partial["params"] and "embed_1024" not in partial["params"]
    else:  # madeleine
        manifest, convert = mu.madeleine_manifest(), se.convert_madeleine_state_dict
        shapes = jax.eval_shape(
            se.MadeleineNet().init, key, jnp.zeros((8, 512), jnp.float32)
        )
        small = (mu.madeleine_manifest(), se.convert_madeleine_state_dict)

    converted = convert({k: np.zeros(s, np.float32) for k, s in manifest.items()})
    want = shapes if isinstance(shapes, dict) and () not in shapes and all(
        isinstance(k, tuple) for k in shapes
    ) else _shape_tree(shapes)
    _assert_full_coverage(f"slide/{name}", {}, converted, want)
    _assert_all_keys_necessary(f"slide/{name}", small[0], small[1])


def test_chief_manifest_roundtrip():
    from manifest_util import chief_manifest

    from stamp_tpu.encoding.encoder.chief import convert_chief_state_dict

    manifest = chief_manifest()
    params = convert_chief_state_dict(
        {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    )
    assert {k: v.shape for k, v in params.items()} == {
        "fc_w": (512, 768), "fc_b": (512,),
        "a_w": (256, 512), "a_b": (256,),
        "b_w": (256, 512), "b_b": (256,),
        "c_w": (1, 256), "c_b": (1,),
    }
    _assert_all_keys_necessary("chief", manifest, convert_chief_state_dict)
