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
    unread = set(sd.keys()) - sd.read if isinstance(sd, dict) else set()
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
