"""Numerical parity of the flax Swin (CTransPath backbone) against the
reference's vendored torch implementation, with identical weights.

This is the executable stand-in for the reference's CTransPath h5-parity
baseline (tests/test_feature_extractors.py:84-169): with no network egress we
cannot fetch the published weights, so instead we load the reference's torch
architecture itself (stubbing its missing third-party deps), push the SAME
random state dict through both implementations, and require
allclose(atol=1e-3) — the same tolerance as the reference baseline.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE_CTRANSPATH = Path(
    "/root/reference/src/stamp/preprocessing/extractor/ctranspath.py"
)


def _load_reference_swin():
    """Import the reference's vendored Swin with stubbed dependencies."""
    torch = pytest.importorskip("torch")

    # --- stub modules the reference file imports ---
    gdown = types.ModuleType("gdown")
    gdown.download = lambda *a, **k: None
    sys.modules.setdefault("gdown", gdown)

    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    tv_v2 = types.ModuleType("torchvision.transforms.v2")
    for name in ["Compose", "Resize", "CenterCrop", "ToImage", "ToDtype", "Normalize"]:
        setattr(tv_v2, name, lambda *a, **k: (lambda x: x))
    tv_t.v2 = tv_v2
    tv.transforms = tv_t
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_t)
    sys.modules.setdefault("torchvision.transforms.v2", tv_v2)

    stamp_pkg = types.ModuleType("stamp")
    stamp_pkg.__version__ = "2.5.0"
    stamp_pkg.__path__ = []
    stamp_utils = types.ModuleType("stamp.utils")
    stamp_cache = types.ModuleType("stamp.utils.cache")
    stamp_cache.STAMP_CACHE_DIR = Path("/tmp/stamp-cache-stub")
    stamp_cache.file_digest = lambda p: ""
    stamp_prep = types.ModuleType("stamp.preprocessing")
    stamp_prep_cfg = types.ModuleType("stamp.preprocessing.config")

    from stamp_tpu.preprocessing.config import ExtractorName

    stamp_prep_cfg.ExtractorName = ExtractorName
    stamp_prep_ext = types.ModuleType("stamp.preprocessing.extractor")

    class _StubExtractor:
        def __init__(self, **kwargs):
            self.__dict__.update(kwargs)

        def __class_getitem__(cls, item):
            return cls

    stamp_prep_ext.Extractor = _StubExtractor

    for name, mod in [
        ("stamp", stamp_pkg),
        ("stamp.utils", stamp_utils),
        ("stamp.utils.cache", stamp_cache),
        ("stamp.preprocessing", stamp_prep),
        ("stamp.preprocessing.config", stamp_prep_cfg),
        ("stamp.preprocessing.extractor", stamp_prep_ext),
    ]:
        sys.modules.setdefault(name, mod)

    spec = importlib.util.spec_from_file_location(
        "reference_ctranspath", REFERENCE_CTRANSPATH
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, torch


@pytest.mark.slow
def test_swin_matches_reference_torch_implementation():
    if not REFERENCE_CTRANSPATH.exists():
        pytest.skip("reference not mounted")

    ref, torch = _load_reference_swin()

    torch.manual_seed(0)
    model = ref._swin_tiny_patch4_window7_224(
        embed_layer=ref._ConvStem, pretrained=False
    )
    model.head = torch.nn.Identity()
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from stamp_tpu.models.swin import SwinTransformer, convert_ctranspath_state_dict

    module = SwinTransformer()
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_ctranspath_state_dict(sd)
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)

    with torch.inference_mode():
        ref_out = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    jax_out = np.asarray(module.apply(variables, jnp.asarray(x)))

    assert jax_out.shape == ref_out.shape == (2, 768)
    np.testing.assert_allclose(jax_out, ref_out, atol=1e-3)
