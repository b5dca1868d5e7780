"""Numerical parity of the flax TICON encoder against the reference's
vendored torch implementation with identical weights (same pattern as
test_swin_parity.py; tolerance matches the reference's pinned-h5 baseline,
tests/test_feature_extractors.py:140-169, atol 1e-3)."""

import importlib.util
import sys
import types
from functools import partial
from pathlib import Path

import numpy as np
import pytest

REFERENCE_TICON = Path("/root/reference/src/stamp/preprocessing/extractor/ticon.py")


def _load_reference_ticon():
    """Import the reference's vendored TICON with stubbed dependencies."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("jaxtyping")

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
        return mod

    stub("timm", create_model=lambda *a, **k: None)
    stub("huggingface_hub", hf_hub_download=lambda *a, **k: None)
    tv = stub("torchvision")
    tv_t = stub("torchvision.transforms")
    for name in ["Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"]:
        setattr(tv_t, name, lambda *a, **k: (lambda x: x))
    tv.transforms = tv_t

    stamp_pkg = stub("stamp")
    stamp_pkg.__path__ = []
    stamp_prep = stub("stamp.preprocessing")
    stamp_prep.__path__ = []
    class _StubExtractor:
        def __init__(self, **kwargs):
            pass

        def __class_getitem__(cls, item):  # Extractor[nn.Module] annotation
            return cls

    stub("stamp.preprocessing.extractor", Extractor=_StubExtractor)

    spec = importlib.util.spec_from_file_location("ref_ticon", REFERENCE_TICON)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return torch, mod


@pytest.mark.skipif(not REFERENCE_TICON.exists(), reason="reference not available")
def test_ticon_encoder_matches_reference_torch():
    torch, ref = _load_reference_ticon()

    from stamp_tpu.models.ticon import TiconEncoder, convert_ticon_state_dict

    DIM, DEPTH, HEADS, IN = 48, 2, 4, 32
    torch.manual_seed(0)
    norm_layer = partial(torch.nn.LayerNorm, eps=1e-5)

    input_proj = ref.ProjectionMlp(IN, DIM, DIM)
    transformer = ref.Transformer(
        embed_dim=DIM,
        norm_layer=norm_layer,
        depth=DEPTH,
        drop_path_rate=0,
        block_kwargs={"attn_kwargs": {"num_heads": HEADS}},
    )
    enc_norm = torch.nn.LayerNorm(DIM, eps=1e-5)
    for m in (input_proj, transformer, enc_norm):
        m.eval()
        # non-default weights so the test can't pass on zero/identity params
        for p in m.parameters():
            if p.dim() >= 1:
                torch.nn.init.normal_(p, std=0.1)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, 37, IN)).astype(np.float32)
    coords = (rng.uniform(0, 50, size=(1, 37, 2))).astype(np.float32)

    with torch.inference_mode():
        x = input_proj(torch.from_numpy(feats))
        x = transformer(
            x, return_layers={DEPTH}, coords=torch.from_numpy(coords)
        )[DEPTH]
        expected = enc_norm(x).numpy()

    # assemble the checkpoint layout convert_ticon_state_dict expects
    sd = {}
    for key, value in input_proj.state_dict().items():
        sd[f"input_proj_dict.input_proj_hoptimus1.{key}"] = value.numpy()
    for key, value in transformer.state_dict().items():
        sd[f"encoder.{key}"] = value.numpy()
    for key, value in enc_norm.state_dict().items():
        sd[f"enc_norm.{key}"] = value.numpy()

    variables = convert_ticon_state_dict(sd, depth=DEPTH)

    import jax.numpy as jnp

    module = TiconEncoder(embed_dim=DIM, depth=DEPTH, num_heads=HEADS, in_dim=IN)
    ours = np.asarray(
        module.apply(variables, jnp.asarray(feats), jnp.asarray(coords))
    )
    np.testing.assert_allclose(ours, expected, atol=1e-3)
