"""Opt-in int8 (W8A8) quantized extraction."""

import numpy as np


def test_int8_quantized_extractor(monkeypatch):
    """Opt-in W8A8 extraction (STAMP_INT8_EXTRACTION=1): per-out-channel int8
    weights + first-batch-calibrated static activation scales.  Features must
    stay directionally faithful to the bf16 path (cos > 0.98 even on random
    weights, the worst case for quantization)."""
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.models.vit_image import VIT_CONFIGS, ViTConfig
    from stamp_tpu.preprocessing.extractor import make_vit_extractor

    monkeypatch.setitem(
        VIT_CONFIGS,
        "test-int8",
        ViTConfig(
            patch_size=32, embed_dim=64, depth=2, num_heads=2, ffn="swiglu",
            mlp_ratio=4.0,
        ),
    )
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (4, 224, 224, 3), dtype=np.uint8)
    batch2 = rng.integers(0, 255, (4, 224, 224, 3), dtype=np.uint8)

    ref = np.asarray(
        make_vit_extractor(
            identifier="t-bf16", arch="test-int8", weight_files=[]
        ).forward(batch)
    )
    monkeypatch.setenv("STAMP_INT8_EXTRACTION", "1")
    ext_q = make_vit_extractor(
        identifier="t-int8", arch="test-int8", weight_files=[]
    )
    quant = np.asarray(ext_q.forward(batch))  # first batch also calibrates
    quant2 = np.asarray(ext_q.forward(batch2))  # held-out batch, frozen scales
    ref2 = np.asarray(
        make_vit_extractor(
            identifier="t-bf16b", arch="test-int8", weight_files=[]
        ).forward(batch2)
    )
    monkeypatch.delenv("STAMP_INT8_EXTRACTION")

    for r, q in [(ref, quant), (ref2, quant2)]:
        cos = (r * q).sum(-1) / (
            np.linalg.norm(r, axis=-1) * np.linalg.norm(q, axis=-1)
        )
        assert (cos > 0.98).all(), cos


def test_int8_config_surface(tmp_path, monkeypatch):
    """`preprocessing.extractor_precision: int8` drives the quantized path
    through the real extract_ entry point and stamps provenance attrs."""
    import h5py
    from PIL import Image

    from stamp_tpu.models.vit_image import VIT_CONFIGS, ViTConfig
    from stamp_tpu.preprocessing.config import PreprocessingConfig
    from stamp_tpu.preprocessing.extract import extract_
    from stamp_tpu.preprocessing.extractor import make_vit_extractor

    # the config field validates
    cfg = PreprocessingConfig(
        output_dir=tmp_path, wsi_dir=tmp_path, extractor="uni2",
        extractor_precision="int8",
    )
    assert cfg.extractor_precision == "int8"

    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    monkeypatch.setitem(
        VIT_CONFIGS,
        "test-int8-cfg",
        ViTConfig(patch_size=32, embed_dim=32, depth=1, num_heads=2),
    )
    # the config-layer override (what extract_ sets for name-resolved
    # extractors) must flip newly built extractors to the quantized path
    from stamp_tpu.preprocessing.extractor import set_int8_extraction

    set_int8_extraction(True)
    try:
        ext = make_vit_extractor(
            identifier="test-int8-cfg", arch="test-int8-cfg", weight_files=[]
        )
    finally:
        set_int8_extraction(None)

    rng = np.random.default_rng(0)
    wsi_dir = tmp_path / "wsis"
    wsi_dir.mkdir()
    Image.fromarray(
        rng.integers(60, 200, (448, 448, 3), dtype=np.uint8)
    ).save(wsi_dir / "s.tif", format="TIFF", compression="tiff_lzw",
           resolution=10000.0, resolution_unit=3)

    # the config field reaches name-resolved extractors: extract_ must set
    # the int8 override exactly around resolution
    from stamp_tpu.preprocessing.extractor import _int8_requested
    from stamp_tpu.preprocessing.extractor import zoo as _zoo

    seen = {}

    def fake_resolve(name):
        seen["int8_at_resolve"] = _int8_requested()
        return ext

    monkeypatch.setattr(_zoo, "resolve_extractor", fake_resolve)
    extract_(
        wsi_dir=wsi_dir,
        output_dir=tmp_path / "out",
        wsi_list=None,
        cache_dir=None,
        cache_tiles_ext=".jpg",
        extractor="uni2",  # name-resolved through the (patched) zoo
        tile_size_px=224,
        tile_size_um=224.0,
        max_workers=2,
        default_slide_mpp=1.0,
        generate_hash=False,
        extractor_precision="int8",
    )
    assert seen["int8_at_resolve"] is True
    assert _int8_requested() is False  # override reset after resolution
    h5s = list((tmp_path / "out").rglob("*.h5"))
    assert len(h5s) == 1
    # int8 cohorts live in their own directory — resumed runs can't mix modes
    assert h5s[0].parent.name.endswith("-int8")
    with h5py.File(h5s[0]) as f:
        assert f.attrs["precision"] == "int8"
        feats = np.asarray(f["feats"], np.float32)
        assert np.isfinite(feats).all()

    # the quantized forward really ran: its features differ from a bf16
    # extractor with the same weights, but only slightly
    ext_bf16 = make_vit_extractor(
        identifier="test-int8-cfg-b", arch="test-int8-cfg", weight_files=[]
    )
    rng2 = np.random.default_rng(1)
    batch = rng2.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    q = np.asarray(ext.forward(batch))
    r = np.asarray(ext_bf16.forward(batch))
    assert not np.array_equal(q, r)
    cos = (q * r).sum(-1) / (
        np.linalg.norm(q, axis=-1) * np.linalg.norm(r, axis=-1)
    )
    assert (cos > 0.98).all()


def _cos(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )


def test_int8_breadth_all_towers():
    """Every tower architecture (CoCa, BEiT3, CLIP, Swin, TICON) supports
    the observe→quantize→int8 flow; int8 features stay directionally
    faithful (cos > 0.98) to the bf16 forward on random weights."""
    from dataclasses import replace

    import jax
    import jax.numpy as jnp

    from stamp_tpu.models.beit3 import Beit3Config, Beit3VisionTower, beit3_quant_sites
    from stamp_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionTower,
        clip_quant_sites,
    )
    from stamp_tpu.models.coca import CoCaVisionConfig, CoCaVisionTower
    from stamp_tpu.models.swin import SwinTransformer, swin_quant_sites
    from stamp_tpu.models.ticon import TiconEncoder, ticon_quant_sites
    from stamp_tpu.models.vit_image import quantize_sites, vit_quant_sites

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    coca_cfg = CoCaVisionConfig(
        img_size=32, patch_size=16, width=32, depth=2, num_heads=4,
        pooled_dim=16, pool_heads=4,
    )
    clip_cfg = CLIPVisionConfig(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
        mlp_dim=64, projection_dim=16,
    )
    beit_cfg = Beit3Config(img_size=32, patch_size=16, width=32, depth=2, num_heads=4)

    cases = [
        (
            "coca",
            lambda mode: CoCaVisionTower(replace(coca_cfg, quant=mode)),
            vit_quant_sites(2),
            (images,),
        ),
        (
            "clip",
            lambda mode: CLIPVisionTower(replace(clip_cfg, quant=mode)),
            clip_quant_sites(2),
            (images,),
        ),
        (
            "beit3",
            lambda mode: Beit3VisionTower(replace(beit_cfg, quant=mode)),
            beit3_quant_sites(2),
            (images,),
        ),
        (
            "swin",
            lambda mode: SwinTransformer(
                img_size=32, embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                window=4, quant=mode,
            ),
            swin_quant_sites((1, 1)),
            (images,),
        ),
        (
            "ticon",
            lambda mode: TiconEncoder(
                embed_dim=32, depth=2, num_heads=4, in_dim=16, quant=mode
            ),
            ticon_quant_sites(2),
            (
                jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32)),
                jnp.asarray(rng.uniform(0, 9, size=(2, 6, 2)).astype(np.float32)),
            ),
        ),
    ]

    for name, make, sites, args in cases:
        variables = make("off").init(jax.random.PRNGKey(0), *args)
        ref = np.asarray(make("off").apply(variables, *args))

        _, mut = make("observe").apply(variables, *args, mutable=["act_stats"])
        qvars = {
            "params": quantize_sites(variables["params"], sites),
            "act_stats": mut["act_stats"],
        }
        quant = np.asarray(make("int8").apply(qvars, *args))
        assert quant.shape == ref.shape, name
        cos = _cos(ref.reshape(-1, ref.shape[-1]), quant.reshape(-1, quant.shape[-1]))
        assert (cos > 0.98).all(), (name, cos.min())


def test_int8_keep_factory(monkeypatch):
    """The KEEP factory (ViT-L trunk + projection head) honors
    STAMP_INT8_EXTRACTION — the last zoo member to gain int8 coverage."""
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    # keep's trunk is ViT-L — cap the pad floor so the CPU test stays fast
    monkeypatch.setenv("STAMP_EXTRACT_BATCH", "2")
    from stamp_tpu.preprocessing.extractor.clip_like import make_keep_extractor

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)

    ref_ext = make_keep_extractor(identifier="keep-bf16")
    assert ref_ext.precision == "bfloat16"
    ref = np.asarray(ref_ext.forward(batch))

    monkeypatch.setenv("STAMP_INT8_EXTRACTION", "1")
    q_ext = make_keep_extractor(identifier="keep-int8")
    assert q_ext.precision == "int8"
    quant = np.asarray(q_ext.forward(batch))
    monkeypatch.delenv("STAMP_INT8_EXTRACTION")

    assert (_cos(ref, quant) > 0.98).all()


def test_int8_ctranspath_factory(monkeypatch):
    """The Swin factory honors STAMP_INT8_EXTRACTION end to end and reports
    int8 precision for artifact provenance."""
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.preprocessing.extractor.swin import make_ctranspath_extractor

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)

    ref_ext = make_ctranspath_extractor(identifier="ctp-bf16")
    assert ref_ext.precision == "bfloat16"
    ref = np.asarray(ref_ext.forward(batch))

    monkeypatch.setenv("STAMP_INT8_EXTRACTION", "1")
    q_ext = make_ctranspath_extractor(identifier="ctp-int8")
    assert q_ext.precision == "int8"
    quant = np.asarray(q_ext.forward(batch))
    monkeypatch.delenv("STAMP_INT8_EXTRACTION")

    assert (_cos(ref, quant) > 0.98).all()


def test_int8_fused_ln_dense_model_level(monkeypatch):
    """Model-level wiring of the FUSED int8 path (vit_image QuantDense →
    ops/ln_dense.ln_quant_dense): CI runs on CPU where _use_fused_ln_dense
    is False, so a wiring regression (e.g. a bias double-add around the
    fused call) would only ever surface on TPU.  Force the fused branch on
    with pallas in interpret mode and pin it against the unfused branch.
    Dims are chosen so every QuantDense site tiles (k, n multiples of 128
    with n ≥ 256; tokens×batch a multiple of 256)."""
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from stamp_tpu.models import vit_image
    from stamp_tpu.models.vit_image import (
        ImageViT,
        ViTConfig,
        quantize_vit_params,
    )

    cfg_f = ViTConfig(
        img_size=64,
        patch_size=32,
        embed_dim=256,
        depth=1,
        num_heads=2,
        mlp_ratio=4.0,
        quant="off",
    )
    # tokens = 4 patches + 1 cls = 5; batch 64 → m = 320... need %256 == 0:
    # batch 256 → m = 1280 (bm=256 tiles).  Keep depth 1 for interpret speed.
    batch = 256
    import jax

    variables = ImageViT(cfg_f).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    qparams = quantize_vit_params(variables["params"], cfg_f)
    act_stats = {
        "block_0": {
            "attn": {k: {"amax": jnp.float32(30.0)} for k in ("qkv", "proj")},
            "mlp": {k: {"amax": jnp.float32(30.0)} for k in ("fc1", "fc2")},
        }
    }
    cfg_q = ViTConfig(**{**cfg_f.__dict__, "quant": "int8"})
    qvars = {"params": qparams, "act_stats": act_stats}
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(batch, 64, 64, 3)).astype(np.float32))

    unfused = np.asarray(ImageViT(cfg_q).apply(qvars, x))

    monkeypatch.setattr(vit_image, "_use_fused_ln_dense", lambda: True)
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    fused = np.asarray(ImageViT(cfg_q).apply(qvars, x))

    # identical quantize + exact i32 dots; only the f32-vs-cast bias order
    # differs (ops/ln_dense.py docstring) — tolerance covers that ulp
    np.testing.assert_allclose(fused, unfused, atol=1e-4, rtol=1e-4)
    assert np.abs(fused).max() > 0  # not trivially zero
