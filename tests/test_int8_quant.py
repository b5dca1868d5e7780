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
