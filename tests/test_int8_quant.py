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
