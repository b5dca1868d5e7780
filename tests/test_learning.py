"""Learnability: the ALiBi ViT-MIL classifier must separate a planted signal.

This is the driver's first benchmark configuration ("ALiBi Transformer-MIL
binary classifier on pre-extracted synthetic features"): a fraction of each
positive patient's tiles carries a mean-shifted feature direction; after a
short training run the validation AUROC must be far above chance.
"""

import logging

import h5py
import numpy as np
import pandas as pd
import pytest

import stamp_tpu
from stamp_tpu.modeling.config import (
    AdvancedConfig,
    ModelParams,
    TrainConfig,
    VitModelParams,
)
from stamp_tpu.modeling.deploy import deploy_categorical_model_
from stamp_tpu.modeling.train import train_categorical_model_

logging.getLogger("stamp").setLevel(logging.ERROR)


def _make_cohort(tmp_path, *, n_patients=60, feat_dim=16, signal=2.0):
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rows = []
    slides = []
    direction = rng.normal(size=feat_dim)
    direction /= np.linalg.norm(direction)
    for i in range(n_patients):
        pid = f"pat{i:03d}"
        label = "pos" if i % 2 == 0 else "neg"
        n_tiles = int(rng.integers(30, 80))
        feats = rng.normal(size=(n_tiles, feat_dim)).astype(np.float32)
        if label == "pos":
            # plant the signal in ~30% of tiles
            k = max(1, int(0.3 * n_tiles))
            idx = rng.choice(n_tiles, k, replace=False)
            feats[idx] += (signal * direction).astype(np.float32)
        coords = rng.uniform(0, 10000, size=(n_tiles, 2)).astype(np.float32)
        with h5py.File(feat_dir / f"{pid}.h5", "w") as h5:
            h5["feats"] = feats
            h5["coords"] = coords
            h5.attrs["stamp_version"] = stamp_tpu.__version__
            h5.attrs["extractor"] = "synthetic"
            h5.attrs["unit"] = "um"
            h5.attrs["tile_size_um"] = 256.0
            h5.attrs["tile_size_px"] = 224
            h5.attrs["feat_type"] = "tile"
        rows.append({"patient": pid, "label": label})
        slides.append({"slide_path": f"{pid}.h5", "patient": pid})

    clini = tmp_path / "clini.csv"
    slide = tmp_path / "slide.csv"
    pd.DataFrame(rows).to_csv(clini, index=False)
    pd.DataFrame(slides).to_csv(slide, index=False)
    return clini, slide, feat_dir


@pytest.mark.slow
@pytest.mark.parametrize("use_alibi", [True, False])
def test_alibi_vit_learns_planted_signal(tmp_path, use_alibi):
    # The CLI normally seeds via AdvancedConfig; calling the workflow directly
    # leaves the global bag-sampling RNG in whatever state earlier tests left
    # it — seed locally so the trajectory does not depend on test order.
    from stamp_tpu.utils.seed import Seed

    Seed.set(0)
    clini, slide, feats = _make_cohort(tmp_path)

    cfg = TrainConfig(
        task="classification",
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="label",
        patient_label="patient",
        filename_label="slide_path",
    )
    adv = AdvancedConfig(
        model_params=ModelParams(
            vit=VitModelParams(
                dim_model=64, dim_feedforward=64, n_heads=4, use_alibi=use_alibi
            )
        ),
        max_epochs=8,
        patience=8,
        bag_size=32,
        batch_size=16,
        max_lr=1e-3,
        accelerator="cpu",
    )
    train_categorical_model_(config=cfg, advanced=adv)

    # deploy on the full cohort (includes training patients — fine for a
    # learnability check) and require near-perfect separation
    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[tmp_path / "out" / "model.ckpt"],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="label",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    from sklearn.metrics import roc_auc_score

    auroc = roc_auc_score(df["label"] == "pos", df["label_pos"])
    assert auroc > 0.95, f"model failed to learn planted signal (AUROC={auroc:.3f})"
