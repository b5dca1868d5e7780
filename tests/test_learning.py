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


def _planted_cohort(tmp_path, *, n_patients, feat_dim, make_row):
    """Cohort where patient i's tiles are shifted by strength[i]·direction;
    ``make_row(pid, strength)`` emits the clini-table row."""
    rng = np.random.default_rng(1)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    direction = rng.normal(size=feat_dim)
    direction /= np.linalg.norm(direction)
    rows, slides = [], []
    for i in range(n_patients):
        pid = f"pat{i:03d}"
        strength = float(rng.uniform(0.0, 3.0))
        n_tiles = int(rng.integers(30, 60))
        feats = rng.normal(size=(n_tiles, feat_dim)).astype(np.float32)
        feats += (strength * direction).astype(np.float32)
        with h5py.File(feat_dir / f"{pid}.h5", "w") as h5:
            h5["feats"] = feats
            h5["coords"] = rng.uniform(0, 10000, size=(n_tiles, 2)).astype(
                np.float32
            )
            h5.attrs["stamp_version"] = stamp_tpu.__version__
            h5.attrs["extractor"] = "synthetic"
            h5.attrs["unit"] = "um"
            h5.attrs["tile_size_um"] = 256.0
            h5.attrs["tile_size_px"] = 224
            h5.attrs["feat_type"] = "tile"
        rows.append(make_row(pid, strength, rng))
        slides.append({"slide_path": f"{pid}.h5", "patient": pid})
    clini, slide = tmp_path / "clini.csv", tmp_path / "slide.csv"
    pd.DataFrame(rows).to_csv(clini, index=False)
    pd.DataFrame(slides).to_csv(slide, index=False)
    return clini, slide, feat_dir


def _train_and_deploy(tmp_path, clini, slide, feats, *, task, **labels):
    from stamp_tpu.utils.seed import Seed

    Seed.set(0)
    cfg = TrainConfig(
        task=task,
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        patient_label="patient",
        filename_label="slide_path",
        **labels,
    )
    adv = AdvancedConfig(
        model_params=ModelParams(
            vit=VitModelParams(dim_model=64, dim_feedforward=64, n_heads=4)
        ),
        max_epochs=12,
        patience=12,
        bag_size=32,
        batch_size=16,
        max_lr=1e-3,
        accelerator="cpu",
    )
    train_categorical_model_(config=cfg, advanced=adv)
    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[tmp_path / "out" / "model.ckpt"],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label=labels.get("ground_truth_label"),
        time_label=labels.get("time_label"),
        status_label=labels.get("status_label"),
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    return pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")


@pytest.mark.slow
def test_regression_learns_planted_signal(tmp_path):
    """End-to-end regression: the target is the planted shift strength, so
    the deployed predictions must correlate strongly with it."""
    clini, slide, feats = _planted_cohort(
        tmp_path,
        n_patients=48,
        feat_dim=16,
        make_row=lambda pid, s, rng: {"patient": pid, "value": s},
    )
    df = _train_and_deploy(
        tmp_path, clini, slide, feats,
        task="regression", ground_truth_label="value",
    )
    pearson = np.corrcoef(df["value"], df["pred"])[0, 1]
    assert pearson > 0.7, f"regression failed to learn (pearson={pearson:.3f})"


@pytest.mark.slow
def test_survival_learns_planted_signal(tmp_path):
    """End-to-end survival: follow-up time decays with the planted risk, so
    the deployed risk scores must rank patients (C-index well above 0.5)."""
    from stamp_tpu.statistics.survival_util import concordance_index

    def make_row(pid, s, rng):
        time = float(1000.0 * np.exp(-s) * np.exp(rng.normal(0, 0.1)))
        return {"patient": pid, "day": time, "status": int(rng.random() < 0.8)}

    clini, slide, feats = _planted_cohort(
        tmp_path, n_patients=48, feat_dim=16, make_row=make_row
    )
    df = _train_and_deploy(
        tmp_path, clini, slide, feats,
        task="survival", time_label="day", status_label="status",
    )
    # higher risk = shorter survival → negate for the lifelines convention
    cindex = concordance_index(df["day"], -df["pred_score"], df["status"])
    assert cindex > 0.7, f"survival model failed to rank risk (C={cindex:.3f})"
