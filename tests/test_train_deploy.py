"""End-to-end train→deploy for every task and feature level
(coverage mirroring reference tests/test_train_deploy.py)."""

import logging

import pandas as pd
import pytest

from random_data import (
    create_random_dataset,
    create_random_multi_target_dataset,
    create_random_patient_level_dataset,
    create_random_regression_dataset,
    create_random_survival_dataset,
)
from stamp_tpu.modeling.config import (
    AdvancedConfig,
    ModelParams,
    TrainConfig,
    VitModelParams,
)
from stamp_tpu.modeling.deploy import deploy_categorical_model_
from stamp_tpu.modeling.registry import ModelName
from stamp_tpu.modeling.train import train_categorical_model_

logging.getLogger("stamp").setLevel(logging.ERROR)


def _small_advanced(**kwargs) -> AdvancedConfig:
    defaults = dict(
        model_params=ModelParams(
            vit=VitModelParams(dim_model=32, dim_feedforward=32, n_heads=4)
        ),
        max_epochs=2,
        patience=2,
        bag_size=16,
        batch_size=8,
        accelerator="cpu",
    )
    defaults.update(kwargs)
    return AdvancedConfig(**defaults)


@pytest.mark.slow
@pytest.mark.parametrize("use_alibi", [False, True])
def test_classification_tile(tmp_path, use_alibi):
    clini, slide, feats, cats = create_random_dataset(
        dir=tmp_path,
        n_patients=24,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=32,
        feat_dim=12,
        n_categories=2,
    )
    cfg = TrainConfig(
        task="classification",
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="ground-truth",
        patient_label="patient",
        filename_label="slide_path",
    )
    adv = _small_advanced(
        model_params=ModelParams(
            vit=VitModelParams(
                dim_model=32, dim_feedforward=32, n_heads=4, use_alibi=use_alibi
            )
        )
    )
    train_categorical_model_(config=cfg, advanced=adv)
    assert (tmp_path / "out" / "model.ckpt").exists()

    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[tmp_path / "out" / "model.ckpt"],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="ground-truth",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    assert set(df.columns) == {
        "patient",
        "ground-truth",
        "pred",
        *{f"ground-truth_{c}" for c in cats},
        "loss",
    }
    # softmax scores sum to 1
    score_cols = [f"ground-truth_{c}" for c in cats]
    assert ((df[score_cols].sum(axis=1) - 1).abs() < 1e-5).all()


@pytest.mark.slow
def test_regression_tile(tmp_path):
    clini, slide, feats, _ = create_random_regression_dataset(
        dir=tmp_path,
        n_patients=20,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        feat_dim=12,
    )
    cfg = TrainConfig(
        task="regression",
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="target",
        patient_label="patient",
        filename_label="slide_path",
    )
    train_categorical_model_(config=cfg, advanced=_small_advanced())
    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[tmp_path / "out" / "model.ckpt"],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="target",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    assert {"patient", "target", "pred", "loss"} <= set(df.columns)


@pytest.mark.slow
def test_survival_tile(tmp_path):
    clini, slide, feats, _ = create_random_survival_dataset(
        dir=tmp_path,
        n_patients=24,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        feat_dim=12,
    )
    cfg = TrainConfig(
        task="survival",
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        time_label="day",
        status_label="status",
        patient_label="patient",
        filename_label="slide_path",
    )
    train_categorical_model_(config=cfg, advanced=_small_advanced())
    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[tmp_path / "out" / "model.ckpt"],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label=None,
        time_label="day",
        status_label="status",
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    assert {"patient", "pred_score", "day", "status"} <= set(df.columns)
    # cut_off marker column from the train_pred_median hparam
    assert any(c.startswith("cut_off=") for c in df.columns)


@pytest.mark.slow
def test_classification_patient_level(tmp_path):
    clini, _slide, feats, cats = create_random_patient_level_dataset(
        dir=tmp_path, n_patients=30, feat_dim=12, n_categories=2
    )
    cfg = TrainConfig(
        task="classification",
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=None,
        feature_dir=feats,
        ground_truth_label="ground-truth",
        patient_label="patient",
        filename_label="slide_path",
    )
    train_categorical_model_(config=cfg, advanced=_small_advanced())
    assert (tmp_path / "out" / "model.ckpt").exists()

    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[tmp_path / "out" / "model.ckpt"],
        clini_table=clini,
        slide_table=None,
        feature_dir=feats,
        ground_truth_label="ground-truth",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    assert len(df) == 30


@pytest.mark.slow
def test_multitarget_barspoon(tmp_path):
    clini, slide, feats, _cats = create_random_multi_target_dataset(
        dir=tmp_path,
        n_patients=24,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        feat_dim=12,
        target_labels=["KRAS", "BRAF"],
        categories_per_target=[["mut", "wt"], ["mut", "wt"]],
    )
    cfg = TrainConfig(
        task="classification",
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label=["KRAS", "BRAF"],
        patient_label="patient",
        filename_label="slide_path",
    )
    adv = _small_advanced(model_name=ModelName.BARSPOON)
    train_categorical_model_(config=cfg, advanced=adv)

    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[tmp_path / "out" / "model.ckpt"],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label=["KRAS", "BRAF"],
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    for t in ["KRAS", "BRAF"]:
        assert t in df.columns
        assert f"pred_{t}" in df.columns
        for c in ["mut", "wt"]:
            assert f"{t}_{c}" in df.columns


@pytest.mark.slow
def test_ensemble_deploy(tmp_path):
    clini, slide, feats, cats = create_random_dataset(
        dir=tmp_path,
        n_patients=20,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        feat_dim=12,
        n_categories=2,
    )
    for i in range(2):
        cfg = TrainConfig(
            task="classification",
            output_dir=tmp_path / f"out{i}",
            clini_table=clini,
            slide_table=slide,
            feature_dir=feats,
            ground_truth_label="ground-truth",
            patient_label="patient",
            filename_label="slide_path",
        )
        train_categorical_model_(config=cfg, advanced=_small_advanced())

    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[
            tmp_path / "out0" / "model.ckpt",
            tmp_path / "out1" / "model.ckpt",
        ],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="ground-truth",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    assert (tmp_path / "deploy" / "patient-preds-0.csv").exists()
    assert (tmp_path / "deploy" / "patient-preds-1.csv").exists()
    assert (tmp_path / "deploy" / "patient-preds_95_confidence_interval.csv").exists()


@pytest.mark.slow
def test_whole_slide_training(tmp_path):
    """bag_size: null trains on full slides (bucket-padded, masked) for both
    vanilla and ALiBi attention — the capability the flash VJPs enable."""
    from random_data import create_random_dataset
    from stamp_tpu.modeling.config import (
        AdvancedConfig,
        ModelParams,
        TrainConfig,
        VitModelParams,
    )
    from stamp_tpu.modeling.train import train_categorical_model_

    clini, slide, feat_dir, _cats = create_random_dataset(
        dir=tmp_path,
        n_patients=12,
        max_slides_per_patient=1,
        min_tiles_per_slide=20,
        max_tiles_per_slide=90,  # crosses a bucket boundary
        feat_dim=8,
        n_categories=2,
    )
    for use_alibi in (False, True):
        out = tmp_path / f"out_{use_alibi}"
        train_categorical_model_(
            config=TrainConfig(
                task="classification",
                output_dir=out,
                clini_table=clini,
                slide_table=slide,
                feature_dir=feat_dir,
                ground_truth_label="ground-truth",
                patient_label="patient",
                filename_label="slide_path",
            ),
            advanced=AdvancedConfig(
                model_params=ModelParams(
                    vit=VitModelParams(
                        dim_model=32, dim_feedforward=32, n_heads=4,
                        use_alibi=use_alibi,
                    )
                ),
                bag_size=None,
                max_epochs=2,
                patience=2,
                batch_size=4,  # forced to 1 with a log line
                accelerator="cpu",
            ),
        )
        assert (out / "model.ckpt").exists()
