"""Crossval end-to-end + splits.json resumability
(coverage mirroring reference tests/test_crossval.py)."""

import json
import logging

import pandas as pd
import pytest

from random_data import create_random_dataset
from stamp_tpu.modeling.config import (
    AdvancedConfig,
    CrossvalConfig,
    ModelParams,
    VitModelParams,
)
from stamp_tpu.modeling.crossval import categorical_crossval_

logging.getLogger("stamp").setLevel(logging.ERROR)


@pytest.mark.slow
def test_crossval_classification(tmp_path):
    clini, slide, feats, cats = create_random_dataset(
        dir=tmp_path,
        n_patients=30,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        feat_dim=12,
        n_categories=2,
    )
    cfg = CrossvalConfig(
        task="classification",
        output_dir=tmp_path / "out",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="ground-truth",
        patient_label="patient",
        filename_label="slide_path",
        n_splits=2,
    )
    adv = AdvancedConfig(
        model_params=ModelParams(
            vit=VitModelParams(dim_model=32, dim_feedforward=32, n_heads=4)
        ),
        max_epochs=2,
        patience=2,
        bag_size=16,
        batch_size=8,
        accelerator="cpu",
    )
    categorical_crossval_(cfg, adv)

    splits_file = tmp_path / "out" / "splits.json"
    assert splits_file.exists()
    splits = json.loads(splits_file.read_text())
    assert len(splits["splits"]) == 2

    for i in range(2):
        split_dir = tmp_path / "out" / f"split-{i}"
        assert (split_dir / "model.ckpt").exists()
        df = pd.read_csv(split_dir / "patient-preds.csv")
        assert "pred" in df.columns
        # test patients of this fold only
        assert len(df) == len(splits["splits"][i]["test_patients"])

    # re-running skips everything without errors (resumability)
    categorical_crossval_(cfg, adv)
