"""Reproducibility contract: same seed ⇒ same training trajectory
(reference README.md:226-229)."""

import logging

import jax
import numpy as np
import pytest

from random_data import create_random_dataset
from stamp_tpu.modeling.checkpoint import load_checkpoint
from stamp_tpu.modeling.config import (
    AdvancedConfig,
    ModelParams,
    TrainConfig,
    VitModelParams,
)
from stamp_tpu.modeling.train import train_categorical_model_
from stamp_tpu.utils.seed import Seed

logging.getLogger("stamp").setLevel(logging.ERROR)


@pytest.mark.slow
def test_same_seed_same_weights(tmp_path):
    import random

    random.seed(0)
    np.random.seed(0)
    clini, slide, feats, _ = create_random_dataset(
        dir=tmp_path,
        n_patients=20,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        feat_dim=12,
        n_categories=2,
    )

    def run(out):
        Seed.set(1234)
        cfg = TrainConfig(
            task="classification",
            output_dir=tmp_path / out,
            clini_table=clini,
            slide_table=slide,
            feature_dir=feats,
            ground_truth_label="ground-truth",
            patient_label="patient",
            filename_label="slide_path",
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
            seed=1234,
        )
        train_categorical_model_(config=cfg, advanced=adv)
        return load_checkpoint(tmp_path / out / "model.ckpt")

    ckpt_a = run("runA")
    ckpt_b = run("runB")

    leaves_a = jax.tree_util.tree_leaves(ckpt_a["variables"])
    leaves_b = jax.tree_util.tree_leaves(ckpt_b["variables"])
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
