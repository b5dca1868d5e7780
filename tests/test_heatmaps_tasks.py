"""Heatmaps for regression/survival checkpoints + attention rollout."""

import h5py
import jax
import numpy as np
import pytest
from PIL import Image

import stamp_tpu
from stamp_tpu.heatmaps.generate import _attention_rollout_single, heatmaps_
from stamp_tpu.modeling.checkpoint import save_checkpoint
from stamp_tpu.modeling.tasks import LitTileRegressor, LitTileSurvival


def _fake_cohort(tmp_path, feat_dim=8):
    rng = np.random.default_rng(0)
    wsi_dir = tmp_path / "wsi"
    wsi_dir.mkdir()
    Image.fromarray(rng.integers(0, 255, (448, 448, 3), dtype=np.uint8)).save(
        wsi_dir / "slide1.png"
    )
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    coords_um = np.array([[0, 0], [256, 0], [0, 256], [256, 256]], dtype=np.float32)
    with h5py.File(feat_dir / "slide1.h5", "w") as h5:
        h5["feats"] = rng.normal(size=(4, feat_dim)).astype(np.float32)
        h5["coords"] = coords_um
        h5.attrs["stamp_version"] = stamp_tpu.__version__
        h5.attrs["extractor"] = "test"
        h5.attrs["unit"] = "um"
        h5.attrs["tile_size_um"] = 256.0
        h5.attrs["tile_size_px"] = 224
        h5.attrs["feat_type"] = "tile"
    return wsi_dir, feat_dir


def _vit_kwargs(feat_dim):
    from stamp_tpu.models.vision_transformer import VisionTransformer

    return dict(
        model_class=VisionTransformer,
        dim_input=feat_dim,
        model_name="vit",
        dim_model=16,
        dim_feedforward=16,
        n_heads=4,
        n_layers=1,
    )


@pytest.mark.slow
def test_heatmaps_regression(tmp_path):
    feat_dim = 8
    wsi_dir, feat_dir = _fake_cohort(tmp_path, feat_dim)
    model = LitTileRegressor(ground_truth_label="t", **_vit_kwargs(feat_dim))
    example = (
        np.zeros((1, 4, feat_dim), np.float32),
        np.zeros((1, 4, 2), np.float32),
        np.array([4]),
        np.zeros((1, 1), np.float32),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), example)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(ckpt, hyper_parameters=model.checkpoint_hparams(), variables=variables)

    heatmaps_(
        feature_dir=feat_dir,
        wsi_dir=wsi_dir,
        checkpoint_path=ckpt,
        output_dir=tmp_path / "out",
        slide_paths=None,
        default_slide_mpp=256.0 / 224.0,
        opacity=0.6,
        topk=1,
        bottomk=1,
    )
    out = tmp_path / "out" / "slide1"
    assert (out / "raw" / "slide1-heatmap.png").exists()
    assert len(list((out / "tiles").glob("*.jpg"))) == 2


@pytest.mark.slow
def test_heatmaps_survival_with_cutoff(tmp_path):
    feat_dim = 8
    wsi_dir, feat_dir = _fake_cohort(tmp_path, feat_dim)
    model = LitTileSurvival(
        time_label="day", status_label="status", **_vit_kwargs(feat_dim)
    )
    model.hparams["train_pred_median"] = 0.1
    example = (
        np.zeros((1, 4, feat_dim), np.float32),
        np.zeros((1, 4, 2), np.float32),
        np.array([4]),
        np.zeros((1, 2), np.float32),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), example)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(ckpt, hyper_parameters=model.checkpoint_hparams(), variables=variables)

    heatmaps_(
        feature_dir=feat_dir,
        wsi_dir=wsi_dir,
        checkpoint_path=ckpt,
        output_dir=tmp_path / "out",
        slide_paths=None,
        default_slide_mpp=256.0 / 224.0,
        opacity=0.6,
        topk=0,
        bottomk=0,
    )
    out = tmp_path / "out" / "slide1"
    assert (out / "raw" / "slide1-heatmap.png").exists()
    assert list((out / "plots").glob("overview-*.png"))


def test_attention_rollout():
    from stamp_tpu.modeling.tasks import LitTileClassifier

    feat_dim = 8
    model = LitTileClassifier(
        ground_truth_label="gt",
        categories=["a", "b"],
        category_weights=np.array([0.5, 0.5], np.float32),
        **_vit_kwargs(feat_dim),
    )
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(6, feat_dim)).astype(np.float32)
    coords = rng.uniform(0, 1000, size=(6, 2)).astype(np.float32)
    example = (
        feats[None],
        coords[None],
        np.array([6]),
        np.zeros((1, 2), np.float32),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), example)
    rollout = _attention_rollout_single(model, variables, feats, coords)
    assert rollout.shape == (6,)
    assert rollout.min() >= 0 and rollout.max() <= 1.0 + 1e-6


def test_streaming_rollout_matches_dense(monkeypatch):
    """The streamed CLS-row rollout must agree with the dense product."""
    import jax.numpy as jnp
    import stamp_tpu.heatmaps.generate as gen
    from stamp_tpu.models.vision_transformer import VisionTransformer
    from stamp_tpu.modeling.tasks import LitTileClassifier

    rng = np.random.default_rng(0)
    n, f = 37, 8
    feats = rng.normal(size=(n, f)).astype(np.float32)
    coords = rng.uniform(0, 1000, size=(n, 2)).astype(np.float32)

    model = LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["a", "b"],
        category_weights=np.array([0.5, 0.5], dtype=np.float32),
        dim_input=f,
        model_name="vit",
        dim_model=16,
        dim_feedforward=16,
        n_heads=4,
        n_layers=2,
        use_alibi=False,
        total_steps=4,
    )
    import jax

    variables = model.init_variables(
        jax.random.PRNGKey(0),
        (
            np.zeros((1, 4, f), np.float32),
            np.zeros((1, 4, 2), np.float32),
            np.array([4]),
            np.zeros((1, 2), np.float32),
        ),
    )

    dense = gen._attention_rollout_single(model, variables, feats, coords)
    monkeypatch.setattr(gen, "STREAMING_ROLLOUT_MIN_SEQ", 1)
    streamed = gen._attention_rollout_single(model, variables, feats, coords)
    np.testing.assert_allclose(streamed, dense, atol=1e-4)


def test_trans_mil_heatmaps_end_to_end(tmp_path):
    """Grad-CAM heatmaps work for a TransMIL checkpoint (the reference's
    gradcam passes coords= to model.forward, which the reference TransMIL
    signature rejects — trans_mil.py:81-84 — so this exceeds reference
    capability; our jacrev path goes through forward_args and is
    backbone-generic)."""
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.models.trans_mil import TransMIL

    feat_dim = 8
    wsi_dir, feat_dir = _fake_cohort(tmp_path, feat_dim)
    model = LitTileClassifier(
        model_class=TransMIL,
        ground_truth_label="gt",
        categories=["neg", "pos"],
        category_weights=np.array([0.5, 0.5], np.float32),
        dim_input=feat_dim,
        model_name="trans_mil",
        dim_hidden=32,
        total_steps=8,
    )
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(1, 4, feat_dim)).astype(np.float32),
        (rng.uniform(size=(1, 4, 2)) * 500).astype(np.float32),
        np.array([4], np.int32),
        np.zeros((1, 2), np.float32),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(
        ckpt, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )

    heatmaps_(
        feature_dir=feat_dir,
        wsi_dir=wsi_dir,
        checkpoint_path=ckpt,
        output_dir=tmp_path / "out",
        slide_paths=None,
        default_slide_mpp=256.0 / 224.0,
        opacity=0.6,
        topk=1,
        bottomk=1,
    )
    out = tmp_path / "out" / "slide1"
    assert (out / "raw").is_dir()
    assert list((out / "raw").glob("*.png"))
    assert len(list((out / "tiles").glob("*.jpg"))) >= 2


def test_multitarget_barspoon_heatmaps(tmp_path):
    """Multi-target (barspoon) checkpoints emit one full heatmap set PER
    TARGET, filenames suffixed with the sanitized target label — beyond
    reference capability (its gradcam breaks on the EncDec dict output)."""
    from stamp_tpu.modeling.tasks import LitEncDecTransformer

    feat_dim = 8
    wsi_dir, feat_dir = _fake_cohort(tmp_path, feat_dim)
    targets = {"KRAS": ["mut", "wt"], "grade x": ["g1", "g2", "g3"]}
    model = LitEncDecTransformer(
        dim_input=feat_dim,
        ground_truth_label=list(targets),
        categories={t: list(c) for t, c in targets.items()},
        category_weights={
            t: np.ones(len(c), np.float32) / len(c) for t, c in targets.items()
        },
        d_model=16,
        num_encoder_heads=2,
        num_decoder_heads=2,
        dim_feedforward=32,
        model_name="barspoon",
    )
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(1, 4, feat_dim)).astype(np.float32),
        (rng.uniform(size=(1, 4, 2)) * 500).astype(np.float32),
        np.array([4], np.int32),
        {t: np.zeros((1, len(c)), np.float32) for t, c in targets.items()},
    )
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(
        ckpt, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )

    heatmaps_(
        feature_dir=feat_dir,
        wsi_dir=wsi_dir,
        checkpoint_path=ckpt,
        output_dir=tmp_path / "out",
        slide_paths=None,
        default_slide_mpp=256.0 / 224.0,
        opacity=0.6,
        topk=1,
        bottomk=1,
    )
    raw = tmp_path / "out" / "slide1" / "raw"
    for stem_suffix, cats in (("KRAS", ["mut", "wt"]), ("grade_x", ["g1", "g2", "g3"])):
        assert (raw / f"slide1-{stem_suffix}-classmap.png").exists()
        # one probability-labelled panel per category of this target
        for c in cats:
            assert list(raw.glob(f"slide1-{stem_suffix}-{c}=*.png")), (
                stem_suffix, c,
            )
