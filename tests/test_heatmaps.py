"""Heatmap tests: ranked-tile export units with a fake slide + a full
``heatmaps_`` smoke run (coverage mirroring reference tests/test_heatmaps.py)."""

import h5py
import jax
import numpy as np
import pytest
from PIL import Image

import stamp_tpu
from stamp_tpu.heatmaps.generate import (
    _export_ranked_tiles,
    _vals_to_im,
    heatmaps_,
)
from stamp_tpu.modeling.checkpoint import save_checkpoint
from stamp_tpu.modeling.tasks import LitTileClassifier
from stamp_tpu.preprocessing.wsi import ImageSlide
from stamp_tpu.types import TilePixels


def test_vals_to_im():
    coords_norm = np.array([[0, 0], [1, 0], [0, 1]])
    scores = np.array([1.0, 2.0, 3.0])
    im = _vals_to_im(scores, coords_norm)
    assert im.shape == (2, 2, 1)
    assert im[0, 0, 0] == 1.0
    assert im[0, 1, 0] == 2.0
    assert im[1, 0, 0] == 3.0
    assert im[1, 1, 0] == 0.0


def test_export_ranked_tiles(tmp_path):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (448, 448, 3), dtype=np.uint8))
    slide = ImageSlide(img)

    scores = np.array([0.9, 0.1, 0.5, 0.7])
    coords = np.array([[0, 0], [224, 0], [0, 224], [224, 224]])

    _export_ranked_tiles(
        slide=slide,
        tiles_dir=tmp_path,
        stem="test",
        label="tumor",
        tile_scores=scores,
        coords_tile_slide_px=coords,
        tile_size_slide_px=TilePixels(224),
        topk=2,
        bottomk=1,
    )
    files = sorted(p.name for p in tmp_path.glob("*.jpg"))
    assert len(files) == 3
    assert any(f.startswith("top_01") and "0.90" in f for f in files)
    assert any(f.startswith("top_02") and "0.70" in f for f in files)
    assert any(f.startswith("bottom_01") and "0.10" in f for f in files)


@pytest.mark.slow
@pytest.mark.parametrize("slide_format", ["png", "mrxs"])
def test_heatmaps_end_to_end(tmp_path, slide_format):
    """Fake 2×2-tile slide + random-init classifier checkpoint → all
    artifacts; also exercised over a native MIRAX container (top-tile
    export reads regions back from the WSI)."""
    rng = np.random.default_rng(0)
    feat_dim = 8

    # fake WSI: 448×448 px at mpp 256/224
    wsi_dir = tmp_path / "wsi"
    wsi_dir.mkdir()
    arr = rng.integers(0, 255, (448, 448, 3), dtype=np.uint8)
    if slide_format == "png":
        Image.fromarray(arr).save(wsi_dir / "slide1.png")
    else:
        from stamp_tpu.preprocessing.wsi import _load_native
        if _load_native() is None:
            pytest.skip("native reader not built")
        from mirax_util import write_mirax

        write_mirax(
            wsi_dir / "slide1.mrxs", arr, tile=64, n_levels=1,
            mpp=256.0 / 224.0,
        )

    # matching features: 4 tiles on a 2×2 grid of 256µm
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    coords_um = np.array(
        [[0, 0], [256, 0], [0, 256], [256, 256]], dtype=np.float32
    )
    with h5py.File(feat_dir / "slide1.h5", "w") as h5:
        h5["feats"] = rng.normal(size=(4, feat_dim)).astype(np.float32)
        h5["coords"] = coords_um
        h5.attrs["stamp_version"] = stamp_tpu.__version__
        h5.attrs["extractor"] = "test"
        h5.attrs["unit"] = "um"
        h5.attrs["tile_size_um"] = 256.0
        h5.attrs["tile_size_px"] = 224
        h5.attrs["feat_type"] = "tile"

    # random-init classifier checkpoint
    from stamp_tpu.models.vision_transformer import VisionTransformer

    model = LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["a", "b"],
        category_weights=np.array([0.5, 0.5], dtype=np.float32),
        dim_input=feat_dim,
        model_name="vit",
        dim_model=16,
        dim_feedforward=16,
        n_heads=4,
        n_layers=1,
    )
    example = (
        np.zeros((1, 4, feat_dim), np.float32),
        np.zeros((1, 4, 2), np.float32),
        np.array([4]),
        np.zeros((1, 2), np.float32),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), example)
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
        topk=2,
        bottomk=1,
    )

    out = tmp_path / "out" / "slide1"
    assert (out / "raw" / "slide1-classmap.png").exists()
    assert (out / "raw" / "thumbnail-slide1.png").exists()
    assert list((out / "plots").glob("overview-*.png"))
    assert list((out / "plots").glob("overlay-*.png"))
    assert len(list((out / "tiles").glob("*.jpg"))) == 3
