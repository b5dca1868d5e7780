"""CLI surface tests (subprocess through ``python -m stamp_tpu``)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(*args, cwd=REPO):
    return subprocess.run(
        [sys.executable, "-m", "stamp_tpu", *args],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_cli_help():
    res = _run("--help")
    assert res.returncode == 0
    for cmd in [
        "init",
        "preprocess",
        "encode_slides",
        "encode_patients",
        "train",
        "crossval",
        "deploy",
        "statistics",
        "config",
        "heatmaps",
        "export_ckpt",
    ]:
        assert cmd in res.stdout


def test_cli_no_command_exits_nonzero():
    res = _run()
    assert res.returncode == 1
    assert "usage" in res.stdout.lower()


def test_cli_init_and_config_roundtrip(tmp_path):
    cfg = tmp_path / "config.yaml"
    res = _run("-c", str(cfg), "init")
    assert res.returncode == 0
    assert cfg.exists()

    # second init refuses to overwrite
    res = _run("-c", str(cfg), "init")
    assert "Refusing to overwrite" in res.stderr

    res = _run("-c", str(cfg), "config")
    assert res.returncode == 0
    assert "advanced_config" in res.stdout


def test_cli_rejects_unknown_config_key(tmp_path):
    cfg = tmp_path / "config.yaml"
    cfg.write_text("crossval:\n  bogus_key: 1\n")
    res = _run("-c", str(cfg), "crossval")
    assert res.returncode == 1
    assert "bogus_key" in res.stderr


def test_cli_encode_slides(tmp_path, monkeypatch):
    """encode_slides through the CLI with random-weight CHIEF."""
    import h5py
    import numpy as np

    import stamp_tpu

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        with h5py.File(feat_dir / f"s{i}.h5", "w") as h5:
            h5["feats"] = rng.normal(size=(20, 768)).astype(np.float32)
            h5["coords"] = rng.uniform(0, 5000, (20, 2)).astype(np.float32)
            h5.attrs["stamp_version"] = stamp_tpu.__version__
            h5.attrs["extractor"] = "chief-ctranspath"
            h5.attrs["unit"] = "um"
            h5.attrs["tile_size_um"] = 256.0
            h5.attrs["tile_size_px"] = 224
            h5.attrs["feat_type"] = "tile"

    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        f"""slide_encoding:
  encoder: "chief"
  output_dir: "{tmp_path / 'out'}"
  feat_dir: "{feat_dir}"
  device: "cpu"
  generate_hash: false
"""
    )
    import os
    import subprocess
    import sys

    env = dict(os.environ, STAMP_RANDOM_WEIGHTS="1")
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [sys.executable, "-m", "stamp_tpu", "-c", str(cfg), "encode_slides"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    outs = sorted((tmp_path / "out" / "chief-slide").glob("*.h5"))
    assert len(outs) == 2


def test_wsi_list_subset(tmp_path):
    from stamp_tpu.preprocessing.extract import _slides_named_in

    lst = tmp_path / "list.txt"
    lst.write_text("a.svs\nb.tif\n\n")
    assert _slides_named_in(lst) == {"a.svs", "b.tif"}

    import pandas as pd

    csv = tmp_path / "list.csv"
    pd.DataFrame(["x.svs", "y.svs"]).to_csv(csv, index=False, header=False)
    assert _slides_named_in(csv) == {"x.svs", "y.svs"}


def test_profile_flag_writes_stage_table(tmp_path, monkeypatch):
    """--profile logs the per-stage wall-time table (SURVEY §5.1)."""
    import subprocess
    import sys

    import h5py
    import numpy as np
    from PIL import Image

    wsis = tmp_path / "wsis"
    wsis.mkdir()
    rng = np.random.default_rng(0)
    img = np.full((1024, 1024, 3), 255, np.uint8)
    img[128:640, 128:640] = rng.integers(0, 255, (512, 512, 3)).astype(np.uint8)
    Image.fromarray(img).save(
        wsis / "s.tiff", compression="tiff_lzw", resolution=10000.0, resolution_unit=3
    )
    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        f"""
preprocessing:
  output_dir: {tmp_path}/out
  wsi_dir: {wsis}
  extractor: empty
  device: "cpu"
  max_workers: 2
  default_slide_mpp: 1.0
"""
    )
    env = {**__import__("os").environ, "JAX_PLATFORMS": "cpu"}
    from pathlib import Path as _Path

    result = subprocess.run(
        [sys.executable, "-m", "stamp_tpu", "-c", str(cfg), "--profile", "preprocess"],
        cwd=_Path(__file__).parent.parent,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr
    log = (tmp_path / "out" / "logfile.log").read_text()
    assert "per-stage wall time" in log
    assert "preprocess/tiling" in log
    assert "preprocess/h5_write" in log


def test_cli_export_ckpt_roundtrip(tmp_path):
    """`stamp export_ckpt` converts npz → Lightning → npz bit-exactly."""
    import jax
    import numpy as np

    from stamp_tpu.modeling.checkpoint import save_checkpoint
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.models.vision_transformer import VisionTransformer

    model = LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["neg", "pos"],
        category_weights=np.array([0.5, 0.5], np.float32),
        dim_input=8,
        model_name="vit",
        dim_model=16,
        dim_feedforward=16,
        n_heads=4,
        n_layers=1,
        use_alibi=False,
        total_steps=4,
    )
    batch = (
        np.zeros((1, 4, 8), np.float32),
        np.zeros((1, 4, 2), np.float32),
        np.array([4], np.int32),
        np.zeros((1, 2), np.float32),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    npz = tmp_path / "model.ckpt"
    save_checkpoint(
        npz, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )

    lightning = tmp_path / "model.lightning.ckpt"
    res = _run("export_ckpt", str(npz), str(lightning))
    assert res.returncode == 0, res.stderr
    back = tmp_path / "model.back.ckpt"
    res = _run("export_ckpt", str(lightning), str(back))
    assert res.returncode == 0, res.stderr

    a = np.load(npz, allow_pickle=False)
    b = np.load(back, allow_pickle=False)
    var_keys = {k for k in a.files if k.startswith("var:")}
    assert var_keys == {k for k in b.files if k.startswith("var:")}
    for k in var_keys:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
