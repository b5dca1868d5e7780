"""Executable AUROC-parity harness vs the ACTUAL reference pipeline.

The north-star acceptance metric (BASELINE.json) is "crossval AUROC within
0.01 of the reference on the same cohort and splits".  This test makes that
metric executable: it builds one synthetic cohort with a planted signal,
runs the reference's `stamp crossval` (torch/Lightning) and this
framework's `stamp crossval` on the SAME cohort and the SAME splits.json
(the schema interchanges by design, modeling/crossval.py:1-6), and asserts
the mean validation AUROCs agree within 0.01.

In this zero-egress harness the reference's torch/lightning dependency set
cannot be installed, so the test SKIPS unless a reference interpreter is
provided.  Runbook (any connected machine):

    uv venv /tmp/refenv --python 3.12
    uv pip install --python /tmp/refenv/bin/python /root/reference
    STAMP_REFERENCE_PYTHON=/tmp/refenv/bin/python \
        python -m pytest tests/test_reference_auroc_parity.py -v

The cohort recipe mirrors the reference's own test fixture
(/root/reference/tests/random_data.py:26-87); the crossval entry points are
/root/reference/src/stamp/modeling/crossval.py:48 and
stamp_tpu/modeling/crossval.py.
"""

from __future__ import annotations

import csv
import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

AUROC_TOLERANCE = 0.01


def _reference_python() -> str | None:
    py = os.environ.get("STAMP_REFERENCE_PYTHON")
    if not py or not Path(py).exists():
        return None
    probe = subprocess.run(
        [py, "-c", "import stamp, lightning"], capture_output=True
    )
    return py if probe.returncode == 0 else None


def _build_cohort(root: Path, n_patients: int = 60, feat_dim: int = 16):
    """Planted-signal cohort both pipelines can read: per-patient h5 feature
    files + clini/slide tables (same shapes as the reference's
    tests/random_data.py fixture)."""
    import h5py

    rng = np.random.default_rng(0)
    feat_dir = root / "feats"
    feat_dir.mkdir(parents=True)
    clini_rows, slide_rows = [], []
    for i in range(n_patients):
        pid = f"P{i:03d}"
        label = "pos" if i % 2 == 0 else "neg"
        fname = f"{pid}_s0"
        n_tiles = int(rng.integers(16, 32))
        feats = rng.normal(size=(n_tiles, feat_dim)).astype(np.float32)
        if label == "pos":
            feats += 1.5 / np.sqrt(feat_dim)
        coords = (rng.uniform(size=(n_tiles, 2)) * 5000).astype(np.float32)
        with h5py.File(feat_dir / f"{fname}.h5", "w") as f:
            f["feats"] = feats
            f["coords"] = coords
            f.attrs["extractor"] = "random-test-generator"
            f.attrs["unit"] = "um"
            f.attrs["tile_size_um"] = 256.0
            f.attrs["tile_size_px"] = 224
        clini_rows.append((pid, label))
        slide_rows.append((f"{fname}.h5", pid))
    with open(root / "clini.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["PATIENT", "target"])
        w.writerows(clini_rows)
    with open(root / "slide.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["FILENAME", "PATIENT"])
        w.writerows(slide_rows)


def _crossval_config(root: Path, out_dir: Path, *, accelerator: str) -> str:
    return f"""
crossval:
  output_dir: {out_dir}
  clini_table: {root}/clini.csv
  slide_table: {root}/slide.csv
  feature_dir: {root}/feats
  ground_truth_label: target
  n_splits: 2
advanced_config:
  accelerator: {accelerator}
  max_epochs: 16
  max_lr: 1.0e-3
  model_params:
    vit:
      dim_model: 64
      dim_feedforward: 96
      n_heads: 4
      n_layers: 2
"""


def _mean_val_auroc(out_dir: Path) -> float:
    """Mean per-split validation AUROC from patient-preds.csv files."""
    from sklearn.metrics import roc_auc_score

    aurocs = []
    for split_dir in sorted(out_dir.glob("split-*")):
        rows = list(csv.DictReader(open(split_dir / "patient-preds.csv")))
        y = np.array([r["target"] == "pos" for r in rows], bool)
        p = np.array([float(r["target_pos"]) for r in rows])
        aurocs.append(roc_auc_score(y, p))
    assert aurocs, f"no split-*/patient-preds.csv under {out_dir}"
    return float(np.mean(aurocs))


@pytest.mark.skipif(
    _reference_python() is None,
    reason=(
        "reference pipeline not available — set STAMP_REFERENCE_PYTHON to a "
        "python with /root/reference installed (see module docstring runbook)"
    ),
)
def test_crossval_auroc_parity_vs_reference(tmp_path):
    ref_py = _reference_python()
    _build_cohort(tmp_path)

    # 1) reference crossval (it creates splits.json first)
    ref_out = tmp_path / "out_ref"
    ref_cfg = tmp_path / "ref.yaml"
    ref_cfg.write_text(_crossval_config(tmp_path, ref_out, accelerator="cpu"))
    subprocess.run(
        [ref_py, "-m", "stamp", "--config", str(ref_cfg), "crossval"],
        check=True,
        timeout=3600,
    )

    # 2) our crossval on the SAME splits (schema interchanges by design)
    our_out = tmp_path / "out_ours"
    our_out.mkdir()
    shutil.copy(ref_out / "splits.json", our_out / "splits.json")
    our_cfg = tmp_path / "ours.yaml"
    our_cfg.write_text(_crossval_config(tmp_path, our_out, accelerator="cpu"))
    subprocess.run(
        [
            sys.executable,
            "-m",
            "stamp_tpu",
            "-c",
            str(our_cfg),
            "crossval",
        ],
        check=True,
        timeout=3600,
        cwd=Path(__file__).resolve().parent.parent,
    )

    auroc_ref = _mean_val_auroc(ref_out)
    auroc_ours = _mean_val_auroc(our_out)
    assert abs(auroc_ref - auroc_ours) <= AUROC_TOLERANCE, (
        f"AUROC parity violated: reference {auroc_ref:.4f} vs "
        f"ours {auroc_ours:.4f} (|Δ| > {AUROC_TOLERANCE})"
    )


def test_parity_harness_machinery_runs_without_reference(tmp_path):
    """The harness pieces themselves (cohort builder, config writer, AUROC
    reader) stay executable in-harness: run OUR crossval on the generated
    cohort and check the planted signal is learned (AUROC > 0.8) — so when
    a reference interpreter appears, the only untested step is the
    reference subprocess itself."""
    _build_cohort(tmp_path)
    out = tmp_path / "out_ours"
    cfg = tmp_path / "ours.yaml"
    cfg.write_text(_crossval_config(tmp_path, out, accelerator="cpu"))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "stamp_tpu", "-c", str(cfg), "crossval"],
        check=True,
        timeout=3600,
        cwd=Path(__file__).resolve().parent.parent,
        env=env,
    )
    assert (out / "splits.json").exists()
    assert _mean_val_auroc(out) > 0.8
