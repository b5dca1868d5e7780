"""int8 extraction → downstream-AUROC validation.

The int8 (W8A8) extraction mode's accuracy evidence must be *end to end*:
the implicit product contract is "features good enough for downstream
AUROC", not cosine similarity in isolation.  This probe

  1. synthesizes a tile-image cohort with a planted visual signal
     (positive patients' tiles carry an additive texture pattern),
  2. extracts features twice with the SAME extractor weights — once bf16,
     once int8 with *real first-batch calibration* (the product path, not
     constant scales),
  3. runs identical 5-fold cross-validation on both feature sets
     (identical splits — random_state=0 — and identical training seeds),
  4. reports the mean *paired* per-fold AUROC difference (int8 − bf16),
     which cancels fold-difficulty variance (target |Δ| < 0.01).

Runs on CPU or TPU.  Usage: python scripts/int8_auroc_probe.py [workdir]
Prints one JSON line at the end.
"""

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("STAMP_RANDOM_WEIGHTS", "1")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin's sitecustomize overrides the env var at
    # interpreter start; force the backend through jax.config instead
    jax.config.update("jax_platforms", "cpu")

import numpy as np

N_PATIENTS = 60
TILES_PER_PATIENT = 24
TILE_PX = 224
N_SPLITS = 5


def build_cohort(rng: np.random.Generator):
    """Per-patient uint8 tile batches with a *structural* planted signal.

    Each tile blends fine per-pixel noise with coarse 8×8-block noise;
    positive patients draw higher blend weights.  Texture-scale differences
    survive the ViT's per-token LayerNorms (a fixed additive pattern does
    not — it is normalized away), and the overlapping weight distributions
    keep the task hard enough that a quantization-induced accuracy drop
    would move the AUROC.
    """
    cohort = []
    for i in range(N_PATIENTS):
        positive = i % 2 == 0
        lo, hi = (0.30, 0.65) if positive else (0.05, 0.40)
        alphas = rng.uniform(lo, hi, size=TILES_PER_PATIENT)
        fine = rng.integers(
            40, 215, size=(TILES_PER_PATIENT, TILE_PX, TILE_PX, 3)
        ).astype(np.float32)
        coarse = (
            rng.integers(
                40, 215, size=(TILES_PER_PATIENT, TILE_PX // 8, TILE_PX // 8, 3)
            )
            .repeat(8, axis=1)
            .repeat(8, axis=2)
            .astype(np.float32)
        )
        tiles = alphas[:, None, None, None] * coarse + (
            1 - alphas[:, None, None, None]
        ) * fine
        cohort.append((f"P{i:03d}", positive, tiles.astype(np.uint8)))
    return cohort


def extract(cohort, feat_dir: Path, *, int8: bool) -> None:
    """Extract the cohort with the real extractor object (first-batch
    calibration when int8)."""
    from stamp_tpu.io.h5 import write_tile_feats_atomic
    from stamp_tpu.models.vit_image import VIT_CONFIGS, ViTConfig
    from stamp_tpu.preprocessing.extractor import make_vit_extractor, set_int8_extraction
    from stamp_tpu.types import Microns, TilePixels

    VIT_CONFIGS["int8-probe"] = ViTConfig(
        patch_size=32, embed_dim=192, depth=6, num_heads=6, ffn="swiglu",
        mlp_ratio=4.0, init_values=1e-5,
    )
    set_int8_extraction(int8)
    try:
        extractor = make_vit_extractor(
            identifier="int8-probe", arch="int8-probe", weight_files=[]
        )
    finally:
        set_int8_extraction(None)
    assert extractor.precision == ("int8" if int8 else "bfloat16")

    rng = np.random.default_rng(99)
    feat_dir.mkdir(parents=True, exist_ok=True)
    for pid, _positive, tiles in cohort:
        feats = np.asarray(extractor.forward(tiles), dtype=np.float16)
        coords = rng.uniform(0, 50000, size=(len(tiles), 2)).astype(np.float32)
        write_tile_feats_atomic(
            output_path=feat_dir / f"{pid}.h5",
            feats=feats,
            coords_um=coords,
            extractor_id="int8-probe",
            tile_size_um=Microns(256.0),
            tile_size_px=TilePixels(TILE_PX),
            code_hash="probe",
            precision="int8" if int8 else None,
        )


def crossval_auroc(cohort, feat_dir: Path, out_dir: Path) -> list[float]:
    """5-fold crossval on the feature set; per-(seed, fold) AUROC list."""
    import pandas as pd
    from sklearn.metrics import roc_auc_score

    from stamp_tpu.modeling.config import (
        AdvancedConfig,
        CrossvalConfig,
        ModelParams,
        VitModelParams,
    )
    from stamp_tpu.modeling.crossval import categorical_crossval_
    from stamp_tpu.utils.seed import Seed

    clini = out_dir / "clini.csv"
    slide = out_dir / "slide.csv"
    pd.DataFrame(
        [(pid, "POS" if pos else "NEG") for pid, pos, _t in cohort],
        columns=["PATIENT", "TARGET"],
    ).to_csv(clini, index=False)
    pd.DataFrame(
        [(f"{pid}.h5", pid) for pid, _pos, _t in cohort],
        columns=["FILENAME", "PATIENT"],
    ).to_csv(slide, index=False)

    cfg = CrossvalConfig(
        output_dir=out_dir / "cv",
        clini_table=clini,
        slide_table=slide,
        feature_dir=feat_dir,
        ground_truth_label="TARGET",
        categories=["NEG", "POS"],
        n_splits=N_SPLITS,
    )
    adv = AdvancedConfig(
        model_params=ModelParams(
            vit=VitModelParams(dim_model=64, dim_feedforward=64, n_heads=4)
        ),
        max_epochs=12,
        patience=12,
        bag_size=16,
        batch_size=8,
        max_lr=1e-3,
        accelerator="cpu",
    )
    aurocs = []
    for seed in (0, 1, 2):
        Seed.set(seed)
        cfg_seed = cfg.model_copy(update={"output_dir": out_dir / f"cv{seed}"})
        categorical_crossval_(config=cfg_seed, advanced=adv)
        for i in range(N_SPLITS):
            df = pd.read_csv(
                out_dir / f"cv{seed}" / f"split-{i}" / "patient-preds.csv"
            )
            aurocs.append(
                float(roc_auc_score(df["TARGET"] == "POS", df["TARGET_POS"]))
            )
    return aurocs


def linear_probe_auroc(feat_dir: Path) -> list[float]:
    """Deterministic evaluator: standardized logistic regression on
    patient-mean features, 5-fold.  No training stochasticity — paired
    fold deltas between precisions reflect the quantization alone."""
    import h5py
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score
    from sklearn.model_selection import StratifiedKFold
    from sklearn.preprocessing import StandardScaler

    X, y = [], []
    for p in sorted(Path(feat_dir).glob("*.h5")):
        with h5py.File(p) as h5:
            X.append(np.asarray(h5["feats"]).astype(np.float32).mean(0))
        y.append(int(p.stem[1:]) % 2 == 0)
    X, y = np.stack(X), np.asarray(y)

    aurocs = []
    for tr, te in StratifiedKFold(5, shuffle=True, random_state=0).split(X, y):
        scaler = StandardScaler().fit(X[tr])
        clf = LogisticRegression(max_iter=5000).fit(scaler.transform(X[tr]), y[tr])
        scores = clf.predict_proba(scaler.transform(X[te]))[:, 1]
        aurocs.append(float(roc_auc_score(y[te], scores)))
    return aurocs


def main() -> None:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    rng = np.random.default_rng(0)
    cohort = build_cohort(rng)

    results, probes = {}, {}
    for mode in ("bf16", "int8"):
        feat_dir = work / f"feats_{mode}"
        extract(cohort, feat_dir, int8=mode == "int8")
        out_dir = work / f"run_{mode}"
        out_dir.mkdir(parents=True, exist_ok=True)
        probes[mode] = linear_probe_auroc(feat_dir)
        results[mode] = crossval_auroc(cohort, feat_dir, out_dir)
        print(
            f"{mode}: MIL crossval mean AUROC {np.mean(results[mode]):.4f}; "
            f"linear probe {np.mean(probes[mode]):.4f}",
            file=sys.stderr,
        )

    paired = np.asarray(results["int8"]) - np.asarray(results["bf16"])
    delta = float(np.mean(paired))
    probe_delta = float(np.mean(np.asarray(probes["int8"]) - np.asarray(probes["bf16"])))
    print(json.dumps({
        "auroc_bf16": round(float(np.mean(results["bf16"])), 4),
        "auroc_int8": round(float(np.mean(results["int8"])), 4),
        "paired_delta_auroc": round(delta, 4),
        "paired_delta_sem": round(float(np.std(paired) / np.sqrt(len(paired))), 4),
        "linear_probe_auroc_bf16": round(float(np.mean(probes["bf16"])), 4),
        "linear_probe_auroc_int8": round(float(np.mean(probes["int8"])), 4),
        "linear_probe_paired_delta": round(probe_delta, 4),
        "n_runs": len(paired),
        "n_patients": N_PATIENTS,
        "n_splits": N_SPLITS,
        # the deterministic evaluator carries the pass/fail gate; the MIL
        # crossval delta is reported alongside with its SEM (training noise)
        "passes": abs(probe_delta) < 0.01,
    }))


if __name__ == "__main__":
    main()
