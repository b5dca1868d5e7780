"""Statistics over synthetic prediction CSVs for every task
(coverage mirroring reference tests/test_statistics.py)."""

import numpy as np
import pandas as pd
import pytest

from random_data import random_patient_preds, random_string
from stamp_tpu.statistics import compute_stats_
from stamp_tpu.statistics.survival_util import (
    KaplanMeier,
    concordance_index,
    logrank_test,
)


def test_classification_stats_single_fold(tmp_path):
    preds = random_patient_preds(n_patients=64, categories=["a", "b"])
    csv = tmp_path / "patient-preds.csv"
    preds.to_csv(csv, index=False)

    compute_stats_(
        task="classification",
        output_dir=tmp_path / "stats",
        pred_csvs=[csv],
        ground_truth_label="ground-truth",
        true_class="a",
    )
    out = tmp_path / "stats"
    assert (out / "roc-curve_ground-truth=a.svg").exists()
    assert (out / "pr-curve_ground-truth=a.svg").exists()
    assert (out / "ground-truth_categorical-stats_individual.csv").exists()
    assert (out / "ground-truth_categorical-stats_aggregated.csv").exists()


def test_classification_stats_multi_fold(tmp_path):
    csvs = []
    for i in range(3):
        d = tmp_path / f"split-{i}"
        d.mkdir()
        csv = d / "patient-preds.csv"
        random_patient_preds(n_patients=40, categories=["a", "b"]).to_csv(
            csv, index=False
        )
        csvs.append(csv)
    compute_stats_(
        task="classification",
        output_dir=tmp_path / "stats",
        pred_csvs=csvs,
        ground_truth_label="ground-truth",
        true_class="a",
    )
    agg = pd.read_csv(
        tmp_path / "stats" / "ground-truth_categorical-stats_aggregated.csv",
        header=[0, 1],
        index_col=0,
    )
    assert len(agg) == 2  # one row per class


def test_regression_stats(tmp_path):
    rng = np.random.default_rng(0)
    truth = rng.uniform(0, 100, 50)
    df = pd.DataFrame(
        {
            "patient": [random_string(8) for _ in range(50)],
            "target": truth,
            "pred": truth + rng.normal(0, 5, 50),
        }
    )
    csv = tmp_path / "patient-preds.csv"
    df.to_csv(csv, index=False)

    compute_stats_(
        task="regression",
        output_dir=tmp_path / "stats",
        pred_csvs=[csv],
        ground_truth_label="target",
    )
    ind = pd.read_csv(
        tmp_path / "stats" / "target_regression-stats_individual.csv", index_col=0
    )
    assert ind["r2_score"].iloc[0] > 0.8
    assert ind["pearson_r"].iloc[0] > 0.9


def test_survival_stats(tmp_path):
    rng = np.random.default_rng(0)
    n = 60
    risk = rng.normal(0, 1, n)
    # survival time negatively correlated with risk
    time = np.maximum(1, 1000 - 300 * risk + rng.normal(0, 100, n))
    event = rng.choice([0, 1], n, p=[0.3, 0.7])
    df = pd.DataFrame(
        {
            "patient": [random_string(8) for _ in range(n)],
            "pred_score": risk,
            "day": time,
            "status": event,
        }
    )
    df["cut_off=0.0"] = None
    csv = tmp_path / "patient-preds.csv"
    df.to_csv(csv, index=False)

    compute_stats_(
        task="survival",
        output_dir=tmp_path / "stats",
        pred_csvs=[csv],
        time_label="day",
        status_label="status",
    )
    ind = pd.read_csv(
        tmp_path / "stats" / "survival-stats_individual.csv", index_col=0
    )
    assert ind["c_index"].iloc[0] > 0.8  # high risk ↔ short survival
    assert (tmp_path / "stats" / "plots").exists()


def test_multitarget_stats(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    rows = []
    for _ in range(n):
        k = rng.choice(["mut", "wt"])
        b = rng.choice(["mut", "wt"])
        pk = rng.uniform(0.5, 1.0)
        pb = rng.uniform(0.5, 1.0)
        rows.append(
            {
                "patient": random_string(8),
                "KRAS": k,
                "BRAF": b,
                "pred_KRAS": k,
                "pred_BRAF": b,
                "KRAS_mut": pk if k == "mut" else 1 - pk,
                "KRAS_wt": 1 - pk if k == "mut" else pk,
                "BRAF_mut": pb if b == "mut" else 1 - pb,
                "BRAF_wt": 1 - pb if b == "mut" else pb,
            }
        )
    csv = tmp_path / "patient-preds.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    compute_stats_(
        task="classification",
        output_dir=tmp_path / "stats",
        pred_csvs=[csv],
        ground_truth_label=["KRAS", "BRAF"],
    )
    assert (tmp_path / "stats" / "multitarget_categorical-stats_summary.csv").exists()


# --- survival primitive sanity -------------------------------------------------


def test_concordance_index_perfect():
    t = np.array([1.0, 2, 3, 4])
    assert concordance_index(t, np.array([1.0, 2, 3, 4])) == 1.0
    assert concordance_index(t, np.array([4.0, 3, 2, 1])) == 0.0
    assert concordance_index(t, np.ones(4)) == 0.5


def test_concordance_index_censoring():
    # censored subject only comparable when event precedes it
    t = np.array([2.0, 4.0])
    e = np.array([1, 0])
    assert concordance_index(t, np.array([1.0, 2.0]), e) == 1.0


def test_logrank_separation():
    a = np.linspace(10, 100, 30)
    b = np.linspace(200, 500, 30)
    res = logrank_test(a, b, np.ones(30), np.ones(30))
    assert res.p_value < 1e-6

    res_same = logrank_test(a, a, np.ones(30), np.ones(30))
    assert res_same.p_value > 0.9


def test_kaplan_meier_monotone():
    t = np.array([1.0, 2, 3, 4, 5, 6])
    e = np.array([1, 1, 0, 1, 0, 1])
    km = KaplanMeier.fit(t, e)
    assert km.survival[0] == 1.0
    assert np.all(np.diff(km.survival) <= 1e-12)
    assert km.at_risk[0] == 6


def test_survival_stats_multi_fold(tmp_path):
    rng = np.random.default_rng(1)
    csvs = []
    for i in range(2):
        d = tmp_path / f"split-{i}"
        d.mkdir()
        n = 40
        risk = rng.normal(0, 1, n)
        df = pd.DataFrame(
            {
                "patient": [random_string(8) for _ in range(n)],
                "pred_score": risk,
                "day": np.maximum(1, 800 - 250 * risk + rng.normal(0, 80, n)),
                "status": rng.choice([0, 1], n, p=[0.25, 0.75]),
            }
        )
        df["cut_off=0.1"] = None
        csv = d / "patient-preds.csv"
        df.to_csv(csv, index=False)
        csvs.append(csv)

    compute_stats_(
        task="survival",
        output_dir=tmp_path / "stats",
        pred_csvs=csvs,
        time_label="day",
        status_label="status",
    )
    ind = pd.read_csv(tmp_path / "stats" / "survival-stats_individual.csv", index_col=0)
    assert len(ind) == 2
    # the recorded training cut-off is used, not the per-fold median
    assert (ind["threshold"] == 0.1).all()
    assert len(list((tmp_path / "stats" / "plots").glob("*.svg"))) == 2


def test_regression_stats_multi_fold_aggregate(tmp_path):
    rng = np.random.default_rng(2)
    csvs = []
    for i in range(3):
        d = tmp_path / f"split-{i}"
        d.mkdir()
        truth = rng.uniform(0, 50, 30)
        pd.DataFrame(
            {
                "patient": [random_string(8) for _ in range(30)],
                "t": truth,
                "pred": truth + rng.normal(0, 2, 30),
            }
        ).to_csv(d / "patient-preds.csv", index=False)
        csvs.append(d / "patient-preds.csv")

    compute_stats_(
        task="regression",
        output_dir=tmp_path / "stats",
        pred_csvs=csvs,
        ground_truth_label="t",
    )
    agg = pd.read_csv(
        tmp_path / "stats" / "t_regression-stats_aggregated.csv", index_col=0
    )
    assert agg.loc["r2_score", "mean"] > 0.8
    assert agg.loc["r2_score", "95%_low"] <= agg.loc["r2_score", "mean"]
    assert agg.loc["r2_score", "95%_high"] >= agg.loc["r2_score", "mean"]
    assert len(list((tmp_path / "stats" / "plots").glob("*scatter.svg"))) == 3


def test_classification_stats_deploy_ensemble_same_dir(tmp_path):
    """Deploy writes patient-preds-{i}.csv into ONE directory; each must be
    its own fold (the reference keys by parent dir and collides here)."""
    csvs = []
    for i in range(2):
        csv = tmp_path / f"patient-preds-{i}.csv"
        random_patient_preds(n_patients=40, categories=["a", "b"]).to_csv(
            csv, index=False
        )
        csvs.append(csv)
    compute_stats_(
        task="classification",
        output_dir=tmp_path / "stats",
        pred_csvs=csvs,
        ground_truth_label="ground-truth",
        true_class="a",
    )
    ind = pd.read_csv(
        tmp_path / "stats" / "ground-truth_categorical-stats_individual.csv",
        index_col=[0, 1],
    )
    assert len(ind) == 4  # 2 folds × 2 classes
