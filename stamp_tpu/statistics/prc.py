"""Bootstrapped precision-recall plotting (behavioral port of reference
statistics/prc.py)."""

from collections.abc import Sequence
from typing import NamedTuple, TypeAlias

import numpy as np
import numpy.typing as npt
import scipy.stats as st
from matplotlib.axes import Axes
from sklearn.metrics import auc, average_precision_score, precision_recall_curve

_Auprc: TypeAlias = float


def _plot_bootstrapped_pr_curve(
    *,
    ax: Axes,
    y_true: np.ndarray,
    y_score: np.ndarray,
    n_bootstrap_samples: int,
) -> tuple[_Auprc, float, float]:
    rng = np.random.default_rng()
    interp_recall = np.linspace(0, 1, num=1000)
    interp_prcs = np.full((n_bootstrap_samples, len(interp_recall)), np.nan)
    bootstrap_auprcs = []

    for i in range(n_bootstrap_samples):
        sample_idxs = rng.choice(len(y_true), len(y_true), replace=True)
        sample_y_true = y_true[sample_idxs]
        sample_y_pred = y_score[sample_idxs]
        if not (0 in sample_y_true and 1 in sample_y_true):
            continue
        precision, recall, _ = precision_recall_curve(sample_y_true, sample_y_pred)
        interp_prc = np.interp(interp_recall, recall[::-1], precision[::-1])
        interp_prcs[i] = interp_prc
        bootstrap_auprcs.append(auc(interp_recall, interp_prc))

    prc_lower, prc_upper = np.nanquantile(interp_prcs, [0.025, 0.975], axis=0)
    ax.fill_between(interp_recall, prc_lower, prc_upper, alpha=0.5)

    auprc_lower, auprc_upper = np.quantile(bootstrap_auprcs, [0.025, 0.975])

    precision, recall, _ = precision_recall_curve(y_true, y_score)
    auprc = float(auc(recall, precision))
    ax.plot(recall, precision, label=f"PRC = {auprc:.2f}")
    return auprc, float(auprc_lower), float(auprc_upper)


def plot_single_decorated_precision_recall_curve(
    *,
    ax: Axes,
    y_true: np.ndarray,
    y_score: np.ndarray,
    title: str,
    n_bootstrap_samples: int,
) -> None:
    auprc, lower, upper = _plot_bootstrapped_pr_curve(
        ax=ax, y_true=y_true, y_score=y_score, n_bootstrap_samples=n_bootstrap_samples
    )
    ax.set_title(f"{title}\nAUPRC = {auprc:.2f} [{lower:.2f}-{upper:.2f}]")
    ax.set_aspect("equal")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    baseline = y_true.sum() / len(y_true)
    ax.plot([0, 1], [baseline, baseline], "r--")


class _TPA(NamedTuple):
    trues: np.ndarray
    scores: np.ndarray
    auc: float


def plot_multiple_decorated_precision_recall_curves(
    *,
    ax: Axes,
    y_trues: Sequence[npt.NDArray[np.bool_]],
    y_scores: Sequence[npt.NDArray[np.float64]],
    title: str | None = None,
) -> tuple[float, float]:
    tpas = [
        _TPA(t, p, float(average_precision_score(t, p)))
        for t, p in zip(y_trues, y_scores)
    ]
    tpas = sorted(tpas, key=lambda x: x.auc, reverse=True)

    for true, pred, prc_score in tpas:
        precision, recall, _ = precision_recall_curve(true, pred)
        ax.plot(recall, precision, label=f"PRC = {prc_score:0.2f}")

    all_samples = np.concatenate(y_trues)
    ax.plot([0, 1], [0, 1], "r--", alpha=0)
    ax.set_aspect("equal")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    baseline = all_samples.sum() / len(all_samples)
    ax.plot([0, 1], [baseline, baseline], "r--")
    ax.legend()

    aucs = [x.auc for x in tpas]
    mean_auc = float(np.mean(aucs))

    if len(aucs) < 2 or np.isnan(st.sem(aucs)):
        lower, upper = mean_auc, mean_auc
    else:
        lower, upper = st.t.interval(
            0.95, len(aucs) - 1, loc=np.mean(aucs), scale=st.sem(aucs)
        )

    lower = max(0, lower)
    upper = min(1, upper)
    auc_str = f"PRC = {np.mean(aucs):0.2f} [{lower:0.2f}-{upper:0.2f}]"
    ax.set_title(f"{title}\n{auc_str}" if title else auc_str)
    return lower, upper
