"""Survival statistics: C-index, KM curves, log-rank p-value.

Behavioral port of reference statistics/survival.py, using the in-house
estimators from stamp_tpu/statistics/survival_util.py in place of lifelines.
"""

from __future__ import annotations

from pathlib import Path

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from stamp_tpu.statistics.survival_util import (
    KaplanMeier,
    concordance_index,
    logrank_test,
)


def _comparable_pairs_count(times: np.ndarray, events: np.ndarray) -> int:
    t_i = times[:, None]
    t_j = times[None, :]
    e_i = events[:, None]
    return int(((t_i < t_j) & (e_i == 1)).sum())


def _cindex(
    time: np.ndarray, event: np.ndarray, risk: np.ndarray
) -> tuple[float, int]:
    """Higher risk → shorter survival (negate for the concordance helper)."""
    c_index = float(concordance_index(time, -risk, event))
    n_pairs = _comparable_pairs_count(time, event)
    return c_index, n_pairs


def _survival_stats_for_csv(
    df: pd.DataFrame,
    *,
    time_label: str,
    status_label: str,
    risk_label: str | None = None,
    cut_off: float | None = None,
) -> pd.Series:
    if risk_label is None:
        risk_label = "pred_score"

    df = df.dropna(subset=[time_label, status_label, risk_label]).copy()
    df = df[df[status_label].isin([0, 1])]
    if len(df) == 0:
        raise ValueError("No valid rows after dropping NaN or invalid survival data.")

    time = np.asarray(df[time_label], dtype=float)
    event = np.asarray(df[status_label], dtype=int)
    risk = np.asarray(df[risk_label], dtype=float)

    c_index, n_pairs = _cindex(time, event, risk)

    median_risk = float(cut_off) if cut_off is not None else float(np.nanmedian(risk))
    low_mask = risk <= median_risk
    high_mask = risk > median_risk
    if low_mask.sum() > 0 and high_mask.sum() > 0:
        res = logrank_test(
            time[low_mask],
            time[high_mask],
            event_observed_A=event[low_mask],
            event_observed_B=event[high_mask],
        )
        p_logrank = float(res.p_value)
    else:
        p_logrank = np.nan

    return pd.Series(
        {
            "c_index": c_index,
            "logrank_p": p_logrank,
            "count": int(len(df)),
            "events": int(event.sum()),
            "censored": int((event == 0).sum()),
            "comparable_pairs": n_pairs,
            "threshold": median_risk,
        }
    )


def _plot_km(
    df: pd.DataFrame,
    *,
    fold_name: str,
    time_label: str,
    status_label: str,
    risk_label: str | None = None,
    cut_off: float | None = None,
    outdir: Path,
) -> None:
    """Kaplan–Meier curve (median split) with log-rank p and C-index annotation."""
    if risk_label is None:
        risk_label = "pred_score"

    df = df.replace(["NaN", "nan", "None", "Inf", "inf"], np.nan)
    df = df.dropna(subset=[time_label, status_label, risk_label]).copy()
    df = df[df[status_label].isin([0, 1])]
    if len(df) == 0:
        raise ValueError(f"No valid rows to plot for {fold_name}.")

    time = np.asarray(df[time_label], dtype=float)
    event = np.asarray(df[status_label], dtype=int)
    risk = np.asarray(df[risk_label], dtype=float)

    median_risk = float(cut_off) if cut_off is not None else float(np.nanmedian(risk))
    low_mask = risk <= median_risk
    high_mask = risk > median_risk

    fig, ax = plt.subplots(figsize=(8, 6))
    fitters: list[KaplanMeier] = []
    if low_mask.sum() > 0:
        km_low = KaplanMeier.fit(time[low_mask], event[low_mask], label="Low risk")
        km_low.plot(ax, color="blue")
        fitters.append(km_low)
    if high_mask.sum() > 0:
        km_high = KaplanMeier.fit(time[high_mask], event[high_mask], label="High risk")
        km_high.plot(ax, color="red")
        fitters.append(km_high)

    # at-risk table along the bottom
    if fitters:
        t_max = max(f.timeline.max() for f in fitters)
        ticks = np.linspace(0, t_max, 6)
        table_lines = []
        for f in fitters:
            counts = f.at_risk_at(ticks).astype(int)
            table_lines.append(
                f"{f.label}: " + "  ".join(str(c) for c in counts)
            )
        ax.text(
            0.0,
            -0.18,
            "At risk\n" + "\n".join(table_lines),
            transform=ax.transAxes,
            fontsize=9,
            va="top",
        )

    res = logrank_test(
        time[low_mask],
        time[high_mask],
        event_observed_A=event[low_mask],
        event_observed_B=event[high_mask],
    )
    logrank_p = float(res.p_value) if res.p_value == res.p_value else np.nan
    c_used, _pairs = _cindex(time, event, risk)

    ax.text(
        0.6,
        0.08,
        f"Log-rank p = {logrank_p:.4e}\nC-index = {c_used:.3f}\n"
        f"Cut-off = {median_risk:.3f}",
        transform=ax.transAxes,
        fontsize=11,
        bbox=dict(facecolor="white", edgecolor="black", boxstyle="round,pad=0.3"),
    )
    ax.set_title(
        f"{fold_name} – Kaplan–Meier Survival Curve", fontsize=13, weight="bold"
    )
    ax.set_xlabel("Time")
    ax.set_ylabel("Survival probability")
    ax.grid(True, linestyle="--", alpha=0.6)
    ax.set_ylim(0, 1)
    ax.legend()
    plt.tight_layout()

    (outdir / "plots").mkdir(parents=True, exist_ok=True)
    outpath = outdir / "plots" / f"fold_{fold_name}_km_curve.svg"
    plt.savefig(outpath, dpi=300, bbox_inches="tight")
    plt.close(fig)
