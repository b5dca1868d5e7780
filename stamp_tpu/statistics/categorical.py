"""Statistics for categorical deployments (behavioral port of reference
statistics/categorical.py): per-class one-vs-all AUROC / AUPRC / F1 / t-test p
per fold, Student-t 95% CI aggregation across folds."""

from collections.abc import Sequence
from pathlib import Path

import pandas as pd
import scipy.stats as st
from sklearn import metrics

_score_labels = [
    "roc_auc_score",
    "average_precision_score",
    "f1_score",
    "p_value",
    "count",
]


def _categorical(preds_df: pd.DataFrame, target_label: str) -> pd.DataFrame:
    categories = preds_df[target_label].unique()
    y_true = preds_df[target_label]
    y_pred = (
        preds_df[[f"{target_label}_{cat}" for cat in categories]].astype(float).values
    )

    stats_df = pd.DataFrame(index=categories)
    stats_df["count"] = y_true.value_counts()
    stats_df["roc_auc_score"] = [
        metrics.roc_auc_score(y_true == cat, y_pred[:, i])
        for i, cat in enumerate(categories)
    ]
    stats_df["average_precision_score"] = [
        metrics.average_precision_score(y_true == cat, y_pred[:, i])
        for i, cat in enumerate(categories)
    ]
    y_pred_labels = categories[y_pred.argmax(axis=1)]
    stats_df["f1_score"] = [
        metrics.f1_score(y_true == cat, y_pred_labels == cat) for cat in categories
    ]
    p_values = []
    for i, cat in enumerate(categories):
        pos_scores = y_pred[:, i][y_true == cat]
        neg_scores = y_pred[:, i][y_true != cat]
        _, p_value = st.ttest_ind(pos_scores, neg_scores)
        p_values.append(p_value)
    stats_df["p_value"] = p_values

    assert set(_score_labels) & set(stats_df.columns) == set(_score_labels)
    return stats_df


def _aggregate_categorical_stats(df: pd.DataFrame) -> pd.DataFrame:
    stats = {}
    for cat, data in df.groupby("level_1"):
        scores_df = data[["roc_auc_score", "average_precision_score", "f1_score"]]
        means, sems = scores_df.mean(), scores_df.sem()
        lower, upper = st.t.interval(0.95, df=len(scores_df) - 1, loc=means, scale=sems)
        cat_stats_df = (
            pd.DataFrame.from_dict({"mean": means, "95%_low": lower, "95%_high": upper})
            .transpose()
            .unstack()
        )
        cat_stats_df[("count", "sum")] = data["count"].sum()
        stats[cat] = cat_stats_df
    return pd.DataFrame.from_dict(stats, orient="index")


def categorical_aggregated_(
    *, preds_csvs: Sequence[Path], outpath: Path, ground_truth_label: str
) -> None:
    preds_dfs = {}
    for p in preds_csvs:
        df = pd.read_csv(p, dtype=str).dropna(subset=[ground_truth_label])
        if len(df) > 0:
            preds_dfs[Path(p).parent.name] = _categorical(df, ground_truth_label)

    if not preds_dfs:
        raise ValueError(
            "No classification rows with ground truth available for statistics."
        )

    preds_df = pd.concat(preds_dfs).sort_index()
    preds_df.to_csv(outpath / f"{ground_truth_label}_categorical-stats_individual.csv")
    stats_df = _aggregate_categorical_stats(preds_df.reset_index())
    stats_df.to_csv(outpath / f"{ground_truth_label}_categorical-stats_aggregated.csv")


def categorical_aggregated_multitarget_(
    *,
    preds_csvs: Sequence[Path],
    outpath: Path,
    target_labels: Sequence[str],
) -> None:
    outpath.mkdir(parents=True, exist_ok=True)

    all_target_stats = {}
    csv_cache: dict[str, pd.DataFrame] = {
        Path(p).parent.name: pd.read_csv(p, dtype=str) for p in preds_csvs
    }

    for target_label in target_labels:
        preds_dfs = {}
        for fold_name, df in csv_cache.items():
            df_clean = df.dropna(subset=[target_label])
            if len(df_clean) > 0:
                preds_dfs[fold_name] = _categorical(df_clean, target_label)

        if not preds_dfs:
            continue

        preds_df = pd.concat(preds_dfs).sort_index()
        preds_df.to_csv(outpath / f"{target_label}_categorical-stats_individual.csv")
        stats_df = _aggregate_categorical_stats(preds_df.reset_index())
        stats_df.to_csv(outpath / f"{target_label}_categorical-stats_aggregated.csv")
        all_target_stats[target_label] = stats_df

    if all_target_stats:
        summary_dfs = []
        for target_name, stats_df in all_target_stats.items():
            stats_copy = stats_df.copy()
            stats_copy.index = pd.MultiIndex.from_product(
                [[target_name], stats_copy.index], names=["target", "class"]
            )
            summary_dfs.append(stats_copy)
        pd.concat(summary_dfs).to_csv(
            outpath / "multitarget_categorical-stats_summary.csv"
        )
