"""K-fold cross-validation with splits.json resumability.

Behavioral parity with reference src/stamp/modeling/crossval.py: splits.json
create-or-load (identical pydantic schema so splits files interchange with
the reference), StratifiedKFold / KFold dispatch with sklearn
``random_state=0`` (fold identity matches the reference exactly), per-fold
skip-if-done, train on k−1 folds with the test fold as early-stop validation
(pure 2-way split), deploy on test fold → ``split-i/patient-preds.csv``.

Folds are independent by construction: on a multi-host TPU deployment they
parallelize across slices over DCN with the filesystem skip-if-exists
contract doing the coordination (SURVEY.md §2.3).
"""

from __future__ import annotations

import logging
from collections import Counter
from collections.abc import Mapping, Sequence
from typing import Any, cast

import numpy as np
from pydantic import BaseModel
from sklearn.model_selection import KFold, StratifiedKFold

from stamp_tpu.modeling.config import AdvancedConfig, CrossvalConfig
from stamp_tpu.modeling.data import (
    BatchIterator,
    PatientData,
    create_dataset,
    load_patient_data_,
    log_patient_class_summary,
)
from stamp_tpu.modeling.deploy import (
    _predict,
    _to_prediction_df,
    _to_regression_prediction_df,
    _to_survival_prediction_df,
    load_model_from_ckpt,
)
from stamp_tpu.modeling.train import setup_model_from_dataloaders, train_model_
from stamp_tpu.modeling.transforms import VaryPrecisionTransform
from stamp_tpu.types import GroundTruth, PatientId

_logger = logging.getLogger("stamp")


class _Split(BaseModel):
    train_patients: set[PatientId]
    test_patients: set[PatientId]


class _Splits(BaseModel):
    splits: Sequence[_Split]


def categorical_crossval_(
    config: CrossvalConfig,
    advanced: AdvancedConfig,
) -> None:
    if config.task is None:
        raise ValueError(
            "task must be set to 'classification' | 'regression' | 'survival'"
        )

    patient_to_data, feature_type = load_patient_data_(
        feature_dir=config.feature_dir,
        clini_table=config.clini_table,
        slide_table=config.slide_table,
        task=config.task,
        ground_truth_label=config.ground_truth_label,
        time_label=config.time_label,
        status_label=config.status_label,
        patient_label=config.patient_label,
        filename_label=config.filename_label,
        drop_patients_with_missing_ground_truth=(
            config.drop_patients_with_missing_ground_truth
        ),
    )
    _logger.info(f"Detected feature type: {feature_type}")

    patient_to_ground_truth = {
        pid: p.ground_truth for pid, p in patient_to_data.items()
    }

    if feature_type not in ("tile", "slide", "patient"):
        raise ValueError(f"Unknown feature type: {feature_type}")

    config.output_dir.mkdir(parents=True, exist_ok=True)
    splits_file = config.output_dir / "splits.json"

    if not splits_file.exists():
        is_multitarget = any(
            isinstance(p.ground_truth, dict) for p in patient_to_data.values()
        )
        spliter = (
            KFold
            if (config.task == "regression" or is_multitarget)
            else StratifiedKFold
        )
        _logger.info(f"Using {spliter.__name__} for cross-validation splits")
        splits = _get_splits(
            patient_to_data=patient_to_data,
            n_splits=config.n_splits,
            spliter=spliter,
            task=config.task,
        )
        with open(splits_file, "w") as fp:
            fp.write(splits.model_dump_json(indent=4))
    else:
        _logger.debug(f"reading splits from {splits_file}")
        with open(splits_file, "r") as fp:
            splits = _Splits.model_validate_json(fp.read())

    patients_in_splits = {
        patient
        for split in splits.splits
        for patient in [*split.train_patients, *split.test_patients]
    }

    if patients_without_ground_truth := patients_in_splits - patient_to_data.keys():
        raise RuntimeError(
            "The splits file contains some patients we don't have information "
            "for in the clini / slide table: "
            f"{patients_without_ground_truth}"
        )

    if ground_truths_not_in_split := patient_to_data.keys() - patients_in_splits:
        _logger.warning(
            "Some of the entries in the clini / slide table are not in the "
            f"crossval split: {ground_truths_not_in_split}"
        )

    categories_for_export: dict[str, list] | list = []
    categories: Sequence[GroundTruth] | list | None = []

    if config.task == "classification":
        if isinstance(config.ground_truth_label, str):
            categories = config.categories or sorted(
                {
                    p.ground_truth
                    for p in patient_to_data.values()
                    if p.ground_truth is not None
                }
            )
            log_patient_class_summary(
                patient_to_data=dict(patient_to_data), categories=categories
            )
            categories_for_export = cast(list, categories)
        else:
            categories_accum: dict[str, set[GroundTruth]] = {}
            for p in patient_to_data.values():
                gt = p.ground_truth
                if isinstance(gt, dict):
                    for k, v in gt.items():
                        if v is not None:
                            categories_accum.setdefault(k, set()).add(v)
            categories_for_export = {k: sorted(v) for k, v in categories_accum.items()}
            for t, cats in categories_for_export.items():
                ground_truths = [
                    p.ground_truth.get(t)
                    for p in patient_to_data.values()
                    if isinstance(p.ground_truth, dict)
                    and p.ground_truth.get(t) is not None
                ]
                counter = Counter(ground_truths)
                _logger.info(
                    f"{t} | Total patients: {len(ground_truths)} | "
                    + " | ".join([f"Class {c}: {counter.get(c, 0)}" for c in cats])
                )
            categories = config.categories or None
    else:
        categories = []

    for split_i, split in enumerate(splits.splits):
        split_dir = config.output_dir / f"split-{split_i}"

        if (split_dir / "patient-preds.csv").exists():
            _logger.info(
                f"skipping training for split {split_i}, "
                "as a model checkpoint is already present"
            )
            continue

        if not (split_dir / "model.ckpt").exists():
            train_patient_ids = [
                pid for pid in split.train_patients if pid in patient_to_data
            ]
            test_patient_ids = [
                pid for pid in split.test_patients if pid in patient_to_data
            ]
            train_patient_data = [patient_to_data[pid] for pid in train_patient_ids]
            test_patient_data = [patient_to_data[pid] for pid in test_patient_ids]

            fold_categories = (
                categories
                if categories is not None
                else (
                    sorted(
                        {
                            p.ground_truth
                            for p in patient_to_data.values()
                            if p.ground_truth is not None
                            and not isinstance(p.ground_truth, dict)
                        }
                    )
                    if not isinstance(config.ground_truth_label, Sequence)
                    else None
                )
            )

            train_transform = (
                VaryPrecisionTransform(min_fraction_bits=1)
                if config.use_vary_precision_transform
                else None
            )

            train_ds, train_categories = create_dataset(
                feature_type=feature_type,
                task=config.task,
                patient_data=train_patient_data,
                bag_size=advanced.bag_size,
                shuffle=True,
                transform=train_transform,
                categories=fold_categories,
            )
            test_ds, _ = create_dataset(
                feature_type=feature_type,
                task=config.task,
                patient_data=test_patient_data,
                bag_size=None,
                shuffle=False,
                transform=None,
                categories=train_categories,
            )
            train_dl = BatchIterator(
                train_ds, batch_size=advanced.batch_size, shuffle=True
            )
            test_dl = BatchIterator(test_ds, batch_size=1, shuffle=False)

            dim_feats = int(train_ds[0][0].shape[-1])

            model = setup_model_from_dataloaders(
                train_dl=train_dl,
                valid_dl=test_dl,
                task=config.task,
                train_categories=train_categories,
                dim_feats=dim_feats,
                train_patients=train_patient_ids,
                valid_patients=test_patient_ids,
                feature_type=feature_type,
                advanced=advanced,
                ground_truth_label=config.ground_truth_label,
                time_label=config.time_label,
                status_label=config.status_label,
                clini_table=config.clini_table,
                slide_table=config.slide_table,
                feature_dir=config.feature_dir,
            )
            model, variables = train_model_(
                output_dir=split_dir,
                model=model,
                train_dl=train_dl,
                valid_dl=test_dl,
                max_epochs=advanced.max_epochs,
                patience=advanced.patience,
                accelerator=advanced.accelerator,
            )
        else:
            model, variables = load_model_from_ckpt(split_dir / "model.ckpt")

        if not (split_dir / "patient-preds.csv").exists():
            test_patients = [
                pid for pid in split.test_patients if pid in patient_to_data
            ]
            test_patient_data = [patient_to_data[pid] for pid in test_patients]
            test_ds, _ = create_dataset(
                feature_type=feature_type,
                task=config.task,
                patient_data=test_patient_data,
                bag_size=None,
                shuffle=False,
                transform=None,
                categories=categories,
            )
            test_dl = BatchIterator(test_ds, batch_size=1, shuffle=False)

            predictions = _predict(
                model=model,
                variables=variables,
                test_dl=test_dl,
                patient_ids=test_patients,
                accelerator=advanced.accelerator,
            )

            if config.task == "survival":
                if any(isinstance(gt, dict) for gt in patient_to_ground_truth.values()):
                    _logger.warning(
                        "Multi-target survival prediction export not yet "
                        "supported; skipping CSV save"
                    )
                else:
                    _to_survival_prediction_df(
                        patient_to_ground_truth=patient_to_ground_truth,
                        predictions=predictions,
                        patient_label=config.patient_label,
                        cut_off=model.hparams.get("train_pred_median", None),
                    ).to_csv(split_dir / "patient-preds.csv", index=False)
            elif config.task == "regression":
                if config.ground_truth_label is None:
                    raise RuntimeError("Ground truth label is required for regression")
                if isinstance(config.ground_truth_label, str):
                    _to_regression_prediction_df(
                        patient_to_ground_truth=patient_to_ground_truth,
                        predictions=predictions,
                        patient_label=config.patient_label,
                        ground_truth_label=config.ground_truth_label,
                    ).to_csv(split_dir / "patient-preds.csv", index=False)
                else:
                    _logger.warning(
                        "Multi-target regression prediction export not yet "
                        "supported; skipping CSV save"
                    )
            else:
                if config.ground_truth_label is None:
                    raise RuntimeError(
                        "Ground truth label is required for classification"
                    )
                _to_prediction_df(
                    categories=categories_for_export,
                    patient_to_ground_truth=patient_to_ground_truth,
                    predictions=predictions,
                    patient_label=config.patient_label,
                    ground_truth_label=config.ground_truth_label,
                ).to_csv(split_dir / "patient-preds.csv", index=False)


def _get_splits(
    *,
    patient_to_data: Mapping[PatientId, PatientData],
    n_splits: int,
    spliter,
    task: str | None = None,
) -> _Splits:
    """Reference crossval.py:373-426."""
    patients = np.array(list(patient_to_data.keys()))
    gts = [patient.ground_truth for patient in patient_to_data.values()]

    if task == "survival":
        statuses: list[int] = []
        for gt in gts:
            val = next(iter(gt.values())) if isinstance(gt, dict) else gt
            if isinstance(val, (tuple, list)) and len(val) == 2:
                status_val = val[1]
            else:
                status_val = val
            statuses.append(int(cast(Any, status_val)) if status_val is not None else 0)
        y_strat: Any = np.array(statuses)
    elif task == "classification":
        y_strat = np.array(
            [next(iter(gt.values())) if isinstance(gt, dict) else gt for gt in gts]
        )
    else:
        y_strat = None

    skf = spliter(n_splits=n_splits, shuffle=True, random_state=0)
    splits_iter = skf.split(patients) if y_strat is None else skf.split(patients, y_strat)

    return _Splits(
        splits=[
            _Split(
                train_patients=set(patients[train_indices]),
                test_patients=set(patients[test_indices]),
            )
            for train_indices, test_indices in splits_iter
        ]
    )
