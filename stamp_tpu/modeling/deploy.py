"""Deployment: checkpoint → predictions → per-task CSVs (+ ensembles).

Behavioral parity with reference src/stamp/modeling/deploy.py: model
re-instantiation purely from checkpoint hyper-parameters, ensemble consistency
checks (task / feature level / labels / categories), the data-leakage CRITICAL
log, softmax/risk post-processing, and the exact prediction-CSV column layout
(``{gt_label}_{category}``, ``pred``, per-patient ``loss``, survival
``pred_score`` + ``cut_off=…`` marker column).
"""

from __future__ import annotations

import logging
import math
from collections.abc import Mapping, Sequence
from pathlib import Path
from typing import Any, TypeAlias, Union, cast

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from stamp_tpu.modeling.checkpoint import load_checkpoint
from stamp_tpu.modeling.data import (
    BagDataset,
    BatchIterator,
    create_dataset,
    detect_feature_type,
    filter_complete_patient_data_,
    load_patient_level_data,
    patient_to_ground_truth_from_clini_table_,
    patient_to_survival_from_clini_table_,
    slide_to_patient_from_slide_table_,
)
from stamp_tpu.modeling.tasks import TaskModel, instantiate_from_hparams
from stamp_tpu.types import (
    Category,
    GroundTruth,
    PandasLabel,
    PatientId,
    SurvivalGroundTruth,
)

__all__ = ["deploy_categorical_model_", "load_model_from_ckpt"]

_logger = logging.getLogger("stamp")

PredictionSingle: TypeAlias = np.ndarray
PredictionMulti: TypeAlias = dict[str, np.ndarray]
PredictionsType: TypeAlias = Mapping[PatientId, Union[PredictionSingle, PredictionMulti]]


def load_model_from_ckpt(path: Union[str, Path]) -> tuple[TaskModel, Any]:
    """Load (task wrapper, flax variables) from a checkpoint
    (reference deploy.py:49-58)."""
    payload = load_checkpoint(Path(path))
    model = instantiate_from_hparams(payload["hyper_parameters"])
    return model, payload["variables"]


def _bucket_size(n: int, *, minimum: int = 512) -> int:
    if n <= minimum:
        return minimum
    return 1 << math.ceil(math.log2(n))


def _predict(
    *,
    model: TaskModel,
    variables: Any,
    test_dl: BatchIterator,
    patient_ids: Sequence[PatientId],
    accelerator: str | None = None,
) -> PredictionsType:
    """Run inference over the test iterator (reference deploy.py:390-456)."""
    from stamp_tpu.modeling.train import _accelerator_device

    device = _accelerator_device(accelerator)
    if device is not None:
        with jax.default_device(device):
            return _predict_impl(
                model=model,
                variables=variables,
                test_dl=test_dl,
                patient_ids=patient_ids,
            )
    return _predict_impl(
        model=model, variables=variables, test_dl=test_dl, patient_ids=patient_ids
    )


def _predict_impl(
    *,
    model: TaskModel,
    variables: Any,
    test_dl: BatchIterator,
    patient_ids: Sequence[PatientId],
) -> PredictionsType:
    is_tile = model.supported_features[0] == "tile"
    module = model.module
    uses_coords = model.uses_coords
    supports_mask = is_tile and bool(getattr(module, "supports_coords", False))
    is_multitarget = isinstance(getattr(model, "weights", None), dict)

    variables = jax.device_put(variables)  # weights as jit args, not constants

    @jax.jit
    def fwd_padded_impl(variables, bags, coords, key_mask):
        kwargs: dict = dict(train=False)
        if uses_coords:
            kwargs.update(coords=coords, key_mask=key_mask)
        return module.apply(variables, bags, **kwargs)

    @jax.jit
    def fwd_exact_impl(variables, *inputs):
        if is_tile:
            bags, coords = inputs
            kwargs = dict(train=False)
            if uses_coords:
                kwargs.update(coords=coords, key_mask=None)
            return module.apply(variables, bags, **kwargs)
        (feats,) = inputs
        return module.apply(variables, feats, train=False)

    def fwd_padded(*args):
        return fwd_padded_impl(variables, *args)

    def fwd_exact(*args):
        return fwd_exact_impl(variables, *args)

    outs: list = []
    for batch in test_dl:
        if is_tile:
            bags, coords, sizes, _targets = batch
            if supports_mask:
                bucket = _bucket_size(bags.shape[1])
                b, t, f = bags.shape
                if t < bucket:
                    bags = np.concatenate(
                        [bags, np.zeros((b, bucket - t, f), dtype=bags.dtype)], axis=1
                    )
                    coords = np.concatenate(
                        [coords, np.zeros((b, bucket - t, 2), dtype=coords.dtype)],
                        axis=1,
                    )
                key_mask = np.arange(bucket)[None, :] < np.asarray(sizes)[:, None]
                out = fwd_padded(
                    jnp.asarray(bags), jnp.asarray(coords), jnp.asarray(key_mask)
                )
            else:
                out = fwd_exact(jnp.asarray(bags), jnp.asarray(coords))
        else:
            feats, _targets = batch
            out = fwd_exact(jnp.asarray(feats))
        if isinstance(out, dict):
            # multi-target predict_step applies softmax (barspoon.py:333-344)
            outs.append(
                {k: np.asarray(jax.nn.softmax(v, axis=-1)) for k, v in out.items()}
            )
        else:
            outs.append(np.asarray(out))

    if not outs:
        return {}

    if is_multitarget or isinstance(outs[0], dict):
        per_target: dict[str, list[np.ndarray]] = {}
        for out in outs:
            for k, v in cast(dict, out).items():
                per_target.setdefault(k, []).append(v)
        per_target_arr = {k: np.concatenate(v, axis=0) for k, v in per_target.items()}
        if model.hparams.get("task") == "classification":
            # second softmax — faithful to reference deploy.py:428-430, which
            # re-softmaxes the already-softmaxed predict_step outputs
            per_target_arr = {
                k: _np_softmax(v) for k, v in per_target_arr.items()
            }
        num_preds = next(iter(per_target_arr.values())).shape[0]
        return {
            pid: {k: per_target_arr[k][i] for k in per_target_arr}
            for i, pid in enumerate(patient_ids[:num_preds])
        }

    raw_preds = np.concatenate(outs, axis=0)
    if model.hparams.get("task") == "classification":
        raw_preds = _np_softmax(raw_preds)
    elif model.hparams.get("task") == "survival":
        raw_preds = raw_preds.squeeze(-1)

    return {pid: raw_preds[i] for i, pid in enumerate(patient_ids)}


def _np_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def deploy_categorical_model_(
    *,
    output_dir: Path,
    checkpoint_paths: Sequence[Path],
    clini_table: Path | None,
    slide_table: Path | None,
    feature_dir: Path,
    ground_truth_label: PandasLabel | Sequence[PandasLabel] | None,
    time_label: PandasLabel | None,
    status_label: PandasLabel | None,
    patient_label: PandasLabel,
    filename_label: PandasLabel,
    num_workers: int,
    accelerator: str | None = None,
    drop_patients_with_missing_ground_truth: bool = True,
) -> None:
    """Reference deploy.py:61-387."""
    del num_workers
    feature_type = detect_feature_type(feature_dir)
    _logger.info(f"Detected feature type: {feature_type}")

    models = [load_model_from_ckpt(p) for p in checkpoint_paths]

    tasks = {model.hparams["task"] for model, _v in models}
    if len(tasks) != 1:
        raise RuntimeError(f"Mixed tasks in ensemble: {tasks}")
    task = tasks.pop()

    model_supported = models[0][0].hparams["supported_features"]
    if model_supported == "tile":
        if feature_type != "tile":
            raise RuntimeError(
                "Model trained on tile-level features cannot be deployed on "
                f"{feature_type}-level features."
            )
    elif model_supported in ("slide", "patient"):
        if feature_type not in ("slide", "patient"):
            raise RuntimeError(
                f"Model trained on {model_supported}-level features cannot be "
                "deployed on tile-level features."
            )
    else:
        raise RuntimeError(f"Unknown supported_features value: {model_supported}")

    if task == "survival":
        time_labels = {getattr(m, "time_label", None) for m, _v in models}
        status_labels = {getattr(m, "status_label", None) for m, _v in models}
        if len(time_labels) != 1 or len(status_labels) != 1:
            raise RuntimeError(
                "Survival label mismatch between models: "
                f"time_labels={time_labels}, status_labels={status_labels}"
            )
        model_time_label = next(iter(time_labels))
        model_status_label = next(iter(status_labels))
        if (time_label and time_label != model_time_label) or (
            status_label and status_label != model_status_label
        ):
            _logger.warning(
                "deployment time/status labels differ from training: "
                f"{(time_label, status_label)} vs "
                f"{(model_time_label, model_status_label)}"
            )
        time_label = time_label or model_time_label
        status_label = status_label or model_status_label
    else:
        ground_truth_labels = {
            tuple(m.ground_truth_label)
            if isinstance(m.ground_truth_label, list)
            else (m.ground_truth_label,)
            for m, _v in models
        }
        if len(ground_truth_labels) != 1:
            raise RuntimeError(
                f"ground truth labels differ between models: {ground_truth_labels}"
            )
        model_ground_truth_label = models[0][0].ground_truth_label
        if (
            ground_truth_label is not None
            and ground_truth_label != model_ground_truth_label
        ):
            _logger.warning(
                "deployment ground truth label differs from training: "
                f"{ground_truth_label} vs {model_ground_truth_label}"
            )
        ground_truth_label = ground_truth_label or cast(
            PandasLabel, model_ground_truth_label
        )

    output_dir.mkdir(exist_ok=True, parents=True)

    model_categories = None
    if task == "classification":
        category_sets = {
            tuple(cast(Sequence[GroundTruth], m.categories))
            if not isinstance(m.categories, dict)
            else tuple(sorted(m.categories))
            for m, _v in models
        }
        if len(category_sets) != 1:
            raise RuntimeError(f"Categories differ between models: {category_sets}")
        first_cats = models[0][0].categories
        model_categories = (
            list(cast(Sequence[GroundTruth], first_cats))
            if not isinstance(first_cats, dict)
            else None
        )

    # --- data loading (reference deploy.py:186-262) ---
    if feature_type in ("tile", "slide"):
        if slide_table is None:
            raise ValueError(
                "A slide table is required for deployment of slide-level or "
                "tile-level features."
            )
        slide_to_patient = slide_to_patient_from_slide_table_(
            slide_table_path=slide_table,
            feature_dir=feature_dir,
            patient_label=patient_label,
            filename_label=filename_label,
        )
        if clini_table is not None:
            if task == "survival":
                patient_to_ground_truth: Mapping[PatientId, Any] = (
                    patient_to_survival_from_clini_table_(
                        clini_table_path=clini_table,
                        patient_label=patient_label,
                        time_label=cast(str, models[0][0].time_label),
                        status_label=cast(str, models[0][0].status_label),
                    )
                )
            else:
                if ground_truth_label is None:
                    raise ValueError(
                        "Ground truth label is required for deployment of "
                        "classification/regression models."
                    )
                patient_to_ground_truth = patient_to_ground_truth_from_clini_table_(
                    clini_table_path=clini_table,
                    ground_truth_label=ground_truth_label,
                    patient_label=patient_label,
                )
        else:
            patient_to_ground_truth = {
                patient_id: None for patient_id in set(slide_to_patient.values())
            }
        patient_to_data = filter_complete_patient_data_(
            patient_to_ground_truth=patient_to_ground_truth,
            slide_to_patient=slide_to_patient,
            drop_patients_with_missing_ground_truth=drop_patients_with_missing_ground_truth,
        )
        patient_ids = list(patient_to_data.keys())
    elif feature_type == "patient":
        if slide_table is not None:
            _logger.warning(
                "slide_table is ignored for patient-level features during deployment."
            )
        if clini_table is None:
            raise ValueError(
                "clini_table is required for patient-level feature deployment."
            )
        patient_to_data = load_patient_level_data(
            task=task,
            clini_table=clini_table,
            feature_dir=feature_dir,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
            time_label=time_label,
            status_label=status_label,
        )
        patient_ids = list(patient_to_data.keys())
        patient_to_ground_truth = {
            pid: p.ground_truth for pid, p in patient_to_data.items()
        }
    else:
        raise RuntimeError(f"Unsupported feature type: {feature_type}")

    test_ds, _ = create_dataset(
        feature_type=feature_type,
        task=task,
        patient_data=list(patient_to_data.values()),
        bag_size=None,
        shuffle=False,
        transform=None,
        categories=model_categories,
    )
    test_dl = BatchIterator(test_ds, batch_size=1, shuffle=False)

    df_builder = {
        "classification": _to_prediction_df,
        "regression": _to_regression_prediction_df,
        "survival": _to_survival_prediction_df,
    }[task]

    all_predictions: list[PredictionsType] = []
    categories_for_export: Any = None
    for model_i, (model, variables) in enumerate(models):
        patients_used_for_training: set[PatientId] = set(
            getattr(model, "train_patients", [])
        ) | set(getattr(model, "valid_patients", []))
        if overlap := patients_used_for_training & set(patient_ids):
            _logger.critical(
                "DATA LEAKAGE DETECTED: %d patient(s) in deployment set were used "
                "during training/validation. Overlapping IDs: %s",
                len(overlap),
                sorted(overlap),
            )

        predictions = _predict(
            model=model,
            variables=variables,
            test_dl=test_dl,
            patient_ids=patient_ids,
            accelerator=accelerator,
        )
        all_predictions.append(predictions)

        if predictions and isinstance(next(iter(predictions.values())), dict):
            categories_accum: dict[str, set[GroundTruth]] = {}
            for pd_item in patient_to_data.values():
                gt = pd_item.ground_truth
                if isinstance(gt, dict):
                    for k, v in gt.items():
                        if v is not None:
                            categories_accum.setdefault(k, set()).add(v)
            categories_for_export = {k: sorted(v) for k, v in categories_accum.items()}
        else:
            if task == "classification":
                categories_for_export = models[0][0].categories
            else:
                categories_for_export = []

        cut_off = model.hparams.get("train_pred_median", None)

        name = (
            f"patient-preds-{model_i}.csv" if len(models) > 1 else "patient-preds.csv"
        )
        df_builder(
            categories=categories_for_export,
            patient_to_ground_truth=patient_to_ground_truth,
            predictions=predictions,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
            cut_off=cut_off,
            time_label=time_label,
            status_label=status_label,
        ).to_csv(output_dir / name, index=False)

    if task == "classification":
        mean_preds: dict[PatientId, Any] = {}
        for pid in patient_ids:
            model_preds = [preds[pid] for preds in all_predictions]
            firstp = model_preds[0]
            if isinstance(firstp, dict):
                mean_preds[pid] = {
                    t: np.stack([p[t] for p in model_preds]).mean(axis=0)
                    for t in firstp.keys()
                }
            else:
                mean_preds[pid] = np.stack(model_preds).mean(axis=0)

        assert categories_for_export is not None
        df_builder(
            categories=categories_for_export,
            patient_to_ground_truth=patient_to_ground_truth,
            predictions=mean_preds,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
        ).to_csv(output_dir / "patient-preds_95_confidence_interval.csv", index=False)


# ---------------------------------------------------------------------------
# CSV builders (reference deploy.py:459-692)
# ---------------------------------------------------------------------------


def _cross_entropy_row(probs: np.ndarray, target_index: int) -> float:
    """torch F.cross_entropy on a single row of *probabilities* — the
    reference feeds softmaxed scores back through cross_entropy
    (deploy.py:546-550, 580-588), so we softmax again like torch does."""
    logp = probs - _np_logsumexp_1d(probs)
    return float(-logp[target_index])


def _np_logsumexp_1d(x: np.ndarray) -> float:
    m = x.max()
    return m + np.log(np.exp(x - m).sum())


def _to_prediction_df(
    *,
    categories,
    patient_to_ground_truth,
    predictions,
    patient_label: PandasLabel,
    ground_truth_label,
    **kwargs,
) -> pd.DataFrame:
    first_pred = next(iter(predictions.values()))

    if isinstance(first_pred, dict):
        target_labels = list(cast(dict, first_pred).keys())
        if isinstance(categories, dict):
            cats_map = dict(categories)
        else:
            cats_map = {}
            if isinstance(categories, Sequence):
                try:
                    for i, t in enumerate(target_labels):
                        cats_map[t] = list(categories[i])
                except Exception:
                    cats_map = {}

        if any(t not in cats_map for t in target_labels):
            inferred: dict[str, set] = {t: set() for t in target_labels}
            for pid, gt in patient_to_ground_truth.items():
                if isinstance(gt, dict):
                    for t in target_labels:
                        val = gt.get(t)
                        if val is not None:
                            inferred[t].add(val)
            for t in target_labels:
                if t not in cats_map:
                    cats_map[t] = sorted(inferred.get(t, []))

        rows = []
        for pid, pred_dict in predictions.items():
            row: dict = {patient_label: pid}
            gt_entry = patient_to_ground_truth.get(pid)
            for t in target_labels:
                row[t] = gt_entry.get(t) if isinstance(gt_entry, dict) else gt_entry

            total_loss = 0.0
            has_loss = False
            for t in target_labels:
                probs = np.asarray(pred_dict[t])
                cats = cats_map.get(t, [])
                if probs.size == 1:
                    row[f"pred_{t}"] = float(probs.item())
                else:
                    pred_idx = int(probs.argmax())
                    row[f"pred_{t}"] = cats[pred_idx] if pred_idx < len(cats) else pred_idx
                for i_cat, cat in enumerate(cats):
                    row[f"{t}_{cat}"] = (
                        float(probs[i_cat]) if i_cat < probs.shape[0] else None
                    )
                if isinstance(gt_entry, dict) and (gt := gt_entry.get(t)) is not None:
                    try:
                        target_index = int(np.where(np.array(cats) == gt)[0][0])
                        total_loss += _cross_entropy_row(probs, target_index)
                        has_loss = True
                    except Exception:
                        pass
            row["loss"] = total_loss if has_loss else None
            rows.append(row)
        return pd.DataFrame(rows)

    rows = []
    for pid, prediction in predictions.items():
        gt = patient_to_ground_truth.get(pid)
        cats = cast(Sequence[GroundTruth], categories)
        prediction = np.asarray(prediction)
        pred_idx = int(prediction.argmax())
        row = {
            patient_label: pid,
            ground_truth_label: gt,
            "pred": cats[pred_idx],
            **{
                f"{ground_truth_label}_{category}": float(prediction[i_cat])
                for i_cat, category in enumerate(cats)
            },
            "loss": (
                _cross_entropy_row(
                    prediction, int(np.where(np.array(cats) == gt)[0][0])
                )
                if gt is not None
                else None
            ),
        }
        rows.append(row)
    return pd.DataFrame(rows).sort_values(by="loss")


def _to_regression_prediction_df(
    *,
    patient_to_ground_truth,
    predictions,
    patient_label: PandasLabel,
    ground_truth_label: PandasLabel,
    **kwargs,
) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                patient_label: patient_id,
                ground_truth_label: patient_to_ground_truth.get(patient_id),
                "pred": float(np.asarray(prediction).flatten()[0])
                if np.asarray(prediction).size == 1
                else np.asarray(prediction).tolist(),
                "loss": (
                    float(
                        np.abs(
                            np.asarray(prediction).flatten()[0]
                            - float(ground_truth)
                        )
                    )
                    if (
                        (ground_truth := patient_to_ground_truth.get(patient_id))
                        is not None
                        and str(ground_truth).lower() != "nan"
                        and np.asarray(prediction).size == 1
                    )
                    else None
                ),
            }
            for patient_id, prediction in predictions.items()
        ]
    ).sort_values(by="loss", na_position="last")


def _to_survival_prediction_df(
    *,
    patient_to_ground_truth: Mapping[
        PatientId, GroundTruth | SurvivalGroundTruth | None
    ],
    predictions,
    patient_label: PandasLabel,
    time_label: PandasLabel = "time",
    status_label: PandasLabel = "event",
    cut_off: float | None = None,
    **kwargs,
) -> pd.DataFrame:
    rows: list[dict] = []
    for patient_id, pred in predictions.items():
        pred = np.asarray(pred).flatten()
        gt = patient_to_ground_truth.get(patient_id)
        row: dict = {patient_label: patient_id}
        if pred.size == 1:
            row["pred_score"] = float(pred[0])
        else:
            row["pred_score"] = pred.tolist()
        if isinstance(gt, (tuple, list)) and len(gt) == 2:
            row[time_label], row[status_label] = gt
        else:
            row[time_label], row[status_label] = None, None
        rows.append(row)

    df = pd.DataFrame(rows)
    if cut_off is not None:
        df[f"cut_off={cut_off}"] = None
    return df
