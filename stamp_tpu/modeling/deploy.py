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
    BatchIterator,
    _clini_ground_truths,
    create_dataset,
    detect_feature_type,
    filter_complete_patient_data_,
    load_patient_level_data,
    slide_to_patient_from_slide_table_,
)
from stamp_tpu.modeling.tasks import TaskModel, instantiate_from_hparams
from stamp_tpu.types import (
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
    (reference deploy.py:49-58).

    Accepts both this framework's npz checkpoints and the reference's
    Lightning ``.ckpt``s (converted on the fly — modeling/interop.py), so a
    reference-trained model deploys here unchanged.
    """
    from stamp_tpu.modeling.interop import (
        is_reference_checkpoint,
        load_reference_checkpoint,
    )

    path = Path(path)
    if is_reference_checkpoint(path):
        return load_reference_checkpoint(path)
    payload = load_checkpoint(path)
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


def _agreed(models: Sequence[tuple[TaskModel, Any]], what: str, getter):
    """Every ensemble member must agree on ``what``; returns the shared
    value (the reference's per-attribute consistency checks, collapsed into
    one combinator)."""
    values = [getter(model) for model, _variables in models]
    if len({repr(v) for v in values}) != 1:
        raise RuntimeError(f"{what} differ between ensemble models: {values}")
    return values[0]


def _resolve_label(
    requested, trained, description: str
):
    """Deployment labels default to what the model was trained with; an
    explicit different value is honored but loudly warned about."""
    if requested and requested != trained:
        _logger.warning(
            f"deployment {description} differs from training: "
            f"{requested} vs {trained}"
        )
    return requested or trained


# which feature levels a model trained on level X can consume
_DEPLOYABLE_ON = {
    "tile": {"tile"},
    "slide": {"slide", "patient"},
    "patient": {"slide", "patient"},
}


def _deployment_cohort(
    *,
    feature_type: str,
    task: str,
    clini_table: Path | None,
    slide_table: Path | None,
    feature_dir: Path,
    patient_label: PandasLabel,
    filename_label: PandasLabel,
    ground_truth_label,
    time_label,
    status_label,
    drop_patients_with_missing_ground_truth: bool,
) -> tuple[Mapping[PatientId, Any], Mapping[PatientId, Any]]:
    """Assemble the deployment cohort → (patient_to_data, ground truths).

    Unlike training, the clini table is optional for tile/slide features:
    without it every patient deploys with a ground truth of None (pure
    inference, no loss column)."""
    if feature_type == "patient":
        if slide_table is not None:
            _logger.warning(
                "slide_table is ignored for patient-level features during "
                "deployment."
            )
        if clini_table is None:
            raise ValueError(
                "clini_table is required for patient-level feature deployment."
            )
        patient_to_data = load_patient_level_data(
            task=cast(Any, task),
            clini_table=clini_table,
            feature_dir=feature_dir,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
            time_label=time_label,
            status_label=status_label,
        )
        ground_truths = {pid: p.ground_truth for pid, p in patient_to_data.items()}
        return patient_to_data, ground_truths

    if slide_table is None:
        raise ValueError(
            "Deploying on tile- or slide-level features requires a slide "
            "table mapping feature files to patients."
        )
    slide_to_patient = slide_to_patient_from_slide_table_(
        slide_table_path=slide_table,
        patient_label=patient_label,
        filename_label=filename_label,
        feature_dir=feature_dir,
    )
    if clini_table is None:
        ground_truths = dict.fromkeys(slide_to_patient.values())
    else:
        ground_truths = dict(
            _clini_ground_truths(
                task=cast(Any, task),
                clini_table=clini_table,
                patient_label=patient_label,
                ground_truth_label=ground_truth_label,
                time_label=time_label,
                status_label=status_label,
            )
        )
    patient_to_data = filter_complete_patient_data_(
        patient_to_ground_truth=ground_truths,
        slide_to_patient=slide_to_patient,
        drop_patients_with_missing_ground_truth=drop_patients_with_missing_ground_truth,
    )
    return patient_to_data, ground_truths


def deploy_categorical_model_(
    *,
    checkpoint_paths: Sequence[Path],
    output_dir: Path,
    feature_dir: Path,
    clini_table: Path | None,
    slide_table: Path | None,
    patient_label: PandasLabel,
    filename_label: PandasLabel,
    ground_truth_label: PandasLabel | Sequence[PandasLabel] | None,
    time_label: PandasLabel | None,
    status_label: PandasLabel | None,
    num_workers: int,
    accelerator: str | None = None,
    drop_patients_with_missing_ground_truth: bool = True,
) -> None:
    """Deploy an ensemble of checkpoints on an external cohort (behavior of
    reference deploy.py:61-387): per-model prediction CSVs plus an
    ensemble-mean CSV for classification, with a CRITICAL log if any deploy
    patient was seen during training."""
    del num_workers
    feature_type = detect_feature_type(feature_dir)
    _logger.info(f"Detected feature type: {feature_type}")

    models = [load_model_from_ckpt(p) for p in checkpoint_paths]

    # -- the whole ensemble must describe one consistent predictor --------
    task = _agreed(models, "Tasks", lambda m: m.hparams["task"])
    trained_level = _agreed(
        models, "Feature levels", lambda m: m.hparams["supported_features"]
    )
    if feature_type not in _DEPLOYABLE_ON.get(trained_level, set()):
        raise RuntimeError(
            f"Model trained on {trained_level}-level features cannot be "
            f"deployed on {feature_type}-level features."
        )

    if task == "survival":
        time_label = _resolve_label(
            time_label,
            _agreed(models, "Time labels", lambda m: getattr(m, "time_label", None)),
            "time label",
        )
        status_label = _resolve_label(
            status_label,
            _agreed(
                models, "Status labels", lambda m: getattr(m, "status_label", None)
            ),
            "status label",
        )
    else:
        ground_truth_label = _resolve_label(
            ground_truth_label,
            _agreed(models, "Ground truth labels", lambda m: m.ground_truth_label),
            "ground truth label",
        )

    model_categories = None
    trained_cats: Any = None
    if task == "classification":
        trained_cats = _agreed(models, "Categories", lambda m: m.categories)
        if not isinstance(trained_cats, dict):  # multi-target keeps per-target vocabs
            model_categories = list(cast(Sequence[GroundTruth], trained_cats))

    output_dir.mkdir(exist_ok=True, parents=True)

    patient_to_data, patient_to_ground_truth = _deployment_cohort(
        feature_type=feature_type,
        task=task,
        clini_table=clini_table,
        slide_table=slide_table,
        feature_dir=feature_dir,
        patient_label=patient_label,
        filename_label=filename_label,
        ground_truth_label=ground_truth_label,
        time_label=time_label,
        status_label=status_label,
        drop_patients_with_missing_ground_truth=drop_patients_with_missing_ground_truth,
    )
    patient_ids = list(patient_to_data.keys())

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

    def export_csv(predictions: PredictionsType, filename: str, **extra) -> None:
        if predictions and isinstance(next(iter(predictions.values())), dict):
            # the prediction vectors are ordered by the TRAINING vocabularies
            # — label the columns with those; fall back to inference from the
            # deployment ground truths only when the checkpoint carries none
            targets = list(next(iter(predictions.values())).keys())
            export_cats: Any = _target_vocabularies(
                trained_cats if isinstance(trained_cats, dict) else None,
                targets,
                patient_to_ground_truth,
            )
        elif task == "classification":
            export_cats = trained_cats
        else:
            export_cats = []
        df_builder(
            categories=export_cats,
            patient_to_ground_truth=patient_to_ground_truth,
            predictions=predictions,
            patient_label=patient_label,
            ground_truth_label=ground_truth_label,
            time_label=time_label,
            status_label=status_label,
            **extra,
        ).to_csv(output_dir / filename, index=False)

    deploy_set = set(patient_ids)
    all_predictions: list[PredictionsType] = []
    for index, (model, variables) in enumerate(models):
        seen_in_training = set(getattr(model, "train_patients", ())).union(
            getattr(model, "valid_patients", ())
        )
        if leaked := sorted(seen_in_training & deploy_set):
            _logger.critical(
                "DATA LEAKAGE DETECTED: %d patient(s) in deployment set were used "
                "during training/validation. Overlapping IDs: %s",
                len(leaked),
                leaked,
            )

        predictions = _predict(
            model=model,
            variables=variables,
            test_dl=test_dl,
            patient_ids=patient_ids,
            accelerator=accelerator,
        )
        all_predictions.append(predictions)
        export_csv(
            predictions,
            f"patient-preds-{index}.csv" if len(models) > 1 else "patient-preds.csv",
            cut_off=model.hparams.get("train_pred_median", None),
        )

    if task == "classification":
        # ensemble mean over models, per patient (and per target if multi)
        def mean_of(per_model: list) -> Any:
            if isinstance(per_model[0], dict):
                return {
                    t: np.mean([p[t] for p in per_model], axis=0)
                    for t in per_model[0]
                }
            return np.mean(per_model, axis=0)

        ensembled = {
            pid: mean_of([preds[pid] for preds in all_predictions])
            for pid in patient_ids
        }
        export_csv(ensembled, "patient-preds_95_confidence_interval.csv")


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


def _target_vocabularies(
    categories, targets: Sequence[str], patient_to_ground_truth
) -> dict[str, list]:
    """Per-target category lists: from the models when available, otherwise
    inferred from the observed deployment ground truths."""
    if isinstance(categories, dict):
        vocab = {t: list(v) for t, v in categories.items()}
    elif isinstance(categories, Sequence) and len(categories) >= len(targets):
        vocab = {
            t: list(cats)
            for t, cats in zip(targets, categories)
            if isinstance(cats, (list, tuple))
        }
    else:
        vocab = {}

    if unknown := [t for t in targets if t not in vocab]:
        dict_gts = [
            gt for gt in patient_to_ground_truth.values() if isinstance(gt, dict)
        ]
        vocab.update({
            t: sorted({gt[t] for gt in dict_gts if gt.get(t) is not None})
            for t in unknown
        })
    return vocab


def _multitarget_prediction_df(
    *,
    categories,
    patient_to_ground_truth,
    predictions,
    patient_label: PandasLabel,
) -> pd.DataFrame:
    """Column layout: patient, one ground-truth column per target, then per
    target ``pred_{t}`` + one probability column per category, then the
    summed cross-entropy ``loss`` over targets with a known ground truth."""
    targets = list(next(iter(predictions.values())).keys())
    vocab = _target_vocabularies(categories, targets, patient_to_ground_truth)

    rows = []
    for pid, pred in predictions.items():
        raw_gt = patient_to_ground_truth.get(pid)
        gt: dict = raw_gt if isinstance(raw_gt, dict) else {}
        gt_columns = {
            t: (gt.get(t) if isinstance(raw_gt, dict) else raw_gt) for t in targets
        }
        row: dict = {patient_label: pid, **gt_columns}

        loss: float | None = None
        for t in targets:
            probs = np.asarray(pred[t])
            cats = vocab.get(t, [])
            if probs.size == 1:
                row[f"pred_{t}"] = float(probs.item())
            else:
                winner = int(probs.argmax())
                row[f"pred_{t}"] = cats[winner] if winner < len(cats) else winner
            row.update({
                f"{t}_{c}": float(probs[j]) if j < probs.shape[0] else None
                for j, c in enumerate(cats)
            })
            if (value := gt.get(t)) is not None and value in cats:
                loss = (loss or 0.0) + _cross_entropy_row(
                    probs, cats.index(value)
                )
        row["loss"] = loss
        rows.append(row)
    return pd.DataFrame(rows)


def _to_prediction_df(
    *,
    categories,
    patient_to_ground_truth,
    predictions,
    patient_label: PandasLabel,
    ground_truth_label,
    **kwargs,
) -> pd.DataFrame:
    """Classification CSV contract: patient, ground truth, argmax ``pred``,
    one ``{gt_label}_{category}`` probability column per category, and the
    per-patient cross-entropy ``loss`` (rows sorted by it)."""
    if isinstance(next(iter(predictions.values())), dict):
        return _multitarget_prediction_df(
            categories=categories,
            patient_to_ground_truth=patient_to_ground_truth,
            predictions=predictions,
            patient_label=patient_label,
        )

    cats = list(cast(Sequence[GroundTruth], categories))
    pids = list(predictions)
    probs = np.stack([np.asarray(predictions[pid]) for pid in pids])
    gts = [patient_to_ground_truth.get(pid) for pid in pids]

    table = pd.DataFrame({patient_label: pids, ground_truth_label: gts})
    table["pred"] = [cats[i] for i in probs.argmax(axis=1)]
    for j, category in enumerate(cats):
        table[f"{ground_truth_label}_{category}"] = probs[:, j].astype(float)
    table["loss"] = [
        _cross_entropy_row(probs[i], cats.index(gt)) if gt is not None else None
        for i, gt in enumerate(gts)
    ]
    return table.sort_values(by="loss")


def _to_regression_prediction_df(
    *,
    patient_to_ground_truth,
    predictions,
    patient_label: PandasLabel,
    ground_truth_label: PandasLabel,
    **kwargs,
) -> pd.DataFrame:
    """Regression CSV contract: patient, ground truth, ``pred``, absolute
    error ``loss`` (None when the ground truth is missing), sorted by loss."""
    rows = []
    for pid, pred in predictions.items():
        pred = np.asarray(pred).ravel()
        gt = patient_to_ground_truth.get(pid)
        scalar = pred.size == 1
        has_gt = gt is not None and str(gt).lower() != "nan"
        rows.append({
            patient_label: pid,
            ground_truth_label: gt,
            "pred": float(pred[0]) if scalar else pred.tolist(),
            "loss": abs(float(pred[0]) - float(gt)) if scalar and has_gt else None,
        })
    return pd.DataFrame(rows).sort_values(by="loss", na_position="last")


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
    """Survival CSV contract: patient, ``pred_score`` risk, the (time,
    event) ground truth, and — when the model stored a training-median
    cut-off — an empty ``cut_off=<value>`` column whose *header* carries the
    KM-split threshold downstream statistics reads."""
    rows = []
    for pid, pred in predictions.items():
        pred = np.asarray(pred).ravel()
        gt = patient_to_ground_truth.get(pid)
        known = isinstance(gt, (tuple, list)) and len(gt) == 2
        time, status = gt if known else (None, None)
        rows.append({
            patient_label: pid,
            "pred_score": float(pred[0]) if pred.size == 1 else pred.tolist(),
            time_label: time,
            status_label: status,
        })

    table = pd.DataFrame(rows)
    if cut_off is not None:
        table[f"cut_off={cut_off}"] = None
    return table
