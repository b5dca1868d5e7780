"""Training engine and workflows.

Workflow parity with reference src/stamp/modeling/train.py: stratified 75/25
split (sklearn ``random_state=0`` — kept on sklearn so fold identity matches
the reference exactly), class-weight computation with under-population
warnings, default model selection (vit for tiles / mlp otherwise), AdamW +
OneCycle, early stopping + best-checkpoint on a task-dependent monitor
(``val_cindex``↑ for survival, ``validation_loss``↓ otherwise), CSV metrics
log, best checkpoint copied to ``model.ckpt``.

Engine design (TPU-first): one jitted train step over static ``[B, bag, F]``
shapes; full-bag validation is bucket-padded with a ``key_mask`` for models
that support masked attention (numerically identical to unpadded eval — see
stamp_tpu/ops/attention.py), or run at exact shapes otherwise.  Batches are
host-built numpy and moved with ``jax.device_put`` so the step stays compiled.
"""

from __future__ import annotations

import csv
import logging
import math
import shutil
from collections.abc import Callable, Mapping, Sequence
from functools import partial
from pathlib import Path
from typing import Any, cast

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.model_selection import train_test_split

from stamp_tpu.modeling.checkpoint import save_checkpoint
from stamp_tpu.modeling.config import AdvancedConfig, TrainConfig
from stamp_tpu.modeling.data import (
    BagDataset,
    BatchIterator,
    PatientData,
    PatientFeatureDataset,
    _parse_survival_status,
    create_dataset,
    load_patient_data_,
)
from stamp_tpu.modeling.registry import ModelName, load_model_class
from stamp_tpu.modeling.tasks import TaskModel
from stamp_tpu.modeling.transforms import VaryPrecisionTransform
from stamp_tpu.types import Category, PandasLabel, PatientId, Task
from stamp_tpu.utils import profiling
from stamp_tpu.utils.seed import Seed

_logger = logging.getLogger("stamp")


# ---------------------------------------------------------------------------
# Workflow entry point
# ---------------------------------------------------------------------------


def train_categorical_model_(*, config: TrainConfig, advanced: AdvancedConfig) -> None:
    """Reference train.py:45-99."""
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

    model, train_dl, valid_dl = setup_model_for_training(
        patient_to_data=patient_to_data,
        categories=config.categories,
        task=config.task,
        advanced=advanced,
        ground_truth_label=config.ground_truth_label,
        time_label=config.time_label,
        status_label=config.status_label,
        clini_table=config.clini_table,
        slide_table=config.slide_table,
        feature_dir=config.feature_dir,
        train_transform=(
            VaryPrecisionTransform(min_fraction_bits=1)
            if config.use_vary_precision_transform
            else None
        ),
        feature_type=feature_type,
    )
    train_model_(
        output_dir=config.output_dir,
        model=model,
        train_dl=train_dl,
        valid_dl=valid_dl,
        max_epochs=advanced.max_epochs,
        patience=advanced.patience,
        accelerator=advanced.accelerator,
        pad_train_buckets=advanced.bag_size is None,
        mesh_shape=advanced.mesh_shape,
    )


# ---------------------------------------------------------------------------
# Setup helpers (reference train.py:102-501)
# ---------------------------------------------------------------------------


def setup_dataloaders_for_training(
    *,
    patient_to_data: Mapping[PatientId, PatientData],
    task: Task,
    categories: Sequence[Category] | None,
    bag_size: int | None,
    batch_size: int,
    num_workers: int,
    train_transform: Callable | None,
    feature_type: str,
) -> tuple[
    BatchIterator,
    BatchIterator,
    Sequence[Category] | Mapping[str, Sequence[Category]],
    int,
    Sequence[PatientId],
    Sequence[PatientId],
]:
    """Stratified split + train/valid iterators (reference train.py:354-501)."""
    ground_truths = [
        patient_data.ground_truth
        for patient_data in patient_to_data.values()
        if patient_data.ground_truth is not None
    ]

    _logger.info(f"Task: {feature_type} {task}")

    if len(ground_truths) != len(patient_to_data):
        raise ValueError(
            "patient_to_data must have a ground truth defined for all targets!"
        )
    if task != "classification" and any(isinstance(gt, dict) for gt in ground_truths):
        raise ValueError(
            "Multi-target ground truths are only supported for classification tasks"
        )

    if task == "classification":
        if ground_truths and isinstance(ground_truths[0], dict):
            first_key = list(ground_truths[0].keys())[0]
            stratify: Any = [cast(dict, gt)[first_key] for gt in ground_truths]
        else:
            stratify = ground_truths
    elif task == "survival":
        statuses: list[int] = []
        for gt in ground_truths:
            if isinstance(gt, (tuple, list)) and len(gt) == 2:
                status_val = gt[1]
                if status_val is None:
                    raise ValueError(
                        "Missing survival status for a patient; cannot stratify"
                    )
                statuses.append(int(status_val))
            else:
                parts = str(gt).split()
                status_token = parts[1] if len(parts) >= 2 else parts[0]
                parsed_status = _parse_survival_status(status_token)
                if parsed_status is None:
                    raise ValueError(
                        "Unrecognized survival status token for stratification: "
                        f"{status_token!r}"
                    )
                statuses.append(int(parsed_status))
        stratify = statuses
    else:
        stratify = None

    train_patients, valid_patients = cast(
        tuple[Sequence[PatientId], Sequence[PatientId]],
        train_test_split(
            list(patient_to_data), stratify=stratify, shuffle=True, random_state=0
        ),
    )

    train_ds, train_categories = create_dataset(
        feature_type=feature_type,
        task=task,
        patient_data=[patient_to_data[pid] for pid in train_patients],
        bag_size=bag_size,
        shuffle=True,
        transform=train_transform,
        categories=categories,
    )
    valid_ds, _ = create_dataset(
        feature_type=feature_type,
        task=task,
        patient_data=[patient_to_data[pid] for pid in valid_patients],
        bag_size=None,
        shuffle=False,
        transform=None,
        categories=train_categories,
    )

    if bag_size is None:
        # whole-slide training: bags are ragged, so one slide per step;
        # the train loop bucket-pads and masks
        if batch_size != 1:
            _logger.info(
                "bag_size is null (whole-slide training): forcing batch_size=1"
            )
        batch_size = 1
    train_dl = BatchIterator(
        train_ds, batch_size=batch_size, shuffle=True, num_workers=num_workers
    )
    valid_dl = BatchIterator(
        valid_ds, batch_size=1, shuffle=False, num_workers=num_workers
    )

    first = train_ds[0]
    dim_feats = int(first[0].shape[-1])

    return train_dl, valid_dl, train_categories, dim_feats, train_patients, valid_patients


def _compute_class_weights_and_check_categories(
    *,
    train_dl: BatchIterator,
    feature_type: str,
    train_categories: Sequence[str] | Mapping[str, Sequence[str]],
) -> np.ndarray | dict[str, np.ndarray]:
    """Reference train.py:567-621."""
    dataset = train_dl.dataset
    if feature_type == "tile":
        dataset = cast(BagDataset, dataset)
        if isinstance(dataset.ground_truths, list):
            weights_per_target: dict[str, np.ndarray] = {}
            target_keys = dataset.ground_truths[0].keys()
            for key in target_keys:
                stacked = np.stack([gt[key] for gt in dataset.ground_truths], axis=0)
                counts = stacked.sum(axis=0)
                w = counts.sum() / np.maximum(counts, 1e-12)
                weights_per_target[key] = (w / w.sum()).astype(np.float32)
            return weights_per_target
        category_counts = np.asarray(dataset.ground_truths).sum(axis=0)
    else:
        dataset = cast(PatientFeatureDataset, dataset)
        category_counts = np.asarray(dataset.ground_truths).sum(axis=0)

    cat_ratio_reciprocal = category_counts.sum() / category_counts
    category_weights = cat_ratio_reciprocal / cat_ratio_reciprocal.sum()

    if len(train_categories) <= 1:
        raise ValueError(f"not enough categories to train on: {train_categories}")
    elif (category_counts < 16).any():
        underpopulated = {
            category: int(count)
            for category, count in zip(
                train_categories, category_counts.tolist(), strict=True
            )
            if count < 16
        }
        _logger.warning(
            "Some categories do not have enough samples to meaningfully train "
            f"a model: {underpopulated}. You may want to consider removing these "
            "categories; the model will likely overfit on the few samples available."
        )
    return category_weights.astype(np.float32)


def _resolve_model_and_params(
    *,
    task: Task,
    feature_type: str,
    advanced: AdvancedConfig,
    ground_truth_label,
) -> tuple[type[TaskModel], Any, dict]:
    """Model defaulting + validation (reference train.py:153-194)."""
    if advanced.model_name is None:
        advanced.model_name = ModelName.VIT if feature_type == "tile" else ModelName.MLP
        _logger.info(
            f"No model specified, defaulting to '{advanced.model_name.value}' "
            f"for feature type '{feature_type}'"
        )

    if (
        task == "classification"
        and isinstance(ground_truth_label, str)
        and advanced.model_name == ModelName.BARSPOON
    ):
        raise ValueError(
            "Model 'barspoon' requires multi-target classification. "
            "For single-target classification set model_name to 'vit', "
            "'trans_mil', or 'mlp'."
        )

    LitModelClass, ModelClass = load_model_class(task, feature_type, advanced.model_name)

    if feature_type not in LitModelClass.supported_features:
        raise ValueError(
            f"Model '{advanced.model_name.value}' does not support feature type "
            f"'{feature_type}'. Supported types are: {LitModelClass.supported_features}"
        )
    elif feature_type in ("slide", "patient") and advanced.model_name.value.lower() not in {
        "mlp",
        "linear",
    }:
        raise ValueError(
            f"Feature type '{feature_type}' only supports MLP or Linear. "
            f"Got '{advanced.model_name.value}'. Please set model_name='mlp' or 'linear'."
        )

    model_specific_params = (
        advanced.model_params.model_dump().get(advanced.model_name.value) or {}
    )
    return LitModelClass, ModelClass, model_specific_params


def setup_model_from_dataloaders(
    *,
    train_dl: BatchIterator,
    valid_dl: BatchIterator,
    task: Task,
    train_categories: Sequence[Category] | Mapping[str, Sequence[Category]],
    dim_feats: int,
    train_patients: Sequence[PatientId],
    valid_patients: Sequence[PatientId],
    feature_type: str,
    advanced: AdvancedConfig,
    ground_truth_label,
    time_label: PandasLabel | None,
    status_label: PandasLabel | None,
    clini_table: Path,
    slide_table: Path | None,
    feature_dir: Path,
) -> TaskModel:
    """Reference train.py:236-351."""
    del valid_dl
    category_weights: Any = []
    if task == "classification":
        category_weights = _compute_class_weights_and_check_categories(
            train_dl=train_dl,
            feature_type=feature_type,
            train_categories=train_categories,
        )

    LitModelClass, ModelClass, model_specific_params = _resolve_model_and_params(
        task=task,
        feature_type=feature_type,
        advanced=advanced,
        ground_truth_label=ground_truth_label,
    )

    steps_per_epoch = len(train_dl)
    total_steps = steps_per_epoch * advanced.max_epochs

    common_params = {
        "categories": train_categories,
        "category_weights": category_weights,
        "dim_input": dim_feats,
        "total_steps": total_steps,
        "max_lr": advanced.max_lr,
        "div_factor": advanced.div_factor,
        "model_name": advanced.model_name.value,
        "ground_truth_label": ground_truth_label,
        "time_label": time_label,
        "status_label": status_label,
        "train_patients": list(train_patients),
        "valid_patients": list(valid_patients),
        "clini_table": str(clini_table),
        "slide_table": str(slide_table) if slide_table is not None else None,
        "feature_dir": str(feature_dir),
    }
    if task != "classification":
        common_params.pop("categories")
        common_params.pop("category_weights")
    if task != "survival":
        common_params.pop("time_label")
        common_params.pop("status_label")

    all_params = {**common_params, **model_specific_params}
    _logger.info(
        f"Instantiating model '{advanced.model_name.value}' with parameters: "
        f"{model_specific_params}"
    )
    return LitModelClass(model_class=ModelClass, **all_params)


def setup_model_for_training(
    *,
    patient_to_data: Mapping[PatientId, PatientData],
    task: Task,
    categories: Sequence[Category] | None,
    train_transform: Callable | None,
    feature_type: str,
    advanced: AdvancedConfig,
    ground_truth_label,
    time_label: PandasLabel | None,
    status_label: PandasLabel | None,
    clini_table: Path,
    slide_table: Path | None,
    feature_dir: Path,
) -> tuple[TaskModel, BatchIterator, BatchIterator]:
    """Reference train.py:102-233."""
    (
        train_dl,
        valid_dl,
        train_categories,
        dim_feats,
        train_patients,
        valid_patients,
    ) = setup_dataloaders_for_training(
        patient_to_data=patient_to_data,
        task=task,
        categories=categories,
        bag_size=advanced.bag_size,
        batch_size=advanced.batch_size,
        num_workers=advanced.num_workers,
        train_transform=train_transform,
        feature_type=feature_type,
    )

    model = setup_model_from_dataloaders(
        train_dl=train_dl,
        valid_dl=valid_dl,
        task=task,
        train_categories=train_categories,
        dim_feats=dim_feats,
        train_patients=train_patients,
        valid_patients=valid_patients,
        feature_type=feature_type,
        advanced=advanced,
        ground_truth_label=ground_truth_label,
        time_label=time_label,
        status_label=status_label,
        clini_table=clini_table,
        slide_table=slide_table,
        feature_dir=feature_dir,
    )
    return model, train_dl, valid_dl


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------


def _host_array(x) -> np.ndarray:
    """Bring a (possibly multi-process-sharded) array to this host.

    dp-sharded outputs of a multi-process step span non-addressable devices;
    ``process_allgather`` reassembles the global value on every host.
    Single-process (or replicated) arrays convert directly.
    """
    if jax.process_count() > 1 and not getattr(x, "is_fully_addressable", True):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _bucket_size(n: int, *, minimum: int = 512) -> int:
    """Next power-of-two ≥ n (≥ minimum) — bounds recompilation to O(log T)."""
    if n <= minimum:
        return minimum
    return 1 << math.ceil(math.log2(n))


def _pad_tile_batch(batch, bucket: int):
    """Pad a tile batch's tile dim to `bucket`, returning (batch, key_mask)."""
    bags, coords, sizes, targets = batch
    b, t, f = bags.shape
    if t < bucket:
        bags = np.concatenate(
            [bags, np.zeros((b, bucket - t, f), dtype=bags.dtype)], axis=1
        )
        coords = np.concatenate(
            [coords, np.zeros((b, bucket - t, 2), dtype=coords.dtype)], axis=1
        )
    key_mask = (
        np.arange(bucket)[None, :] < np.asarray(sizes)[:, None]
    )
    return (bags, coords, sizes, targets), key_mask


class _EpochLogger:
    """CSV metrics logger, lightning-CSVLogger-compatible directory layout."""

    def __init__(self, output_dir: Path) -> None:
        self.log_dir = output_dir / "lightning_logs" / "version_0"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / "metrics.csv"
        self.rows: list[dict] = []
        self.keys: list[str] = []

    def log(self, row: dict) -> None:
        self.rows.append(row)
        for k in row:
            if k not in self.keys:
                self.keys.append(k)
        with open(self.path, "w", newline="") as fp:
            writer = csv.DictWriter(fp, fieldnames=self.keys)
            writer.writeheader()
            for r in self.rows:
                writer.writerow(r)


def _accelerator_device(accelerator: str | None):
    """Resolve an ``accelerator`` config value to a jax device (or None for
    the default backend).  'cpu' is honored like the reference honors
    Lightning's accelerator; 'auto'/'tpu'/'gpu'/None use the default."""
    if accelerator == "cpu":
        try:
            return jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return None
    return None


def train_model_(
    *,
    output_dir: Path,
    model: TaskModel,
    train_dl: BatchIterator,
    valid_dl: BatchIterator,
    max_epochs: int,
    patience: int,
    accelerator: str | None = None,
    pad_train_buckets: bool = False,
    mesh_shape: Mapping[str, int] | None = None,
) -> tuple[TaskModel, Any]:
    """Trains a model; saves the best checkpoint to ``output_dir/model.ckpt``.

    ``pad_train_buckets`` enables whole-slide training (``bag_size: null``):
    each ragged training bag is padded to a power-of-two bucket and attended
    with a key mask, so the jitted step compiles once per bucket instead of
    once per slide.

    ``mesh_shape`` (``advanced.mesh_shape``) turns on sharded training over
    a device mesh — ``{"dp": …[, "sp": …]}`` on one host, with a leading
    ``"dcn"`` axis across jax.distributed processes.  The batch axis is
    sharded over every non-``sp`` axis and the tiles-per-bag axis over
    ``sp``; XLA inserts the gradient collectives.  The reference cannot do
    this at all (devices=1 FIXME, reference train.py:541-548).

    Returns (task_model, best_variables).
    """
    device = _accelerator_device(accelerator) if mesh_shape is None else None
    if device is not None:
        with jax.default_device(device):
            return _train_model_impl(
                output_dir=output_dir,
                model=model,
                train_dl=train_dl,
                valid_dl=valid_dl,
                max_epochs=max_epochs,
                patience=patience,
                pad_train_buckets=pad_train_buckets,
            )
    return _train_model_impl(
        output_dir=output_dir,
        model=model,
        train_dl=train_dl,
        valid_dl=valid_dl,
        max_epochs=max_epochs,
        patience=patience,
        pad_train_buckets=pad_train_buckets,
        mesh_shape=mesh_shape,
    )


def _train_model_impl(
    *,
    output_dir: Path,
    model: TaskModel,
    train_dl: BatchIterator,
    valid_dl: BatchIterator,
    max_epochs: int,
    patience: int,
    pad_train_buckets: bool = False,
    mesh_shape: Mapping[str, int] | None = None,
) -> tuple[TaskModel, Any]:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    # --- optional device mesh (advanced.mesh_shape) ---
    mesh = None
    shard_train_batch = None
    to_global = None
    if mesh_shape:
        from jax.sharding import PartitionSpec as P

        from stamp_tpu.parallel.distributed import (
            global_batch,
            init_distributed,
            make_global_mesh,
            replicate_global,
            split_local_rows,
        )

        init_distributed()
        if jax.process_count() > 1 and Seed.seed is None:
            raise ValueError(
                "multi-process sharded training needs a fixed advanced.seed "
                "so every process draws identical batches"
            )
        mesh = make_global_mesh(mesh_shape)
        dp_axes = tuple(a for a in mesh.axis_names if a != "sp")
        sp_axis = "sp" if "sp" in mesh.axis_names else None
        dp_total = int(np.prod([mesh.shape[a] for a in dp_axes]))
        sp_total = int(mesh.shape["sp"]) if sp_axis else 1
        _logger.info(
            f"sharded training on mesh {dict(mesh.shape)} "
            f"({jax.process_count()} process(es))"
        )

        def to_global(tree):  # noqa: F811 — replicate eval inputs over the mesh
            return replicate_global(tree, mesh)

        def shard_train_batch(batch, key_mask):  # noqa: F811
            is_tile_batch = len(batch) == 4
            if is_tile_batch:
                bags, coords, sizes, targets = batch
                row_spec = P(dp_axes, sp_axis) if sp_axis else P(dp_axes)
                specs = (
                    row_spec,
                    row_spec,
                    P(dp_axes),
                    jax.tree_util.tree_map(lambda _: P(dp_axes), targets),
                )
            else:
                feats, targets = batch
                specs = (
                    P(dp_axes),
                    jax.tree_util.tree_map(lambda _: P(dp_axes), targets),
                )
            batch = (
                global_batch(split_local_rows(batch), mesh, specs)
                if jax.process_count() > 1
                else global_batch(batch, mesh, specs)
            )
            if key_mask is not None:
                mask_spec = P(dp_axes, sp_axis) if sp_axis else P(dp_axes)
                key_mask = (
                    global_batch(
                        split_local_rows(key_mask), mesh, mask_spec
                    )
                    if jax.process_count() > 1
                    else global_batch(key_mask, mesh, mask_spec)
                )
            return batch, key_mask

    monitor_metric, mode = model.monitor
    sign = 1.0 if mode == "min" else -1.0
    is_tile = model.supported_features[0] == "tile"
    is_survival = model.task_name == "survival"

    # --- init ---
    rng = Seed.jax_key()
    example = next(iter(train_dl))
    variables = model.init_variables(rng, example)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    tx = model.make_optimizer()
    opt_state = tx.init(params)

    if mesh is not None:
        # replicate the (tiny) MIL model + optimizer state over the mesh;
        # XLA turns the dp-sharded batch into gradient collectives
        host = jax.tree_util.tree_map(np.asarray, (params, opt_state, model_state))
        params, opt_state, model_state = (
            replicate_global(host[0], mesh),
            replicate_global(host[1], mesh),
            replicate_global(host[2], mesh),
        )

    module = model.module
    uses_coords = model.uses_coords
    loss_fn_task = model.loss

    is_multitarget = isinstance(getattr(model, "weights", None), dict)

    def apply_model(variables, batch, *, train, rngs, key_mask=None):
        if is_tile:
            bags, coords, _sizes, _t = batch
            kwargs = dict(train=train)
            if uses_coords:
                kwargs.update(coords=coords, key_mask=key_mask)
            out = module.apply(
                variables, bags, **kwargs, rngs=rngs, mutable=["alibi_stats"]
            )
        else:
            feats, _t = batch
            out = module.apply(
                variables, feats, train=train, rngs=rngs, mutable=["alibi_stats"]
            )
        return out  # (outputs, mutated)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, model_state, batch, key_mask, step_rng):
        # key_mask is None (an empty pytree) for fixed-size bags and a
        # [B, bucket] bool array for whole-slide bucket-padded bags
        def loss_fn(p):
            variables = {"params": p, **model_state}
            outputs, mutated = apply_model(
                variables,
                batch,
                train=True,
                rngs={"dropout": step_rng},
                key_mask=key_mask,
            )
            loss = loss_fn_task(outputs, batch)
            return loss, (mutated, outputs)

        (loss, (mutated, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mutated, loss, outputs

    @jax.jit
    def eval_step_padded(params, model_state, bags, coords, key_mask):
        variables = {"params": params, **model_state}
        kwargs: dict = dict(train=False)
        if uses_coords:
            kwargs.update(coords=coords, key_mask=jnp.asarray(key_mask))
        return module.apply(variables, bags, **kwargs)

    @jax.jit
    def eval_step_exact(params, model_state, *inputs):
        variables = {"params": params, **model_state}
        if is_tile:
            bags, coords = inputs
            kwargs = dict(train=False)
            if uses_coords:
                kwargs.update(coords=coords, key_mask=None)
            return module.apply(variables, bags, **kwargs)
        (feats,) = inputs
        return module.apply(variables, feats, train=False)

    # multi-process runs compute identical metrics everywhere (replicated
    # eval) but only the first process touches the filesystem
    is_main_process = jax.process_index() == 0
    logger = _EpochLogger(output_dir) if is_main_process else None
    best_value = math.inf
    best_variables = None
    best_ckpt_path: Path | None = None
    wait = 0
    global_step = 0

    supports_mask = is_tile and bool(getattr(module, "supports_coords", False))
    if pad_train_buckets and not supports_mask:
        raise ValueError(
            "bag_size: null (whole-slide training) requires a mask-capable "
            "tile model (e.g. vit); use a fixed bag_size with "
            f"{type(module).__name__}."
        )

    def _bucketed(batches):
        """Pad ragged whole-slide bags to power-of-two buckets + key masks."""
        for batch in batches:
            bucket = _bucket_size(batch[0].shape[1])
            padded, key_mask = _pad_tile_batch(batch, bucket)
            yield padded, key_mask

    for epoch in range(max_epochs):
        # ---- train ----
        from stamp_tpu.parallel.prefetch import prefetch_to_device

        # the prefetch producer is a separate thread, so the default-device
        # context doesn't reach it — pin transfers to the params' device
        # (single-device path only; sharded params have no single .device)
        feed_device = (
            getattr(jax.tree_util.tree_leaves(params)[0], "device", None)
            if mesh is None
            else None
        )

        train_losses = []
        train_outputs = []
        if mesh is not None:
            # mesh path: per-batch global sharding instead of single-device
            # prefetch; ragged batches are padded to the next dp multiple by
            # cycling their own rows (dropping them instead can drop EVERY
            # batch of a small cohort — one silent nan-loss epoch and an
            # untrained model, observed with 19 train patients on dp=4).
            # The repeated rows double-count in that batch's loss mean —
            # bounded, trailing-batch-only deviation from the reference's
            # exact single-device mean.
            def _pad_rows(tree, n_rows: int, n_target: int):
                idx = np.arange(n_target) % n_rows
                return jax.tree_util.tree_map(
                    lambda x: np.asarray(x)[idx], tree
                )

            def _mesh_feed():
                feed = (
                    _bucketed(train_dl)
                    if pad_train_buckets
                    else ((b, None) for b in train_dl)
                )
                for batch, key_mask in feed:
                    n_rows = batch[0].shape[0]
                    if n_rows % dp_total != 0:
                        n_target = -(-n_rows // dp_total) * dp_total
                        _logger.debug(
                            f"padding ragged batch {n_rows} → {n_target} "
                            f"rows (dp={dp_total}) by cycling rows"
                        )
                        batch = _pad_rows(batch, n_rows, n_target)
                        if key_mask is not None:
                            key_mask = _pad_rows(key_mask, n_rows, n_target)
                    if (
                        sp_axis
                        and len(batch) == 4
                        and batch[0].shape[1] % sp_total != 0
                    ):
                        raise ValueError(
                            f"bag size {batch[0].shape[1]} not divisible by "
                            f"sp={sp_total}; pick a divisible bag_size"
                        )
                    yield shard_train_batch(batch, key_mask)

            train_feed_iter = _mesh_feed()
        else:
            train_feed = (
                _bucketed(train_dl) if pad_train_buckets else train_dl
            )
            train_feed_iter = prefetch_to_device(
                train_feed, size=2, device=feed_device
            )
        for device_batch in train_feed_iter:
            rng, step_rng = jax.random.split(rng)
            with profiling.stage("train/step"):
                if mesh is not None:
                    batch, key_mask = device_batch
                elif pad_train_buckets:
                    batch, key_mask = device_batch
                    key_mask = jnp.asarray(key_mask)
                else:
                    batch, key_mask = device_batch, None
                params, opt_state, mutated, loss, outputs = train_step(
                    params, opt_state, model_state, batch, key_mask, step_rng
                )
                if profiling.timer.enabled:
                    # attribute the device wait to the step, not to whatever
                    # op happens to synchronize later
                    jax.block_until_ready(loss)
            if mutated:
                model_state = mutated
            train_losses.append(loss)
            if is_survival:
                train_outputs.append(_host_array(outputs).reshape(-1))
            global_step += 1

        if not train_losses:
            raise ValueError(
                "training epoch produced zero steps — the dataloader yielded "
                "no usable batches (empty cohort or every batch filtered); "
                "a silent nan-loss epoch would leave the model untrained."
            )
        train_loss = float(np.mean([np.asarray(loss) for loss in train_losses]))

        if is_survival and train_outputs:
            model.train_pred_median = float(np.median(np.concatenate(train_outputs)))
            model.hparams["train_pred_median"] = model.train_pred_median

        # ---- validate ----
        # under a mesh, eval inputs are replicated over all devices (the
        # model is tiny; full-bag eval at batch 1 doesn't split usefully
        # over dp) so every process computes identical metrics and the
        # early-stopping control flow stays in lockstep
        _dev = to_global if mesh is not None else jnp.asarray
        val_outputs: list = []
        val_targets: list = []
        with profiling.stage("train/eval"):
            for batch in valid_dl:
                if is_tile:
                    if supports_mask:
                        bucket = _bucket_size(batch[0].shape[1])
                        (bags, coords, sizes, targets), key_mask = _pad_tile_batch(
                            batch, bucket
                        )
                        out = eval_step_padded(
                            params,
                            model_state,
                            _dev(bags),
                            _dev(coords),
                            _dev(key_mask),
                        )
                    else:
                        bags, coords, sizes, targets = batch
                        out = eval_step_exact(
                            params, model_state, _dev(bags), _dev(coords)
                        )
                else:
                    feats, targets = batch
                    out = eval_step_exact(params, model_state, _dev(feats))
                if is_multitarget:
                    val_outputs.append({k: np.asarray(v) for k, v in out.items()})
                else:
                    val_outputs.append(np.asarray(out))
                val_targets.append(targets)

        metrics = model.validation_metrics(val_outputs, val_targets)
        metrics["training_loss"] = train_loss
        metrics["epoch"] = epoch
        metrics["step"] = global_step
        # reference logs the LR each epoch (models/__init__.py:143-152); read
        # it from the same schedule the optimizer was built on
        metrics["learning_rate"] = float(
            model.lr_schedule()(max(global_step - 1, 0))
        )
        if is_survival and model.train_pred_median is not None:
            metrics["train_pred_median"] = model.train_pred_median
        if logger is not None:
            logger.log(metrics)

        current = metrics.get(monitor_metric, math.nan)
        _logger.info(
            f"epoch {epoch}: "
            + " ".join(
                f"{k}={v:.4f}"
                for k, v in metrics.items()
                if k not in ("epoch", "step") and isinstance(v, float)
            )
        )

        improved = not math.isnan(current) and sign * current < best_value
        if improved:
            best_value = sign * current
            wait = 0
            variables_now = {"params": params, **model_state}
            best_variables = jax.tree_util.tree_map(np.asarray, variables_now)
            ckpt_dir = output_dir / "checkpoints"
            new_ckpt_path = (
                ckpt_dir / f"checkpoint-epoch={epoch:02d}-{monitor_metric}={current:0.3f}.ckpt"
            )
            if is_main_process:
                ckpt_dir.mkdir(exist_ok=True, parents=True)
                if best_ckpt_path is not None and best_ckpt_path.exists():
                    best_ckpt_path.unlink()  # save_top_k=1 semantics
                save_checkpoint(
                    new_ckpt_path,
                    hyper_parameters=model.checkpoint_hparams(),
                    variables=best_variables,
                )
            best_ckpt_path = new_ckpt_path
        else:
            wait += 1
            if wait >= patience:
                _logger.info(f"early stopping at epoch {epoch}")
                break

    if best_ckpt_path is None:
        # no epoch improved (e.g. all-nan monitor): save the final state
        best_variables = jax.tree_util.tree_map(
            np.asarray, {"params": params, **model_state}
        )
        best_ckpt_path = output_dir / "checkpoints" / "checkpoint-final.ckpt"
        if is_main_process:
            save_checkpoint(
                best_ckpt_path,
                hyper_parameters=model.checkpoint_hparams(),
                variables=best_variables,
            )

    if is_main_process:
        shutil.copy(best_ckpt_path, output_dir / "model.ckpt")
    return model, best_variables
