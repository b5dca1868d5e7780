"""Task wrappers around the flax backbones.

These are the functional equivalent of the reference's Lightning wrappers
(src/stamp/modeling/models/__init__.py): they own the hyper-parameter record
stored in checkpoints, the per-task loss/metric definitions, and the optimizer
configuration.  Unlike Lightning modules they hold no mutable training state —
the training engine (stamp_tpu/modeling/train.py) threads flax variables and
optax state through jitted steps.

Loss semantics replicated exactly:
  * classification — weighted soft-target cross-entropy, masked-out patients
    (all-zero one-hot) contribute zero (models/__init__.py:254-258)
  * regression — L1 (models/__init__.py:420-422)
  * survival — Efron-tied Cox NPLL at tile level (models/__init__.py:766),
    max-shift Breslow at slide level (models/__init__.py:626-659);
    ``train_pred_median`` tracked as the deploy cut-off
  * multi-target — sum of per-target weighted CEs (barspoon.py:285-292)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any, ClassVar

import jax
import jax.numpy as jnp
import numpy as np
import optax
from packaging.version import Version

import stamp_tpu
from stamp_tpu.modeling.checkpoint import check_version_compatibility
from stamp_tpu.ops.cox import cox_loss_breslow, neg_partial_log_likelihood


def weighted_cross_entropy(
    logits: jax.Array,  # [B, C]
    targets: jax.Array,  # [B, C] soft / one-hot
    weights: jax.Array | None,  # [C]
) -> jax.Array:
    """torch ``F.cross_entropy`` with probability targets + class weights:
    mean over batch of −Σ_c w_c·t_c·log p_c."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if weights is not None:
        logp = logp * weights[None, :]
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def _filter_model_params(model_class, metadata: dict) -> dict:
    keys = getattr(model_class, "model_params_keys", lambda: [])()
    return {k: v for k, v in metadata.items() if k in keys}


class TaskModel:
    """Base wrapper: hparams record, version gate, optimizer factory."""

    supported_features: ClassVar[list[str]] = []
    task_name: ClassVar[str] = ""
    uses_coords: ClassVar[bool] = False
    monitor: ClassVar[tuple[str, str]] = ("validation_loss", "min")

    def __init__(
        self,
        *,
        model_class,
        dim_input: int,
        total_steps: int = 512,
        max_lr: float = 1e-4,
        div_factor: float = 25.0,
        train_patients: Sequence[str] = (),
        valid_patients: Sequence[str] = (),
        stamp_version: str | Version | None = None,
        **metadata: Any,
    ) -> None:
        stamp_version = stamp_version or stamp_tpu.__version__
        check_version_compatibility(stamp_version)

        self.model_class = model_class
        self.total_steps = int(total_steps)
        self.max_lr = float(max_lr)
        self.div_factor = float(div_factor)
        self.train_patients = list(train_patients)
        self.valid_patients = list(valid_patients)
        self.stamp_version = str(stamp_version)
        self.metadata = metadata

        self.hparams: dict[str, Any] = {
            "task": self.task_name,
            "supported_features": self.supported_features[0],
            "dim_input": int(dim_input),
            "total_steps": self.total_steps,
            "max_lr": self.max_lr,
            "div_factor": self.div_factor,
            "train_patients": self.train_patients,
            "valid_patients": self.valid_patients,
            "stamp_version": self.stamp_version,
            **{k: v for k, v in metadata.items()},
        }
        self.dim_input = int(dim_input)
        self.module = self._build_module()
        self.uses_coords = bool(getattr(self.module, "supports_coords", False))

    # ---- model construction -------------------------------------------------

    @property
    def dim_output(self) -> int:
        return 1

    def _build_module(self):
        params = _filter_model_params(self.model_class, self.metadata)
        return self.model_class(
            dim_input=self.dim_input, dim_output=self.dim_output, **params
        )

    def init_variables(self, rng: jax.Array, example_batch) -> Any:
        args, kwargs = self.forward_args(example_batch, train=False)
        return self.module.init({"params": rng, "dropout": rng}, *args, **kwargs)

    # ---- forward plumbing ---------------------------------------------------

    def forward_args(self, batch, *, train: bool, key_mask=None):
        """Maps a host batch to (args, kwargs) for module.apply."""
        if len(batch) == 4:  # tile level: bags, coords, sizes, targets
            bags, coords, _sizes, _t = batch
            if self.uses_coords:
                return (bags,), dict(coords=coords, key_mask=key_mask, train=train)
            return (bags,), dict(train=train)
        else:  # slide/patient level: feats, targets
            feats, _t = batch
            return (feats,), dict(train=train)

    def apply(
        self,
        variables,
        batch,
        *,
        train: bool,
        rngs=None,
        key_mask=None,
        mutable=False,
    ):
        args, kwargs = self.forward_args(batch, train=train, key_mask=key_mask)
        if mutable:
            return self.module.apply(
                variables, *args, **kwargs, rngs=rngs, mutable=["alibi_stats"]
            )
        return self.module.apply(variables, *args, **kwargs, rngs=rngs)

    # ---- task-specific hooks ------------------------------------------------

    def loss(self, outputs, batch) -> jax.Array:
        raise NotImplementedError

    def predict(self, variables, batch, *, key_mask=None):
        """Raw model outputs for a batch (post-processing happens in deploy)."""
        out = self.apply(variables, batch, train=False, key_mask=key_mask)
        return out

    def lr_schedule(self) -> optax.Schedule:
        """The learning-rate schedule the optimizer runs on.

        Single source of truth: ``make_optimizer`` consumes it and the train
        loop reads it back for per-epoch LR logging, so the logged value can
        never drift from what the optimizer applies.
        """
        return optax.cosine_onecycle_schedule(
            transition_steps=max(self.total_steps, 1),
            peak_value=self.max_lr,
            pct_start=0.3,
            div_factor=self.div_factor,
            final_div_factor=1e4,
        )

    def make_optimizer(self) -> optax.GradientTransformation:
        """AdamW + OneCycle (reference models/__init__.py:133-141)."""
        return optax.adamw(
            self.lr_schedule(), b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2
        )

    def validation_metrics(
        self, outputs: list[np.ndarray], targets: list[np.ndarray]
    ) -> dict[str, float]:
        raise NotImplementedError

    # ---- checkpointing ------------------------------------------------------

    def checkpoint_hparams(self) -> dict[str, Any]:
        return dict(self.hparams, model_class=None)


# ---------------------------------------------------------------------------
# Classification
# ---------------------------------------------------------------------------


class LitBaseClassifier(TaskModel):
    task_name = "classification"

    def __init__(
        self,
        *,
        model_class,
        ground_truth_label,
        categories: Sequence[str],
        category_weights,
        dim_input: int,
        **kwargs: Any,
    ) -> None:
        categories = list(categories)
        category_weights = np.asarray(category_weights, dtype=np.float32)
        if len(categories) != len(category_weights):
            raise ValueError(
                "the number of category weights has to match the number of categories!"
            )
        self.categories = categories
        self.class_weights = category_weights
        self.ground_truth_label = ground_truth_label
        self._n_outputs = len(categories)
        super().__init__(
            model_class=model_class,
            dim_input=dim_input,
            ground_truth_label=ground_truth_label,
            categories=categories,
            category_weights=category_weights,
            **kwargs,
        )

    @property
    def dim_output(self) -> int:
        return self._n_outputs

    def loss(self, outputs, batch) -> jax.Array:
        targets = batch[-1]
        return weighted_cross_entropy(
            outputs, targets, jnp.asarray(self.class_weights)
        )

    def validation_metrics(self, outputs, targets) -> dict[str, float]:
        from sklearn.metrics import roc_auc_score

        logits = np.concatenate(outputs)
        t = np.concatenate(targets)
        # per-batch CE, averaged — mirrors Lightning's epoch mean over batch-1 steps
        logp = logits - _np_logsumexp(logits)
        w = self.class_weights
        losses = -np.sum(t * logp * w[None, :], axis=-1)
        metrics = {"validation_loss": float(np.mean(losses))}
        try:
            y_true = t.argmax(axis=-1)
            probs = np.exp(logp)
            if len(np.unique(y_true)) > 1:
                if probs.shape[1] == 2:
                    auroc = roc_auc_score(y_true, probs[:, 1])
                else:
                    auroc = roc_auc_score(
                        y_true, probs, multi_class="ovr", average="macro"
                    )
                metrics["validation_auroc"] = float(auroc)
        except Exception:
            pass
        return metrics


def _np_logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


class LitTileClassifier(LitBaseClassifier):
    supported_features = ["tile"]


class LitSlideClassifier(LitBaseClassifier):
    supported_features = ["slide"]


class LitPatientClassifier(LitSlideClassifier):
    supported_features = ["patient"]


# ---------------------------------------------------------------------------
# Regression
# ---------------------------------------------------------------------------


class LitBaseRegressor(TaskModel):
    task_name = "regression"

    def __init__(
        self,
        *,
        model_class,
        dim_input: int,
        ground_truth_label=None,
        **kwargs: Any,
    ) -> None:
        self.ground_truth_label = ground_truth_label
        super().__init__(
            model_class=model_class,
            dim_input=dim_input,
            ground_truth_label=ground_truth_label,
            **kwargs,
        )

    def loss(self, outputs, batch) -> jax.Array:
        targets = batch[-1]
        return jnp.mean(jnp.abs(outputs - targets))

    def validation_metrics(self, outputs, targets) -> dict[str, float]:
        p = np.concatenate(outputs).reshape(-1)
        t = np.concatenate(targets).reshape(-1)
        return {"validation_loss": float(np.mean(np.abs(p - t)))}


class LitTileRegressor(LitBaseRegressor):
    supported_features = ["tile"]


class LitSlideRegressor(LitBaseRegressor):
    supported_features = ["slide"]


class LitPatientRegressor(LitSlideRegressor):
    supported_features = ["patient"]


# ---------------------------------------------------------------------------
# Survival
# ---------------------------------------------------------------------------


class LitSurvivalBase(TaskModel):
    task_name = "survival"
    monitor = ("val_cindex", "max")

    def __init__(
        self,
        *,
        model_class,
        dim_input: int,
        time_label: str,
        status_label: str,
        method: str = "cox",
        **kwargs: Any,
    ) -> None:
        self.time_label = time_label
        self.status_label = status_label
        self.method = method
        self.train_pred_median: float | None = kwargs.pop("train_pred_median", None)
        super().__init__(
            model_class=model_class,
            dim_input=dim_input,
            time_label=time_label,
            status_label=status_label,
            **kwargs,
        )
        if self.train_pred_median is not None:
            self.hparams["train_pred_median"] = self.train_pred_median

    def validation_metrics(self, outputs, targets) -> dict[str, float]:
        from stamp_tpu.statistics.survival_util import concordance_index

        scores = np.concatenate(outputs).reshape(-1)
        y = np.concatenate(targets)
        times, events = y[:, 0], y[:, 1]
        valid = ~(np.isnan(times) | np.isnan(events) | np.isnan(scores))
        metrics: dict[str, float] = {}
        if valid.sum() > 1 and events[valid].sum() > 0:
            try:
                # higher risk = shorter survival → negate (models/__init__.py:686-694)
                ci = concordance_index(
                    times[valid], -scores[valid], events[valid].astype(int)
                )
                metrics["val_cindex"] = float(ci)
            except ZeroDivisionError:
                pass
            # Breslow validation loss (models/__init__.py:707-711)
            metrics["val_cox_loss"] = float(
                np.asarray(
                    cox_loss_breslow(
                        jnp.asarray(scores[valid]),
                        jnp.asarray(times[valid]),
                        jnp.asarray(events[valid]),
                    )
                )
            )
        if "val_cindex" not in metrics:
            metrics["val_cindex"] = float("nan")
        return metrics


class LitTileSurvival(LitSurvivalBase):
    supported_features = ["tile"]

    def loss(self, outputs, batch) -> jax.Array:
        targets = batch[-1]
        preds = outputs.reshape(-1)
        return neg_partial_log_likelihood(preds, targets[:, 0], targets[:, 1])


class LitSlideSurvival(LitSurvivalBase):
    supported_features = ["slide"]

    def loss(self, outputs, batch) -> jax.Array:
        targets = batch[-1]
        preds = outputs.reshape(-1)
        return cox_loss_breslow(preds, targets[:, 0], targets[:, 1])


class LitPatientSurvival(LitSlideSurvival):
    supported_features = ["patient"]


# ---------------------------------------------------------------------------
# Multi-target classification (barspoon)
# ---------------------------------------------------------------------------


class LitEncDecTransformer(TaskModel):
    """Reference models/__init__.py:857-937 + barspoon.py:208-348."""

    supported_features = ["tile"]
    task_name = "classification"

    def __init__(
        self,
        *,
        dim_input: int,
        category_weights: Mapping[str, Any],
        model_class=None,
        ground_truth_label=None,
        categories: Mapping[str, Sequence[str]],
        d_model: int = 512,
        num_encoder_heads: int = 8,
        num_decoder_heads: int = 8,
        num_encoder_layers: int = 2,
        num_decoder_layers: int = 2,
        dim_feedforward: int = 2048,
        positional_encoding: bool = True,
        learning_rate: float = 1e-4,
        **kwargs: Any,
    ) -> None:
        from stamp_tpu.models.barspoon import EncDecTransformer

        if not isinstance(categories, Mapping):
            raise ValueError(
                "Multi-target classification requires categories as "
                "Mapping[str, Sequence[str]]."
            )
        self.weights = {
            k: np.asarray(v, dtype=np.float32) for k, v in category_weights.items()
        }
        normalized_categories = {str(k): list(v) for k, v in categories.items()}
        for t, w in self.weights.items():
            if t not in normalized_categories:
                raise ValueError(f"Missing categories for target '{t}'")
            if len(normalized_categories[t]) != len(w):
                raise ValueError(
                    f"Category mismatch for target '{t}': "
                    f"{len(normalized_categories[t])} categories "
                    f"but head has {len(w)} outputs."
                )
        self.categories = normalized_categories
        self.ground_truth_label = ground_truth_label
        self.learning_rate = learning_rate
        self._barspoon_params = dict(
            d_model=d_model,
            num_encoder_heads=num_encoder_heads,
            num_decoder_heads=num_decoder_heads,
            num_encoder_layers=num_encoder_layers,
            num_decoder_layers=num_decoder_layers,
            dim_feedforward=dim_feedforward,
            positional_encoding=positional_encoding,
        )

        super().__init__(
            model_class=model_class or EncDecTransformer,
            dim_input=dim_input,
            ground_truth_label=ground_truth_label,
            categories=normalized_categories,
            category_weights={k: v for k, v in self.weights.items()},
            learning_rate=learning_rate,
            **self._barspoon_params,
            **kwargs,
        )
        self.hparams["model_name"] = self.hparams.get("model_name", "barspoon")

    def _build_module(self):
        from stamp_tpu.models.barspoon import EncDecTransformer

        return EncDecTransformer(
            dim_input=self.dim_input,
            target_n_outs=tuple((t, len(w)) for t, w in self.weights.items()),
            **self._barspoon_params,
        )

    def lr_schedule(self) -> optax.Schedule:
        return optax.constant_schedule(self.learning_rate)

    def make_optimizer(self) -> optax.GradientTransformation:
        # reference barspoon.py:346-348 — plain Adam
        return optax.adam(self.lr_schedule())

    def loss(self, outputs, batch) -> jax.Array:
        targets = batch[-1]
        total = 0.0
        for target_label, weight in self.weights.items():
            total = total + weighted_cross_entropy(
                outputs[target_label],
                targets[target_label],
                jnp.asarray(weight),
            )
        return total

    def predict(self, variables, batch, *, key_mask=None):
        out = self.apply(variables, batch, train=False, key_mask=key_mask)
        # predict_step softmaxes (barspoon.py:333-344)
        return {k: jax.nn.softmax(v, axis=-1) for k, v in out.items()}

    def validation_metrics(self, outputs, targets) -> dict[str, float]:
        # outputs: list of dict[target → np [b, c]]
        per_target_logits: dict[str, list[np.ndarray]] = {}
        per_target_targets: dict[str, list[np.ndarray]] = {}
        for out, tgt in zip(outputs, targets):
            for k in out:
                per_target_logits.setdefault(k, []).append(np.asarray(out[k]))
                per_target_targets.setdefault(k, []).append(np.asarray(tgt[k]))
        total_loss = 0.0
        for k in per_target_logits:
            logits = np.concatenate(per_target_logits[k])
            t = np.concatenate(per_target_targets[k])
            logp = logits - _np_logsumexp(logits)
            w = self.weights[k]
            total_loss += float(np.mean(-np.sum(t * logp * w[None, :], axis=-1)))
        return {"validation_loss": total_loss}


def instantiate_from_hparams(hparams: dict[str, Any]) -> TaskModel:
    """Re-create a task wrapper from checkpoint hyper-parameters
    (deploy path, reference deploy.py:49-58)."""
    from stamp_tpu.modeling.registry import ModelName, load_model_class

    task = hparams["task"]
    feature_type = hparams["supported_features"]
    model_name = ModelName(hparams["model_name"])
    LitModelClass, ModelClass = load_model_class(task, feature_type, model_name)
    kwargs = {
        k: v
        for k, v in hparams.items()
        if k not in ("task", "supported_features", "model_name", "model_class")
    }
    tm = LitModelClass(model_class=ModelClass, **kwargs)
    tm.hparams["model_name"] = str(model_name)
    return tm
