"""Checkpoint format: ``model.ckpt`` carrying hyper-parameters + variables.

Mirrors the metadata contract of the reference's Lightning checkpoints
(src/stamp/modeling/models/__init__.py:60-110): ``hyper_parameters`` includes
task, model_name, supported_features, categories, category_weights,
dim_input, ground_truth / time / status labels, train/valid patient lists,
``stamp_version`` (gated on load: reject <2.5.0 or >installed), and — for
survival models — ``train_pred_median`` (the deploy risk cut-off).

The weights are a flax variable pytree stored as numpy arrays inside a single
pickled dict; the format is versioned via the ``format`` key.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import jax
import numpy as np
from packaging.version import Version

import stamp_tpu

CKPT_FORMAT = "stamp-tpu-ckpt-v1"


def check_version_compatibility(stamp_version: str | Version) -> None:
    """Version gate (reference models/__init__.py:92-105)."""
    v = Version(str(stamp_version))
    if v < Version("2.5.0"):
        raise ValueError(
            f"model has been built with stamp version {v} "
            "which is incompatible with the current version."
        )
    elif v > Version(stamp_tpu.__version__):
        raise ValueError(
            "model has been built with a stamp version newer than the installed "
            f"one ({v} > {stamp_tpu.__version__}). "
            "Please upgrade stamp to a compatible version."
        )


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: Path,
    *,
    hyper_parameters: dict[str, Any],
    variables: Any,
) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "format": CKPT_FORMAT,
        "hyper_parameters": dict(hyper_parameters),
        "variables": _to_numpy(variables),
    }
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fp:
        pickle.dump(payload, fp, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.rename(path)


def load_checkpoint(path: Path | str) -> dict[str, Any]:
    with open(path, "rb") as fp:
        payload = pickle.load(fp)
    if payload.get("format") != CKPT_FORMAT:
        raise ValueError(f"{path} is not a stamp-tpu checkpoint")
    hparams = payload["hyper_parameters"]
    check_version_compatibility(hparams.get("stamp_version", "0.0.0"))
    return payload
