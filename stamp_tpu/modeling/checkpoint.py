"""Checkpoint format: ``model.ckpt`` carrying hyper-parameters + variables.

Mirrors the metadata contract of the reference's Lightning checkpoints
(src/stamp/modeling/models/__init__.py:60-110): ``hyper_parameters`` includes
task, model_name, supported_features, categories, category_weights,
dim_input, ground_truth / time / status labels, train/valid patient lists,
``stamp_version`` (gated on load: reject <2.5.0 or >installed), and — for
survival models — ``train_pred_median`` (the deploy risk cut-off).

Container: a plain ``.npz`` archive — never pickle.  The flax variable
pytree is flattened to one array entry per leaf (key = JSON-encoded dict
path), hyper-parameters are a JSON document, and loading uses
``allow_pickle=False`` so a checkpoint can never execute code.  Legacy
pickle checkpoints are rejected with an explicit error.
"""

from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
from packaging.version import Version

import stamp_tpu

CKPT_FORMAT = "stamp-tpu-ckpt-v2"

_HEADER_KEY = "__stamp_header__"
_VAR_PREFIX = "var:"


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


def _jsonify(obj: Any) -> Any:
    """Hyper-parameters → JSON-safe (numpy scalars/arrays, paths, tuples)."""
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return _jsonify(obj.tolist())
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, Path):
        return str(obj)
    return obj


def _flatten(tree: Any, prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], Any]:
    if isinstance(tree, dict):
        out: dict[tuple[str, ...], Any] = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
        return out
    return {prefix: tree}


def _unflatten(flat: dict[tuple[str, ...], np.ndarray]) -> Any:
    root: dict = {}
    for path, value in flat.items():
        node = root
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
    return root


def save_checkpoint(
    path: Path,
    *,
    hyper_parameters: dict[str, Any],
    variables: Any,
) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)

    arrays: dict[str, np.ndarray] = {}
    for var_path, leaf in _flatten(jax.device_get(variables)).items():
        arrays[_VAR_PREFIX + json.dumps(list(var_path))] = np.asarray(leaf)

    header = json.dumps(
        {"format": CKPT_FORMAT, "hyper_parameters": _jsonify(hyper_parameters)}
    )
    arrays[_HEADER_KEY] = np.frombuffer(header.encode("utf-8"), dtype=np.uint8)

    buf = io.BytesIO()
    np.savez(buf, **arrays)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(buf.getvalue())
    tmp.rename(path)


def load_checkpoint(path: Path | str) -> dict[str, Any]:
    path = Path(path)
    with open(path, "rb") as fp:
        magic = fp.read(2)
    if magic.startswith(b"\x80"):  # pickle protocol ≥2 marker
        raise ValueError(
            f"{path} is a pickle file — refusing to load it (pickle "
            "checkpoints can execute arbitrary code; re-train or re-export "
            "with this version to get the npz-based format)."
        )
    try:
        archive = np.load(path, allow_pickle=False)
    except Exception as e:
        raise ValueError(f"{path} is not a stamp-tpu checkpoint") from e

    if _HEADER_KEY not in archive:
        raise ValueError(f"{path} is not a stamp-tpu checkpoint")
    header = json.loads(bytes(archive[_HEADER_KEY]).decode("utf-8"))
    if header.get("format") != CKPT_FORMAT:
        raise ValueError(f"{path} is not a stamp-tpu checkpoint")

    flat = {
        tuple(json.loads(key[len(_VAR_PREFIX) :])): archive[key]
        for key in archive.files
        if key.startswith(_VAR_PREFIX)
    }

    hparams = header["hyper_parameters"]
    check_version_compatibility(hparams.get("stamp_version", "0.0.0"))
    return {
        "format": header["format"],
        "hyper_parameters": hparams,
        "variables": _unflatten(flat),
    }
