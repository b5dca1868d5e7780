"""Parameter loading shared by the flax slide encoders.

Same contract as the extractor zoo (preprocessing/extractor/__init__.py):
``STAMP_RANDOM_WEIGHTS=1`` initializes the architecture with random weights
(for smoke tests / benchmarking); otherwise a pre-seeded torch checkpoint is
located in the local caches and converted, and a missing checkpoint raises
with guidance (the upstream weights are gated — reference encoders download
them via HF / gdown at runtime, which a zero-egress deployment pre-seeds).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable

import jax

_logger = logging.getLogger("stamp")


def load_or_init_params(
    module,
    example_args: tuple,
    *,
    name: str,
    weight_files: list[str],
    convert: Callable[[dict], Any] | None = None,
) -> Any:
    """Random-init (STAMP_RANDOM_WEIGHTS=1) or port pre-seeded torch weights."""
    if os.environ.get("STAMP_RANDOM_WEIGHTS") == "1":
        _logger.warning(
            f"{name}: using RANDOM weights (STAMP_RANDOM_WEIGHTS=1) — "
            "embeddings are only useful for smoke testing"
        )
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return module.init(jax.random.PRNGKey(0), *example_args)

    from stamp_tpu.preprocessing.extractor import (
        _find_torch_weights,
        _load_torch_state_dict,
    )

    path = _find_torch_weights(weight_files)
    if path is None:
        raise FileNotFoundError(
            f"no weights found for '{name}' (searched caches for "
            f"{weight_files}). Pre-seed the checkpoint into ~/.cache/stamp or "
            "set STAMP_WEIGHTS_DIR; set STAMP_RANDOM_WEIGHTS=1 for smoke "
            "testing without weights."
        )
    if convert is None:
        raise NotImplementedError(
            f"found weights for '{name}' at {path}, but no state-dict "
            "converter is wired up yet for this encoder."
        )
    _logger.info(f"{name}: porting torch weights from {path}")
    return convert(_load_torch_state_dict(path))
