"""Multi-host / multi-slice distributed layer.

The reference has no distributed execution at all — its Lightning trainer is
pinned to one device with a FIXME (reference src/stamp/modeling/train.py:541-548)
and its only scale-out is filesystem-level: shuffled worklists plus
skip-if-exists idempotency so several machines can share one output directory
(reference src/stamp/preprocessing/__init__.py:269-286).  This module is the
rebuild's core new capability (SURVEY §2.3/§7.8):

* ``init_distributed`` — ``jax.distributed`` process-group plumbing.  On TPU
  pods it auto-detects the topology; elsewhere (CPU fleets, tests) the
  coordinator/process identity comes from arguments or ``STAMP_*`` env vars.
* ``make_global_mesh`` — a ``(dcn, dp, sp)`` mesh over *all* global devices.
  The leading ``dcn`` axis crosses process/slice boundaries so collectives
  along it ride the data-center network, while the inner axes stay inside a
  slice and ride ICI.  Shardings should therefore put the small/rare
  reductions (gradient sums across slices) on ``dcn`` and the heavy traffic
  (sequence-parallel attention) on the inner axes.
* host-level work partitioning — ``shard_worklist`` (extraction fleets) and
  ``assign_folds`` (crossval folds across slices) give each process a
  deterministic, disjoint share while composing with the existing
  skip-if-exists / atomic-rename filesystem contract, so a crashed process's
  share can be picked up by simply re-running.

Division of labor across the axes:

* **Extraction** is embarrassingly parallel per slide: hosts take disjoint
  worklist shares (no DCN traffic at all) and each host DP-shards tile
  batches over its local chips (extractor/__init__.py).  A ``dcn`` axis
  would add nothing — slides never span hosts.
* **Training** scales the batch over ``(dcn, dp)`` — XLA turns the gradient
  reduction into an ICI reduce-scatter inside each slice plus one small DCN
  all-reduce across slices — and can additionally shard the tiles-per-bag
  axis over ``sp`` for whole-slide bags.
* **Crossval** runs folds on different slices concurrently (``assign_folds``);
  the per-fold artifacts (splits.json, fold-i/patient-preds.csv) keep the
  runs restartable and mergeable exactly as in the reference.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Mapping, Sequence
from typing import Any, TypeVar

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_logger = logging.getLogger("stamp")

_T = TypeVar("_T")

_initialized = False


def init_distributed(
    *,
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the ``jax.distributed`` process group (idempotent).

    Resolution order for each field: explicit argument → ``STAMP_COORDINATOR_
    ADDRESS`` / ``STAMP_NUM_PROCESSES`` / ``STAMP_PROCESS_ID`` env vars →
    jax's own auto-detection (TPU pods know their topology; single-process
    runs need no initialization at all).

    Call this once, before any jax computation, on every process of the
    fleet.  Single-process usage (the common case, and all of the reference's
    capability) never needs to call it.
    """
    global _initialized
    if _initialized:
        return

    # NOTE: no jax.* queries before initialize() — touching the backend
    # (jax.devices / process_count / default_backend) makes initialization
    # impossible afterwards.
    coordinator_address = coordinator_address or os.environ.get(
        "STAMP_COORDINATOR_ADDRESS"
    )
    if num_processes is None and (env := os.environ.get("STAMP_NUM_PROCESSES")):
        num_processes = int(env)
    if process_id is None and (env := os.environ.get("STAMP_PROCESS_ID")):
        process_id = int(env)

    if coordinator_address is None and num_processes is None:
        # Only auto-initialize when the environment clearly is a multi-host
        # TPU fleet (pod runtimes export worker topology); single-process
        # runs — all of the reference's capability — need no process group.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            try:
                jax.distributed.initialize()
                _initialized = True
            except (RuntimeError, ValueError) as e:
                # backend already up (a single-process run touched jax
                # first), or the pod env vars are present but incomplete —
                # proceed single-process rather than failing a workflow
                # that never asked for a fleet
                _logger.debug(f"skipping jax.distributed auto-init: {e}")
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    _logger.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def make_global_mesh(
    mesh_shape: Mapping[str, int] | None = None,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over all global devices with a DCN-aware axis layout.

    ``mesh_shape`` maps axis names to sizes, e.g. ``{"dcn": 2, "dp": 2,
    "sp": 2}``; its product must equal the global device count.  Without it
    the default is ``dcn = process_count`` (1 collapses the axis away) and
    all remaining devices on ``dp``.

    The leading ``dcn`` axis must be a multiple of the process count so each
    dcn group is a whole slice: ``jax.devices()`` orders devices
    process-contiguously, so reshaping puts intra-slice neighbors on the
    inner (ICI) axes and process boundaries on ``dcn``.  On TPU backends
    with several processes, ``mesh_utils.create_hybrid_device_mesh`` is used
    instead of a plain reshape so the inner axes also follow the physical
    ICI torus.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    n_proc = jax.process_count()

    if mesh_shape is None:
        axes = ("dcn", "dp") if n_proc > 1 else ("dp",)
        shape = (n_proc, n // n_proc) if n_proc > 1 else (n,)
    else:
        axes = tuple(mesh_shape.keys())
        shape = tuple(mesh_shape.values())

    if int(np.prod(shape)) != n:
        raise ValueError(
            f"mesh_shape {dict(zip(axes, shape))} needs {int(np.prod(shape))} "
            f"devices but {n} are visible"
        )
    if n_proc > 1:
        dcn = shape[0] if axes and axes[0] == "dcn" else 1
        if dcn % n_proc != 0 and n_proc % max(dcn, 1) != 0:
            raise ValueError(
                f"dcn axis ({dcn}) must align with the process count ({n_proc}) "
                "so every dcn group is a whole slice"
            )

    if n_proc > 1 and devs and devs[0].platform == "tpu":
        from jax.experimental import mesh_utils

        dcn_shape = [1] * len(shape)
        ici_shape = list(shape)
        if axes[0] == "dcn":
            dcn_shape[0] = shape[0]
            ici_shape[0] = 1
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devs
        )
    else:
        mesh_devices = np.array(devs).reshape(shape)
    return Mesh(mesh_devices, axis_names=axes)


def shard_worklist(items: Sequence[_T], *, seed: int = 0x5742) -> list[_T]:
    """Return this process's deterministic, disjoint share of a worklist.

    Every process sorts (so the shares are disjoint even when callers hand
    in differently-ordered lists), shuffles identically (seeded rng — unlike
    the reference's unseeded shuffle, which only *probabilistically* avoids
    collisions and leans on skip-if-exists), and takes a strided slice, so
    the shares partition the list exactly.  Composes with skip-if-exists:
    re-running after adding processes, or after a crash, just re-partitions
    the remaining work.
    """
    try:
        canonical = sorted(items)  # type: ignore[type-var]
    except TypeError:
        canonical = sorted(items, key=repr)
    order = np.random.default_rng(seed).permutation(len(canonical))
    shuffled = [canonical[i] for i in order]
    return shuffled[jax.process_index() :: jax.process_count()]


def replicate_global(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a host pytree over every device of a (possibly
    multi-process) mesh.  Single-process this is a plain ``device_put``;
    multi-process each host contributes its (identical) copy."""
    repl = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)), tree
    )


def assign_folds(n_splits: int) -> list[int]:
    """Crossval fold indices this process should train (round-robin across
    the fleet).  Fold artifacts are per-directory and skip-if-exists, so the
    assignment is safe to recompute across restarts and fleet resizes."""
    return list(range(jax.process_index(), n_splits, jax.process_count()))


def fold_is_mine(fold_idx: int) -> bool:
    return fold_idx % jax.process_count() == jax.process_index()


def global_batch(
    batch: Any, mesh: Mesh, specs: Any, *, batch_axis_size: int | None = None
) -> Any:
    """Assemble a globally-sharded batch from process-local rows.

    Single-process: a plain ``device_put`` with the given shardings.
    Multi-process: each process contributes the rows it holds via
    ``jax.make_array_from_process_local_data``; with deterministic seeded
    sampling every process draws the same global batch, so callers pass
    their slice (``split_local_rows``) and the shards line up.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(np.asarray(x), NamedSharding(mesh, s)),
            batch,
            specs,
            is_leaf=lambda x: x is None,
        )

    def _one(x, spec):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return jax.tree_util.tree_map(
        _one, batch, specs, is_leaf=lambda x: x is None
    )


def split_local_rows(batch: Any, *, axis: int = 0) -> Any:
    """Slice this process's contiguous share of a (replicated) host batch
    along the leading batch axis — the bridge between a deterministic
    every-process-draws-the-same-batch dataloader and ``global_batch``."""
    n, i = jax.process_count(), jax.process_index()

    def _one(x):
        if x is None:
            return None
        b = x.shape[axis]
        if b % n != 0:
            raise ValueError(f"batch axis {b} not divisible by {n} processes")
        step = b // n
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(i * step, (i + 1) * step)
        return x[tuple(idx)]

    return jax.tree_util.tree_map(_one, batch, is_leaf=lambda x: x is None)
