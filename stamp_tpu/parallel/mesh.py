"""Device meshes and sharded train/eval steps.

The reference has no distributed layer at all (`devices=1` hard-coded,
reference train.py:541-548; SURVEY.md §2.3) — scale-out is new capability in
this framework, built the XLA way: annotate shardings on a ``Mesh``, let the
compiler insert the collectives, keep the filesystem artifact contract for
host-level parallelism (slides / crossval folds).

Axes:
  * ``dp`` — data parallel over bags (training) or tile batches (extraction);
    gradients are reduced over ICI by XLA from the sharding annotations.
  * ``sp`` — sequence parallel over the tiles-per-bag axis, used for
    full-slide (10⁵-tile) inference where one chip's HBM can't hold the
    attention; XLA turns the attention contractions into all-gathers /
    reduce-scatters along ``sp``.

Model parameters are replicated: MIL aggregators are tiny (MBs) next to the
bags, so tensor-parallel weight sharding only pays off for the extractor
ViTs — those are handled in the extraction pipeline, not here.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, axes: Sequence[str] = ("dp",), shape: Sequence[int] | None = None
) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    With one axis the mesh is (n,); with two axes and no explicit shape the
    devices are split evenly with dp getting the larger factor.
    """
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            # dp gets the larger factor: sp=2 when possible, else 1
            sp = 2 if (n % 2 == 0 and n >= 2) else 1
            shape = (n // sp, sp)
        else:
            raise ValueError("give an explicit shape for >2 axes")
    mesh_devices = np.array(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names=tuple(axes))


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_dp_train_step(
    task_model,
    tx,
    mesh: Mesh,
    *,
    sp_axis: str | None = None,
    dp_axis: str | tuple[str, ...] = "dp",
):
    """Build a pjit-ed training step with batch sharded over ``dp_axis``.

    Returns ``step(params, opt_state, model_state, batch, rng)`` →
    ``(params, opt_state, model_state, loss)``.  When ``sp_axis`` is given,
    the tile axis of tile-level bags is additionally sharded over it
    (sequence parallelism); XLA inserts the attention collectives.

    ``dp_axis`` may be a tuple, e.g. ``("dcn", "dp")`` on a multi-slice mesh
    (parallel/distributed.py): the batch is then split across slices too,
    and XLA lowers the gradient reduction to an ICI reduce-scatter per slice
    plus one small all-reduce over DCN.
    """
    import optax

    module = task_model.module
    uses_coords = task_model.uses_coords
    is_tile = task_model.supported_features[0] == "tile"
    loss_fn_task = task_model.loss

    repl = NamedSharding(mesh, P())
    batch_dim = P(dp_axis, sp_axis) if sp_axis else P(dp_axis)

    if is_tile:
        batch_sharding = (
            NamedSharding(mesh, batch_dim),  # bags [B, T, F]
            NamedSharding(mesh, batch_dim),  # coords [B, T, 2]
            NamedSharding(mesh, P(dp_axis)),  # bag_sizes [B]
            NamedSharding(mesh, P(dp_axis)),  # targets [B, ...]
        )
    else:
        batch_sharding = (
            NamedSharding(mesh, P(dp_axis)),
            NamedSharding(mesh, P(dp_axis)),
        )

    def apply_model(variables, batch, rngs):
        if is_tile:
            bags, coords, _sizes, _t = batch
            kwargs: dict = dict(train=True)
            if uses_coords:
                kwargs.update(coords=coords, key_mask=None)
            return module.apply(
                variables, bags, **kwargs, rngs=rngs, mutable=["alibi_stats"]
            )
        feats, _t = batch
        return module.apply(
            variables, feats, train=True, rngs=rngs, mutable=["alibi_stats"]
        )

    @partial(
        jax.jit,
        in_shardings=(repl, repl, repl, batch_sharding, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, model_state, batch, rng):
        def loss_fn(p):
            variables = {"params": p, **model_state}
            outputs, mutated = apply_model(variables, batch, {"dropout": rng})
            return loss_fn_task(outputs, batch), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_model_state = mutated if mutated else model_state
        return new_params, new_opt_state, new_model_state, loss

    return step, batch_sharding


def make_sp_eval_forward(task_model, mesh: Mesh, *, sp_axis: str = "sp"):
    """Sequence-sharded full-bag forward: bags [1, T, F] with T sharded over
    the whole mesh — for slides whose bag exceeds one chip's HBM."""
    module = task_model.module
    uses_coords = task_model.uses_coords
    repl = NamedSharding(mesh, P())
    axes = tuple(mesh.axis_names)
    seq_spec = P(None, axes)  # shard tiles over every mesh axis

    @partial(
        jax.jit,
        in_shardings=(
            repl,
            NamedSharding(mesh, seq_spec),
            NamedSharding(mesh, seq_spec),
            NamedSharding(mesh, seq_spec),
        ),
        out_shardings=repl,
    )
    def forward(variables, bags, coords, key_mask):
        kwargs: dict = dict(train=False)
        if uses_coords:
            kwargs.update(coords=coords, key_mask=key_mask)
        return module.apply(variables, bags, **kwargs)

    return forward


def shard_batch(batch: Any, mesh: Mesh, shardings) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), batch, shardings
    )
