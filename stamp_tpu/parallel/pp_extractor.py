"""Pipeline-parallel (GPipe-schedule) forward for the extractor ViTs.

Complements the DP/SP/TP axes (mesh.py, tp_extractor.py): the transformer
*depth* is split into P stages over a ``pp`` mesh axis, each device holding
depth/P contiguous blocks (their per-block params stacked along a leading
axis and sharded over ``pp``), and microbatches flow through the stages via
``jax.lax.ppermute`` ring shifts over ICI.  The patch embedding and the
final norm/pool head stay replicated — they are a negligible share of the
FLOPs — so only the block slab is pipelined.

The schedule is plain GPipe: with M microbatches and P stages the loop runs
M+P-1 ticks; stage s works on microbatch t-s at tick t, bubbles at the ends.
Each tick is one ``ppermute`` (activation hop to the next stage) plus one
``lax.scan`` over the stage's local blocks.  Outputs accumulate on the last
stage and are broadcast with a masked ``psum``.

Bubble-tick cost: during fill/drain ticks a stage with no valid microbatch
still applies its block stack to a stale activation (outputs are only stored
for valid ``out_idx``, so correctness is unaffected).  Skipping that compute
would not shorten the tick — SPMD stages run in lockstep and each tick lasts
one full stage-apply regardless of which stages hold valid data — so the
garbage FLOPs are deliberate; total overhead is the standard GPipe bubble
fraction (P-1)/(M+P-1).  Ragged batches are padded to a microbatch multiple
internally and the padding rows dropped from the output.

The reference has no model-parallel execution at all (SURVEY §2.3 — it is
pinned to one device, reference train.py:541-548); this axis exists so
foundation-model towers whose weights outgrow one chip's HBM can still
extract, with per-chip memory cost depth/P instead of depth.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stamp_tpu.models.vit_image import ImageViT, _Block


def stack_block_params(variables: Any, depth: int) -> tuple[Any, Any]:
    """Split an ImageViT variable tree into (stacked block slab, the rest).

    The slab stacks ``params/block_i`` across i along a new leading axis —
    every block has an identical param structure, so the stack is a single
    pytree with [depth, ...] leaves, ready to be sharded over ``pp``.  The
    remainder (patch embed, pos/cls/reg tokens, final norm) keeps its
    original structure with the block entries removed.
    """
    params = dict(variables["params"])
    blocks = [params.pop(f"block_{i}") for i in range(depth)]
    slab = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    rest = dict(variables)
    rest["params"] = params
    return slab, rest


def make_pp_forward(
    module: ImageViT,
    variables: Any,
    mesh: Mesh,
    n_microbatches: int,
):
    """Returns (forward, (sharded_slab, replicated_rest)) over mesh axis ``pp``.

    ``forward(slab, rest, images)`` == ``module.apply(variables, images)``
    for batch sizes divisible by ``n_microbatches``.
    """
    cfg = module.cfg
    n_stages = mesh.shape["pp"]
    if cfg.depth % n_stages != 0:
        raise ValueError(f"depth {cfg.depth} not divisible by {n_stages} stages")

    slab, rest = stack_block_params(variables, cfg.depth)
    slab = jax.device_put(
        slab, NamedSharding(mesh, P("pp"))
    )  # leading (depth) axis split into contiguous stages
    rest = jax.device_put(rest, NamedSharding(mesh, P()))

    block = _Block(cfg)

    def _stage_apply(local_slab: Any, x: jax.Array) -> jax.Array:
        def body(h, one_block):
            return block.apply({"params": one_block}, h), None

        out, _ = jax.lax.scan(body, x, local_slab)
        return out

    def _pipeline(local_slab: Any, xs: jax.Array) -> jax.Array:
        # xs: [M, mb, N, D] token microbatches, replicated on every stage.
        stage = jax.lax.axis_index("pp")
        m = xs.shape[0]
        shift_down = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(t, carry):
            sent, outs = carry
            recv = jax.lax.ppermute(sent, "pp", shift_down)
            x_in = jnp.where(stage == 0, xs[jnp.clip(t, 0, m - 1)], recv)
            y = _stage_apply(local_slab, x_in)
            out_idx = t - (n_stages - 1)
            drained = jnp.logical_and(out_idx >= 0, stage == n_stages - 1)
            outs = jnp.where(
                drained,
                jax.lax.dynamic_update_index_in_dim(
                    outs, y, jnp.clip(out_idx, 0, m - 1), 0
                ),
                outs,
            )
            return y, outs

        init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        _, outs = jax.lax.fori_loop(0, m + n_stages - 1, tick, init)
        # only the last stage holds real outputs; masked psum broadcasts them
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), "pp"
        )

    pipeline = jax.shard_map(
        _pipeline,
        mesh=mesh,
        in_specs=(P("pp"), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def forward(slab: Any, rest: Any, images: jax.Array) -> jax.Array:
        b = images.shape[0]
        # pad ragged batches (deploy-time slides rarely tile to a multiple)
        # up to a microbatch multiple; padding rows are dropped below
        pad = (-b) % n_microbatches
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad, *images.shape[1:]), images.dtype)], axis=0
            )
        bp = b + pad
        tokens = module.apply(rest, images, part="embed")
        xs = tokens.reshape(n_microbatches, bp // n_microbatches, *tokens.shape[1:])
        ys = pipeline(slab, xs)
        out = module.apply(rest, ys.reshape(bp, *ys.shape[2:]), part="head")
        return out[:b]

    return forward, (slab, rest)
