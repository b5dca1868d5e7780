"""Tensor-parallel sharding for the extractor ViTs.

For foundation models too large (or too latency-sensitive) for pure data
parallelism, the weight pytree is sharded over a ``tp`` mesh axis in the
Megatron layout — attention QKV and MLP up-projections column-sharded,
output/down-projections row-sharded — and the jitted forward is constrained
accordingly; XLA SPMD inserts the all-reduces over ICI.

Correctness does not depend on the rules (any sharding is numerically
equivalent under SPMD); the rules only decide which collectives appear.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple[str, ...], leaf: jax.Array) -> P:
    """Megatron-style partition spec for an ImageViT parameter."""
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)

    if "attn" in joined and "qkv" in joined:
        return P(None, "tp") if leaf.ndim == 2 else P("tp")
    if "attn" in joined and "proj" in joined:
        return P("tp", None) if leaf.ndim == 2 else P()
    if "mlp" in joined and "fc1" in joined:
        return P(None, "tp") if leaf.ndim == 2 else P("tp")
    if "mlp" in joined and "fc2" in joined:
        return P("tp", None) if leaf.ndim == 2 else P()
    return P()  # norms, embeddings, layerscale: replicated


def shard_vit_params_tp(variables: Any, mesh: Mesh) -> Any:
    """Place an ImageViT variable tree onto the mesh with TP shardings."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _spec_for(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, variables)


def make_tp_forward(module, variables: Any, mesh: Mesh):
    """Returns (forward, sharded_variables): batch replicated, weights TP."""
    sharded = shard_vit_params_tp(variables, mesh)
    repl = NamedSharding(mesh, P())

    @jax.jit
    def forward(variables, images):
        out = module.apply(variables, images)
        return jax.lax.with_sharding_constraint(out, repl)

    return forward, sharded
