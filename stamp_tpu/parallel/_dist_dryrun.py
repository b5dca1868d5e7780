"""Multi-process distributed dry-run: worker + local-fleet launcher.

Validates the multi-host layer (parallel/distributed.py) without TPU pods:
``launch_local_fleet`` spawns N OS processes on this machine, each with its
own set of virtual CPU devices, connected through ``jax.distributed`` (Gloo
collectives).  Every worker jits ONE training step over a global
``(dcn, dp, sp)`` mesh whose ``dcn`` axis crosses the process boundary —
the same program a real multi-slice TPU fleet runs, minus the hardware.

Run a worker by hand:
    python -m stamp_tpu.parallel._dist_dryrun <pid> <nproc> <port> [local_devices]

The reference has nothing to compare against here — it is pinned to one
device (reference src/stamp/modeling/train.py:541-548); this is the
rebuild's new capability (SURVEY §2.3/§7.8).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_OK_SENTINEL = "DIST_DRYRUN_OK"


def main(argv: list[str]) -> None:
    pid, nproc, port = int(argv[0]), int(argv[1]), int(argv[2])
    local_devices = int(argv[3]) if len(argv) > 3 else 4

    # force the CPU backend with `local_devices` virtual chips BEFORE any
    # jax import initializes a backend (the axon TPU plugin overrides
    # JAX_PLATFORMS at interpreter start, so also pin via jax.config)
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from stamp_tpu.parallel.distributed import (
        assign_folds,
        global_batch,
        init_distributed,
        make_global_mesh,
        shard_worklist,
        split_local_rows,
    )
    from stamp_tpu.parallel.mesh import make_dp_train_step

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * local_devices

    # (dcn, dp, sp): dcn across processes (DCN), dp/sp inside each (ICI)
    sp = 2 if local_devices % 2 == 0 else 1
    mesh = make_global_mesh({"dcn": nproc, "dp": local_devices // sp, "sp": sp})
    dcn, dp, _ = mesh.devices.shape
    print(f"[{pid}] mesh dcn={dcn} dp={dp} sp={sp}", flush=True)

    # tiny ALiBi ViT MIL classifier — the flagship training path
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.models.vision_transformer import VisionTransformer

    feat_dim = 16
    bag = 8 * sp
    batch = 2 * dcn * dp
    model = LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["neg", "pos"],
        category_weights=np.array([0.5, 0.5], dtype=np.float32),
        dim_input=feat_dim,
        model_name="vit",
        dim_model=32,
        dim_feedforward=32,
        n_heads=4,
        n_layers=2,
        use_alibi=True,
        total_steps=4,
    )

    # every process draws the SAME global batch (seeded), contributes its
    # contiguous row share; make_array_from_process_local_data lines them up
    host_batch = (
        np.random.default_rng(0).normal(size=(batch, bag, feat_dim)).astype(
            np.float32
        ),
        np.random.default_rng(1).uniform(size=(batch, bag, 2)).astype(np.float32)
        * 1000,
        np.full((batch,), bag, np.int32),
        np.tile(np.array([[1.0, 0.0]], np.float32), (batch, 1)),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), host_batch)
    tx = model.make_optimizer()

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def _replicate_global(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
            tree,
        )

    params = _replicate_global(variables["params"])
    model_state = _replicate_global(
        {k: v for k, v in variables.items() if k != "params"}
    )
    opt_state = _replicate_global(tx.init(variables["params"]))

    step, _ = make_dp_train_step(
        model, tx, mesh, sp_axis="sp", dp_axis=("dcn", "dp")
    )
    batch_specs = (
        P(("dcn", "dp"), "sp"),
        P(("dcn", "dp"), "sp"),
        P(("dcn", "dp")),
        P(("dcn", "dp")),
    )
    device_batch = global_batch(
        split_local_rows(host_batch), mesh, batch_specs
    )
    params, opt_state, model_state, loss = step(
        params, opt_state, model_state, device_batch, jax.random.PRNGKey(1)
    )
    loss = float(loss)  # fully-replicated output: identical on every process
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # host-level partitioning: shares must be disjoint and complete
    share = shard_worklist(list(range(13)))
    folds = assign_folds(5)
    print(f"[{pid}] share={sorted(share)} folds={folds}", flush=True)

    # workflow-level path: train_model_ with advanced.mesh_shape spanning
    # the process boundary — exercises replicate_global, per-batch global
    # sharding, replicated eval, and process-0-only checkpoint writes
    import tempfile
    from pathlib import Path as _Path

    from stamp_tpu.modeling.train import train_model_
    from stamp_tpu.utils.seed import Seed

    Seed.set(0)

    class _FixedBatches:
        """Deterministic batch feed — identical on every process."""

        def __init__(self, batches: list) -> None:
            self._batches = batches

        def __len__(self) -> int:
            return len(self._batches)

        def __iter__(self):
            return iter(self._batches)

    def _mk_batch(seed: int, b: int):
        r = np.random.default_rng(seed)
        return (
            r.normal(size=(b, bag, feat_dim)).astype(np.float32),
            r.uniform(size=(b, bag, 2)).astype(np.float32) * 1000,
            np.full((b,), bag, np.int32),
            np.tile(np.array([[1.0, 0.0]], np.float32), (b, 1)),
        )

    wf_model = LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["neg", "pos"],
        category_weights=np.array([0.5, 0.5], dtype=np.float32),
        dim_input=feat_dim,
        model_name="vit",
        dim_model=32,
        dim_feedforward=32,
        n_heads=4,
        n_layers=2,
        use_alibi=True,
        total_steps=4,
    )
    out_dir = _Path(tempfile.mkdtemp(prefix=f"dist_dryrun_{pid}_"))
    train_model_(
        output_dir=out_dir,
        model=wf_model,
        train_dl=_FixedBatches([_mk_batch(10, batch), _mk_batch(11, batch)]),
        valid_dl=_FixedBatches([_mk_batch(12, 1)]),
        max_epochs=2,
        patience=1,
        mesh_shape={"dcn": nproc, "dp": local_devices // sp, "sp": sp},
    )
    if pid == 0:
        assert (out_dir / "model.ckpt").exists(), "main process wrote no ckpt"
    else:
        assert not (out_dir / "model.ckpt").exists(), (
            "non-main process wrote files"
        )
    print(f"[{pid}] workflow-level mesh_shape training OK", flush=True)

    print(f"{_OK_SENTINEL} pid={pid} loss={loss:.4f}", flush=True)


def launch_local_fleet(
    n_processes: int = 2,
    local_devices: int = 4,
    timeout: float = 600.0,
) -> str:
    """Spawn an n-process local fleet of this dry-run; returns combined
    output.  Raises on failure or if any worker misses the OK sentinel."""
    from stamp_tpu.parallel._fleet_launch import launch_fleet

    return launch_fleet(
        "stamp_tpu.parallel._dist_dryrun",
        [str(local_devices)],
        n_processes=n_processes,
        timeout=timeout,
        ok_sentinel=_OK_SENTINEL,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
