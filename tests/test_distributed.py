"""Multi-host distributed layer tests.

Covers parallel/distributed.py: mesh factory validation, host-level work
partitioning (single-process degenerate cases run inline; true multi-process
behavior runs in the slow fleet test via OS subprocesses + jax.distributed),
and the workflow-level ``advanced.mesh_shape`` training path on the virtual
8-device CPU mesh from conftest.

The reference has nothing comparable — its trainer is pinned to one device
(reference src/stamp/modeling/train.py:541-548); this layer is the rebuild's
core new capability (SURVEY.md §2.3/§7.8).
"""

import numpy as np
import pytest

from stamp_tpu.parallel.distributed import (
    assign_folds,
    fold_is_mine,
    make_global_mesh,
    replicate_global,
    shard_worklist,
)


def test_make_global_mesh_default_single_process():
    mesh = make_global_mesh()
    assert mesh.axis_names == ("dp",)
    assert mesh.devices.size == 8


def test_make_global_mesh_explicit_shape():
    mesh = make_global_mesh({"dp": 4, "sp": 2})
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.shape == (4, 2)


def test_make_global_mesh_rejects_bad_product():
    with pytest.raises(ValueError, match="devices"):
        make_global_mesh({"dp": 3, "sp": 2})


def test_shard_worklist_single_process_is_complete_and_deterministic():
    items = [f"slide_{i}.svs" for i in range(17)]
    share1 = shard_worklist(items)
    share2 = shard_worklist(list(reversed(items)))  # input order must not matter
    assert sorted(share1) == sorted(items)
    assert share1 == share2


def test_fold_assignment_single_process():
    assert assign_folds(5) == [0, 1, 2, 3, 4]
    assert all(fold_is_mine(i) for i in range(5))


def test_replicate_global_roundtrip():
    mesh = make_global_mesh({"dp": 8})
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    rep = replicate_global(tree, mesh)
    np.testing.assert_array_equal(np.asarray(rep["w"]), tree["w"])


def test_train_model_mesh_shape_single_process(tmp_path):
    """advanced.mesh_shape on one process: dp×sp sharded training end to end
    through the real workflow entry (checkpoint written, loss finite)."""
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.modeling.train import train_model_
    from stamp_tpu.models.vision_transformer import VisionTransformer
    from stamp_tpu.utils.seed import Seed

    Seed.set(0)
    feat_dim, bag, batch = 12, 16, 8

    def mk_batch(seed: int, b: int):
        r = np.random.default_rng(seed)
        return (
            r.normal(size=(b, bag, feat_dim)).astype(np.float32),
            r.uniform(size=(b, bag, 2)).astype(np.float32) * 1000,
            np.full((b,), bag, np.int32),
            np.tile(np.array([[1.0, 0.0]], np.float32), (b, 1)),
        )

    class FixedBatches:
        def __init__(self, batches):
            self._batches = batches

        def __len__(self):
            return len(self._batches)

        def __iter__(self):
            return iter(self._batches)

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
    train_model_(
        output_dir=tmp_path,
        model=model,
        train_dl=FixedBatches([mk_batch(1, batch), mk_batch(2, batch)]),
        valid_dl=FixedBatches([mk_batch(3, 1)]),
        max_epochs=2,
        patience=1,
        mesh_shape={"dp": 4, "sp": 2},
    )
    assert (tmp_path / "model.ckpt").exists()


@pytest.mark.slow
def test_local_fleet_two_processes():
    """2 jax.distributed processes × 4 virtual CPU devices: global
    (dcn, dp, sp) mesh train step, disjoint worklist shares / fold
    assignments, and the workflow-level mesh_shape training path."""
    from stamp_tpu.parallel._dist_dryrun import launch_local_fleet

    out = launch_local_fleet(2, 4, timeout=900)
    # identical replicated loss on both processes
    losses = {
        line.split("loss=")[1] for line in out.splitlines() if "DIST_DRYRUN_OK" in line
    }
    assert len(losses) == 1
    # disjoint, complete worklist shares
    shares: list[list[int]] = []
    for line in out.splitlines():
        if "share=" in line:
            shares.append(eval(line.split("share=")[1].split(" folds=")[0]))
    assert len(shares) == 2
    assert sorted(shares[0] + shares[1]) == list(range(13))
    assert "workflow-level mesh_shape training OK" in out


def _make_fleet_cohort(wsi_dir, n_slides: int = 6, px: int = 1024) -> list[str]:
    from PIL import Image

    rng = np.random.default_rng(0)
    wsi_dir.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n_slides):
        img = np.full((px, px, 3), 255, np.uint8)
        m = px // 8
        img[m : px - m, m : px - m] = rng.integers(
            40, 200, size=(px - 2 * m, px - 2 * m, 3)
        ).astype(np.uint8)
        name = f"slide_{i}.tiff"
        Image.fromarray(img).save(
            wsi_dir / name, compression="tiff_lzw",
            resolution=10000.0, resolution_unit=3,  # 1 µm/px
        )
        names.append(name)
    return names


def test_extract_fleet_two_processes_shared_output(tmp_path):
    """2 jax.distributed processes run the REAL extract_ over one shared
    output dir (the reference's core multi-machine preprocessing behavior,
    reference preprocessing/__init__.py:269-286): the union of h5s is the
    complete cohort and the shares are disjoint (each slide extracted
    exactly once)."""
    from stamp_tpu.parallel._extract_fleet_dryrun import launch_extract_fleet

    names = _make_fleet_cohort(tmp_path / "wsi")
    out_dir = tmp_path / "out"
    combined = launch_extract_fleet(tmp_path / "wsi", out_dir, 2, timeout=600)

    h5s = sorted(p.stem for p in out_dir.rglob("*.h5"))
    assert h5s == sorted(n.removesuffix(".tiff") for n in names)

    # disjoint shares: every slide was extracted by exactly one worker
    shares = [
        int(line.split("takes ")[1].split(" slides")[0])
        for line in combined.splitlines()
        if "extraction fleet: process" in line
    ]
    assert len(shares) == 2 and sum(shares) == len(names)
    assert all(s > 0 for s in shares), f"degenerate split {shares}"


def test_extract_fleet_crashed_worker_pickup(tmp_path):
    """A worker that dies after claiming its share leaves the cohort
    incomplete; a later run completes it via skip-if-exists (the
    crash-pickup contract, executed)."""
    from stamp_tpu.parallel._extract_fleet_dryrun import launch_extract_fleet

    names = _make_fleet_cohort(tmp_path / "wsi")
    out_dir = tmp_path / "out"

    launch_extract_fleet(tmp_path / "wsi", out_dir, 2, timeout=600, crash_pid=1)
    after_crash = sorted(p.stem for p in out_dir.rglob("*.h5"))
    assert 0 < len(after_crash) < len(names), (
        f"crash simulation produced {len(after_crash)}/{len(names)} h5s"
    )

    # pickup: a fresh single-process run completes the cohort, skipping the
    # surviving worker's outputs instead of recomputing them
    combined = launch_extract_fleet(tmp_path / "wsi", out_dir, 1, timeout=600)
    h5s = sorted(p.stem for p in out_dir.rglob("*.h5"))
    assert h5s == sorted(n.removesuffix(".tiff") for n in names)
    n_skipped = sum(
        1 for line in combined.splitlines() if "already exists" in line
    )
    assert n_skipped == len(after_crash)


def test_train_model_mesh_ragged_batches(tmp_path):
    """Batches whose row count doesn't divide the dp axes are padded by
    cycling rows, NOT dropped: a small cohort whose every batch is ragged
    must still train (dropping them all used to leave nan training loss
    and an untrained model, silently)."""
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.modeling.train import train_model_
    from stamp_tpu.models.vision_transformer import VisionTransformer
    from stamp_tpu.utils.seed import Seed

    Seed.set(0)
    feat_dim, bag = 12, 16

    def mk_batch(seed: int, b: int):
        r = np.random.default_rng(seed)
        return (
            r.normal(size=(b, bag, feat_dim)).astype(np.float32),
            r.uniform(size=(b, bag, 2)).astype(np.float32) * 1000,
            np.full((b,), bag, np.int32),
            np.tile(np.array([[1.0, 0.0]], np.float32), (b, 1)),
        )

    class FixedBatches:
        def __init__(self, batches):
            self._batches = batches

        def __len__(self):
            return len(self._batches)

        def __iter__(self):
            return iter(self._batches)

    model = LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["neg", "pos"],
        category_weights=np.array([0.5, 0.5], np.float32),
        dim_input=feat_dim,
        model_name="vit",
        dim_model=16,
        dim_feedforward=16,
        n_heads=4,
        n_layers=1,
        total_steps=4,
    )
    # 6 and 7 rows — both ragged on dp=4
    train_model_(
        output_dir=tmp_path,
        model=model,
        train_dl=FixedBatches([mk_batch(1, 6), mk_batch(2, 7)]),
        valid_dl=FixedBatches([mk_batch(3, 2)]),
        max_epochs=2,
        patience=2,
        mesh_shape={"dp": 4, "sp": 2},
    )
    assert (tmp_path / "model.ckpt").exists()
    import csv

    with open(tmp_path / "lightning_logs" / "version_0" / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["training_loss"]) for r in rows if r.get("training_loss")]
    assert losses and all(np.isfinite(losses)), losses
