"""Data-layer tests: cohort assembly, bag semantics, coord-format shims,
slide-table validation (coverage mirroring reference tests/test_data.py)."""

import h5py
import numpy as np
import pytest

from random_data import (
    create_good_and_bad_slide_tables,
    create_random_dataset,
    create_random_feature_file,
    make_feature_file,
    make_old_feature_file,
)
from stamp_tpu.modeling.data import (
    BagDataset,
    BatchIterator,
    _to_fixed_size_bag,
    create_dataset,
    get_coords,
    load_patient_data_,
    slide_to_patient_from_slide_table_,
)
from stamp_tpu.types import Microns


def test_load_patient_data(tmp_path):
    clini, slide, feat_dir, categories = create_random_dataset(
        dir=tmp_path,
        n_patients=10,
        max_slides_per_patient=2,
        min_tiles_per_slide=4,
        max_tiles_per_slide=16,
        feat_dim=8,
        n_categories=2,
    )
    patients, feature_type = load_patient_data_(
        feature_dir=feat_dir,
        clini_table=clini,
        slide_table=slide,
        task="classification",
        ground_truth_label="ground-truth",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
    )
    assert feature_type == "tile"
    assert len(patients) == 10
    for p in patients.values():
        assert p.ground_truth in categories


def test_fixed_size_bag_sampling_and_padding():
    rng = np.random.default_rng(0)
    feats = rng.random((10, 4)).astype(np.float32)
    coords = rng.random((10, 2)).astype(np.float32)

    # undersized bag → zero-pad
    bag, c, size = _to_fixed_size_bag(feats, coords, 16, deterministic=True, rng=rng)
    assert bag.shape == (16, 4) and c.shape == (16, 2)
    assert size == 10
    np.testing.assert_array_equal(bag[10:], 0)
    np.testing.assert_array_equal(bag[:10], feats)

    # oversized bag, deterministic → equidistant indices, reproducible
    bag1, c1, size1 = _to_fixed_size_bag(feats, coords, 4, deterministic=True, rng=rng)
    bag2, c2, size2 = _to_fixed_size_bag(feats, coords, 4, deterministic=True, rng=rng)
    assert size1 == 4
    np.testing.assert_array_equal(bag1, bag2)

    # random sampling draws a subset
    bag3, _, size3 = _to_fixed_size_bag(feats, coords, 4, deterministic=False, rng=rng)
    assert bag3.shape == (4, 4) and size3 == 4


def test_get_coords_current_format(tmp_path):
    path = create_random_feature_file(
        tmp_path=tmp_path, min_tiles=5, max_tiles=5, feat_dim=4
    )
    with h5py.File(path, "r") as h5:
        info = get_coords(h5)
    assert info.tile_size_um == 256
    assert info.tile_size_px == 224
    assert np.isclose(info.mpp, 256 / 224)


def test_get_coords_historic_format():
    feats = np.random.rand(6, 4).astype(np.float32)
    # grid coords with stride 224 (historic format: pixel units)
    grid = np.stack(
        [np.arange(6) * 224.0, np.zeros(6)], axis=1
    ).astype(np.float32)
    import io

    import h5py as h5mod

    file = io.BytesIO()
    with h5mod.File(file, "w") as h5:
        h5["feats"] = feats
        h5["coords"] = grid
    with h5mod.File(file, "r") as h5:
        info = get_coords(h5)
    assert info.tile_size_um == 256.0
    assert info.tile_size_px == 224
    np.testing.assert_allclose(info.coords_um, grid / 224 * 256)


def test_get_coords_v2_format():
    feats = np.random.rand(4, 8).astype(np.float32)
    coords = np.random.rand(4, 2).astype(np.float32)
    file = make_old_feature_file(
        feats=feats, coords=coords, tile_size_um=Microns(2508)
    )
    with h5py.File(file, "r") as h5:
        info = get_coords(h5)
    assert info.tile_size_um == 2508
    np.testing.assert_allclose(info.coords_um, coords * 2508, rtol=1e-6)


def test_bag_dataset_multi_h5_concat():
    feats_a = np.random.rand(3, 8).astype(np.float32)
    feats_b = np.random.rand(5, 8).astype(np.float32)
    coords = np.random.rand(3, 2).astype(np.float32)
    coords_b = np.random.rand(5, 2).astype(np.float32)
    files = [
        make_feature_file(feats=feats_a, coords=coords),
        make_feature_file(feats=feats_b, coords=coords_b),
    ]
    ds = BagDataset(
        bags=[files],
        bag_size=None,
        ground_truths=np.array([[1.0, 0.0]], dtype=np.float32),
        transform=None,
    )
    bag, c, size, target = ds[0]
    assert bag.shape == (8, 8)
    assert size == 8
    np.testing.assert_allclose(bag[:3], feats_a, rtol=1e-6)


def test_slide_table_h5_validation(tmp_path):
    good, all_bad, one_bad = create_good_and_bad_slide_tables(tmp_path=tmp_path)
    mapping = slide_to_patient_from_slide_table_(
        slide_table_path=good,
        feature_dir=tmp_path,
        patient_label="PATIENT",
        filename_label="FILENAME",
    )
    assert len(mapping) == 3

    for bad in (all_bad, one_bad):
        with pytest.raises(ValueError):
            slide_to_patient_from_slide_table_(
                slide_table_path=bad,
                feature_dir=tmp_path,
                patient_label="PATIENT",
                filename_label="FILENAME",
            )


def test_batch_iterator_shapes(tmp_path):
    clini, slide, feat_dir, _cats = create_random_dataset(
        dir=tmp_path,
        n_patients=9,
        max_slides_per_patient=1,
        min_tiles_per_slide=4,
        max_tiles_per_slide=30,
        feat_dim=8,
        n_categories=2,
    )
    patients, _ = load_patient_data_(
        feature_dir=feat_dir,
        clini_table=clini,
        slide_table=slide,
        task="classification",
        ground_truth_label="ground-truth",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
    )
    ds, cats = create_dataset(
        feature_type="tile",
        task="classification",
        patient_data=list(patients.values()),
        bag_size=16,
        shuffle=True,
    )
    it = BatchIterator(ds, batch_size=4, shuffle=True)
    batches = list(it)
    assert len(batches) == 3  # 9 patients / 4 per batch → 3 batches
    bags, coords, sizes, targets = batches[0]
    assert bags.shape == (4, 16, 8)
    assert coords.shape == (4, 16, 2)
    assert sizes.shape == (4,)
    assert targets.shape == (4, 2)


def test_h5_handle_cache_evicts_least_recently_used(tmp_path, monkeypatch):
    """Hot handles survive eviction past the cap (reference data.py:588-596)."""
    import stamp_tpu.modeling.data as data_mod
    from stamp_tpu.modeling.data import _H5HandleCache

    paths = []
    for i in range(6):
        p = tmp_path / f"f{i}.h5"
        with h5py.File(p, "w") as f:
            f["feats"] = np.zeros((2, 4), dtype=np.float32)
        paths.append(p)

    opened = []
    real_open = data_mod._open_h5

    def counting_open(f):
        opened.append(f)
        return real_open(f)

    monkeypatch.setattr(data_mod, "_open_h5", counting_open)

    cache = _H5HandleCache(capacity=4)
    for p in paths[:4]:
        cache.get(p)
    # Touch the first file again — it is now the most recently used.
    hot = cache.get(paths[0])
    assert opened == paths[:4]  # a hit must not reopen

    # Two more inserts evict the two *least* recently used (f1, f2) — not the
    # hot handle and not the entries just inserted.
    cache.get(paths[4])
    cache.get(paths[5])
    assert cache.get(paths[0]) is hot
    assert opened == paths[:6]  # f0 still cached, f4/f5 opened once each

    # f1 was evicted, so asking for it again reopens it.
    cache.get(paths[1])
    assert opened == paths[:6] + [paths[1]]


def test_batch_iterator_num_workers_equivalence(tmp_path):
    """Threaded fetching yields byte-identical batches (including the random
    bag draws) to the sequential loader — num_workers changes throughput,
    never results."""
    from stamp_tpu.modeling.data import BagDataset, BatchIterator

    paths = [
        create_random_feature_file(
            tmp_path=tmp_path, min_tiles=20, max_tiles=40, feat_dim=6
        )
        for _ in range(10)
    ]

    def epoch(workers: int):
        ds = BagDataset(
            bags=[[p] for p in paths],
            ground_truths=np.arange(10, dtype=np.float32).reshape(-1, 1),
            bag_size=8,
        )
        it = BatchIterator(
            ds,
            batch_size=3,
            shuffle=True,
            num_workers=workers,
            rng=np.random.default_rng(7),
        )
        return list(it)

    sequential, threaded = epoch(1), epoch(4)
    assert len(sequential) == len(threaded) == 4
    for batch_a, batch_b in zip(sequential, threaded):
        for a, b in zip(batch_a, batch_b):
            np.testing.assert_array_equal(a, b)


def test_batch_iterator_closes_worker_handles(tmp_path):
    """After a threaded epoch the loader must not leave the dead worker
    threads' cached h5 handles open (file descriptors are finite)."""
    from stamp_tpu.modeling.data import BagDataset, BatchIterator

    paths = [
        create_random_feature_file(
            tmp_path=tmp_path, min_tiles=8, max_tiles=12, feat_dim=4
        )
        for _ in range(6)
    ]
    ds = BagDataset(
        bags=[[p] for p in paths],
        ground_truths=np.zeros((6, 1), np.float32),
        bag_size=4,
    )
    it = BatchIterator(
        ds, batch_size=2, shuffle=False, num_workers=3,
        rng=np.random.default_rng(0),
    )
    assert len(list(it)) == 3
    assert all(
        not handles for handles in ds._h5_handle_cache._all_handle_dicts
    )
