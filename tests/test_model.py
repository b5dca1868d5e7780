"""Model shape / determinism / masking-equivalence checks
(same coverage pattern as reference tests/test_model.py + test_alibi.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jaxtyping import TypeCheckError

from stamp_tpu.models.barspoon import EncDecTransformer
from stamp_tpu.models.mlp import MLP, Linear
from stamp_tpu.models.trans_mil import TransMIL
from stamp_tpu.models.vision_transformer import VisionTransformer

RNG = jax.random.PRNGKey(0)
B, T, F = 2, 37, 24


@pytest.fixture
def bags_coords():
    bags = jax.random.normal(RNG, (B, T, F))
    coords = jax.random.uniform(RNG, (B, T, 2)) * 1000
    return bags, coords


@pytest.mark.parametrize("use_alibi", [False, True])
def test_vit_shapes_and_determinism(bags_coords, use_alibi):
    bags, coords = bags_coords
    m = VisionTransformer(
        dim_output=3,
        dim_input=F,
        dim_model=64,
        n_layers=2,
        n_heads=8,
        dim_feedforward=64,
        use_alibi=use_alibi,
    )
    vs = m.init({"params": RNG}, bags, coords=coords)
    out1 = m.apply(vs, bags, coords=coords)
    out2 = m.apply(vs, bags, coords=coords)
    assert out1.shape == (B, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.parametrize("use_alibi", [False, True])
def test_vit_padding_equivalence(bags_coords, use_alibi):
    """Bucket-padded masked eval must equal unpadded unmasked eval exactly."""
    bags, coords = bags_coords
    m = VisionTransformer(
        dim_output=2,
        dim_input=F,
        dim_model=64,
        n_layers=2,
        n_heads=8,
        dim_feedforward=64,
        use_alibi=use_alibi,
    )
    vs = m.init({"params": RNG}, bags, coords=coords)

    pad = 27
    bags_p = jnp.concatenate([bags, jnp.zeros((B, pad, F))], axis=1)
    coords_p = jnp.concatenate([coords, jnp.zeros((B, pad, 2))], axis=1)
    key_mask = jnp.concatenate(
        [jnp.ones((B, T), bool), jnp.zeros((B, pad), bool)], axis=1
    )

    o_unpadded = m.apply(vs, bags, coords=coords)
    o_padded = m.apply(vs, bags_p, coords=coords_p, key_mask=key_mask)
    np.testing.assert_allclose(
        np.asarray(o_unpadded), np.asarray(o_padded), atol=1e-5
    )


def test_alibi_running_mean_updates(bags_coords):
    bags, coords = bags_coords
    m = VisionTransformer(
        dim_output=2,
        dim_input=F,
        dim_model=64,
        n_layers=1,
        n_heads=4,
        dim_feedforward=64,
        use_alibi=True,
    )
    vs = m.init({"params": RNG}, bags, coords=coords)
    assert "alibi_stats" in vs

    _, mut = m.apply(
        vs,
        bags,
        coords=coords,
        train=True,
        mutable=["alibi_stats"],
        rngs={"dropout": RNG},
    )
    rm0 = jax.tree_util.tree_leaves(vs["alibi_stats"])
    rm1 = jax.tree_util.tree_leaves(mut["alibi_stats"])
    assert any(bool((a != b).any()) for a, b in zip(rm0, rm1))

    # eval must NOT mutate
    out = m.apply(vs, bags, coords=coords)
    assert out.shape == (B, 2)


def test_mlp_and_linear(bags_coords):
    bags, _ = bags_coords
    for cls in (MLP, Linear):
        kwargs = dict(dim_output=2, dim_input=F)
        m = cls(**kwargs)
        vs = m.init(RNG, bags)
        assert m.apply(vs, bags).shape == (B, 2)  # bag input mean-pooled
        assert m.apply(vs, bags[:, 0]).shape == (B, 2)  # vector input
        # wrong rank now rejected by the runtime shape checker
        with pytest.raises(TypeCheckError):
            m.apply(vs, bags[None])


def test_transmil(bags_coords):
    bags, _ = bags_coords
    m = TransMIL(dim_output=2, dim_input=F, dim_hidden=64)
    vs = m.init(RNG, bags)
    out = m.apply(vs, bags)
    assert out.shape == (B, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(m.apply(vs, bags)))


def test_barspoon_multi_target(bags_coords):
    bags, coords = bags_coords
    m = EncDecTransformer(
        dim_input=F,
        target_n_outs=(("KRAS", 2), ("BRAF", 3)),
        d_model=64,
        dim_feedforward=128,
    )
    vs = m.init(RNG, bags, coords=coords)
    out = m.apply(vs, bags, coords=coords)
    assert set(out.keys()) == {"KRAS", "BRAF"}
    assert out["KRAS"].shape == (B, 2)
    assert out["BRAF"].shape == (B, 3)


def test_model_runtime_shape_checking(bags_coords):
    """Package-wide runtime checking (reference beartypes the whole package,
    src/stamp/__init__.py:1-9): wrong-shape calls raise a typed error at the
    model boundary, before any device dispatch."""
    bags, coords = bags_coords
    m = VisionTransformer(
        dim_output=2, dim_input=F, dim_model=32, n_layers=1, n_heads=2,
        dim_feedforward=32,
    )
    vs = m.init({"params": RNG}, bags, coords=coords)

    # tile-count mismatch between bags and coords
    with pytest.raises(TypeCheckError):
        m.apply(vs, bags, coords=coords[:, :-1])
    # wrong coords rank
    with pytest.raises(TypeCheckError):
        m.apply(vs, bags, coords=coords[..., 0])
    # integer bags are not Float
    with pytest.raises(TypeCheckError):
        m.apply(vs, bags.astype(jnp.int32), coords=coords)

    tm = TransMIL(dim_output=2, dim_input=F, dim_hidden=32)
    tvs = tm.init(RNG, bags)
    with pytest.raises(TypeCheckError):
        tm.apply(tvs, bags[:, 0])  # missing tile axis
