"""Sharded train/eval on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from stamp_tpu.parallel.mesh import (
    make_dp_train_step,
    make_mesh,
    make_sp_eval_forward,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def model():
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.models.vision_transformer import VisionTransformer

    return LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["a", "b"],
        category_weights=np.array([0.5, 0.5], np.float32),
        dim_input=8,
        model_name="vit",
        dim_model=16,
        dim_feedforward=16,
        n_heads=4,
        n_layers=1,
        total_steps=4,
    )


def test_mesh_shapes():
    assert make_mesh(8, axes=("dp",)).devices.shape == (8,)
    assert make_mesh(8, axes=("dp", "sp")).devices.shape == (4, 2)
    assert make_mesh(1, axes=("dp", "sp")).devices.shape == (1, 1)


@pytest.mark.slow
def test_dp_sharded_train_step_matches_single_device(model):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, axes=("dp",))

    rng = jax.random.PRNGKey(0)
    batch = (
        np.random.default_rng(0).normal(size=(8, 16, 8)).astype(np.float32),
        np.random.default_rng(1).uniform(size=(8, 16, 2)).astype(np.float32),
        np.full((8,), 16, np.int32),
        np.tile(np.array([[1.0, 0.0]], np.float32), (8, 1)),
    )
    variables = model.init_variables(rng, batch)
    tx = model.make_optimizer()

    # single-device reference loss
    out = model.apply(variables, batch, train=False)
    ref_loss = float(model.loss(out, batch))

    params = replicate(variables["params"], mesh)
    model_state = replicate(
        {k: v for k, v in variables.items() if k != "params"}, mesh
    )
    opt_state = replicate(tx.init(variables["params"]), mesh)

    step, batch_sharding = make_dp_train_step(model, tx, mesh)
    device_batch = shard_batch(batch, mesh, batch_sharding)
    # snapshot before the step — params are donated into it
    leaves0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
    new_params, _opt, _ms, loss = step(
        params, opt_state, model_state, device_batch, rng
    )
    # train=True with dropout 0 and no randomness → train loss equals eval loss
    assert np.isclose(float(loss), ref_loss, atol=1e-5)
    # params actually changed
    leaves1 = jax.tree_util.tree_leaves(new_params)
    assert any(not np.allclose(a, np.asarray(b)) for a, b in zip(leaves0, leaves1))


@pytest.mark.slow
def test_sp_eval_forward(model):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, axes=("dp", "sp"))
    rng = jax.random.PRNGKey(0)
    t = 32  # divisible by the full mesh (8)
    batch = (
        np.random.default_rng(0).normal(size=(1, t, 8)).astype(np.float32),
        np.random.default_rng(1).uniform(size=(1, t, 2)).astype(np.float32),
        np.full((1,), t, np.int32),
        np.array([[1.0, 0.0]], np.float32),
    )
    variables = model.init_variables(rng, batch)

    ref = np.asarray(model.apply(variables, batch, train=False))

    fwd = make_sp_eval_forward(model, mesh)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    seq = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
    out = fwd(
        replicate(variables, mesh),
        jax.device_put(jnp.asarray(batch[0]), seq),
        jax.device_put(jnp.asarray(batch[1]), seq),
        jax.device_put(jnp.ones((1, t), bool), seq),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.slow
def test_tp_sharded_extractor_forward():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stamp_tpu.models.vit_image import ImageViT, ViTConfig
    from stamp_tpu.parallel.tp_extractor import make_tp_forward

    cfg = ViTConfig(
        patch_size=32, embed_dim=128, depth=2, num_heads=8, ffn="swiglu",
        mlp_ratio=4.0,
    )
    module = ImageViT(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 224, 224, 3)).astype(np.float32)
    )
    variables = module.init(jax.random.PRNGKey(0), x[:1])
    ref = module.apply(variables, x)

    mesh = Mesh(np.array(jax.devices()), ("tp",))
    fwd, sharded = make_tp_forward(module, variables, mesh)
    out = fwd(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # the MLP up-projection really is column-sharded
    leaf = sharded["params"]["block_0"]["mlp"]["fc1"]["kernel"]
    assert "tp" in str(leaf.sharding.spec)


@pytest.mark.slow
def test_pp_pipeline_extractor_forward_matches_single_device():
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stamp_tpu.models.vit_image import ImageViT, ViTConfig
    from stamp_tpu.parallel.pp_extractor import make_pp_forward

    cfg = ViTConfig(
        img_size=16, patch_size=8, embed_dim=32, depth=8, num_heads=4,
        num_reg_tokens=2,
    )
    module = ImageViT(cfg)
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 16, 16, 3)).astype(np.float32)
    )
    variables = module.init(jax.random.PRNGKey(0), images[:1])
    want = module.apply(variables, images)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
    fwd, (slab, rest) = make_pp_forward(module, variables, mesh, n_microbatches=4)
    got = fwd(slab, rest, images)
    # same blocks in the same order; tolerance for CPU matmul run-to-run
    # drift (oneDNN threading — see ROADMAP environment notes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # the block slab really is depth-sharded over the pp axis
    leaf = jax.tree_util.tree_leaves(slab)[0]
    assert "pp" in str(leaf.sharding.spec)
    # ragged batches (not a microbatch multiple) are padded internally and
    # the padding rows dropped — deploy-time slides rarely tile to a multiple
    got_ragged = fwd(slab, rest, images[:6])
    np.testing.assert_allclose(
        np.asarray(got_ragged), np.asarray(want[:6]), atol=1e-5
    )
    # indivisible depth is a named error
    bad_mesh = Mesh(np.array(jax.devices()[:3]), ("pp",))
    with pytest.raises(ValueError, match="not divisible"):
        make_pp_forward(module, variables, bad_mesh, n_microbatches=4)


def test_dp_sharded_barspoon_train_step():
    """Multi-target (barspoon) training shards over the (dp, sp) mesh: the
    dict-of-targets leaf structure rides the pytree-prefix batch sharding,
    and one step returns a finite replicated loss."""
    from stamp_tpu.modeling.tasks import LitEncDecTransformer

    targets = {"KRAS": ["mut", "wt"], "BRAF": ["mut", "wt"]}
    model = LitEncDecTransformer(
        dim_input=12,
        ground_truth_label=list(targets),
        categories=targets,
        category_weights={t: np.ones(2, np.float32) / 2 for t in targets},
        d_model=16,
        num_encoder_heads=2,
        num_decoder_heads=2,
        dim_feedforward=32,
        model_name="barspoon",
    )
    rng = np.random.default_rng(0)
    B, T = 8, 16
    batch = (
        rng.normal(size=(B, T, 12)).astype(np.float32),
        (rng.uniform(size=(B, T, 2)) * 500).astype(np.float32),
        np.full((B,), T, np.int32),
        {t: np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1)) for t in targets},
    )
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(8, axes=("dp", "sp"))
    tx = model.make_optimizer()
    step, shardings = make_dp_train_step(model, tx, mesh, sp_axis="sp")
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)
    before = jax.tree_util.tree_map(np.asarray, params)  # step donates params
    p2, o2, s2, loss = step(
        params, opt_state, state,
        jax.device_put(batch, shardings), jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(loss))
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(np.asarray(b)).sum()),
        jax.tree_util.tree_map(lambda a, b: np.asarray(a) - b, p2, before), 0.0,
    )
    assert delta > 0
