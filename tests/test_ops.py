"""Kernel/primitive tests: flash attention (interpret mode), SSD scan."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from stamp_tpu.ops.attention import masked_softmax, pairwise_distances
from stamp_tpu.ops.ssd import Mamba2Block, ssd_chunked, ssd_reference


@pytest.fixture
def interpret_pallas(monkeypatch):
    """Run Pallas kernels in interpreter mode (no TPU in CI)."""
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def test_flash_mha_matches_einsum(interpret_pallas):
    from stamp_tpu.ops.flash_attention import flash_mha

    rng = np.random.default_rng(0)
    BH, T, D = 4, 300, 64
    q = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    mask = jnp.asarray(np.tile((np.arange(T) < 237)[None], (BH, 1)))

    logits = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(D)
    w = masked_softmax(logits, mask[:, None, :])
    ref = jnp.einsum("bqk,bkd->bqd", w, v)

    out = flash_mha(q, k, v, mask, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_alibi_matches_einsum(interpret_pallas):
    from stamp_tpu.ops.flash_attention import flash_alibi_mha

    rng = np.random.default_rng(0)
    BH, T, D = 2, 200, 64
    q = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(size=(BH, T, 2)).astype(np.float32) * 1000)
    dist_scale = jnp.asarray(rng.uniform(size=(BH,)).astype(np.float32) * 1e-4)
    mask = jnp.asarray(np.tile((np.arange(T) < 163)[None], (BH, 1)))

    logits = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(D)
    w = masked_softmax(logits, mask[:, None, :])
    sd = dist_scale[:, None, None] * pairwise_distances(coords, coords)
    ref = jnp.einsum("bqk,bkd->bqd", (w - sd) * mask[:, None, :], v)

    out = flash_alibi_mha(
        q, k, v, coords, coords, dist_scale, mask, block_q=128, block_k=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_ssd_chunked_matches_reference():
    rng = np.random.default_rng(0)
    L, H, P, N = 200, 4, 16, 32
    x = jnp.asarray(rng.normal(size=(L, H, P)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.001, 0.1, size=(L, H)).astype(np.float32))
    A = jnp.asarray(-rng.uniform(0.5, 2.0, size=(H,)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(L, N)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(L, N)).astype(np.float32))

    ref = ssd_reference(x, dt, A, B, C)
    for chunk in (32, 64, 128):
        out = ssd_chunked(x, dt, A, B, C, chunk=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_mamba2_block():
    rng = np.random.default_rng(0)
    m = Mamba2Block(d_model=64, d_state=32, headdim=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((50, 64)))
    y = m.apply(v, jnp.asarray(rng.normal(size=(50, 64)).astype(np.float32)))
    assert y.shape == (50, 64)
    assert bool(jnp.isfinite(y).all())


def test_dilated_attention_matches_masked_reference():
    from stamp_tpu.ops.dilated_attention import (
        _segment_dilated,
        dilated_attention,
        dilated_attention_reference,
    )

    rng = np.random.default_rng(0)
    H, L, D = 4, 64, 16
    q = jnp.asarray(rng.normal(size=(H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(H, L, D)).astype(np.float32))

    for w, r in [(16, 1), (16, 2), (32, 4)]:
        out = _segment_dilated(q, k, v, w, r, L)
        ref = dilated_attention_reference(q, k, v, w=w, r=r)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    out = dilated_attention(
        q, k, v, segment_lengths=(16, 32), dilation_rates=(1, 2)
    )
    ref = jnp.concatenate(
        [
            dilated_attention_reference(q[:2], k[:2], v[:2], w=16, r=1),
            dilated_attention_reference(q[2:], k[2:], v[2:], w=32, r=2),
        ]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_macenko_normalization():
    from stamp_tpu.ops.macenko import macenko_normalize

    rng = np.random.default_rng(0)
    tile = np.full((64, 64, 3), 250, np.uint8)
    tissue = rng.integers(0, 2, (64, 64), dtype=bool)
    n = int(tissue.sum())
    tile[tissue] = np.stack(
        [
            rng.integers(120, 180, n),
            rng.integers(60, 110, n),
            rng.integers(130, 190, n),
        ],
        axis=1,
    ).astype(np.uint8)
    batch = np.stack([tile, np.full((64, 64, 3), 255, np.uint8)])

    out = np.asarray(macenko_normalize(jnp.asarray(batch)))
    assert out.shape == batch.shape and out.dtype == np.uint8
    # background-only tile passes through unchanged (too little tissue)
    np.testing.assert_array_equal(out[1], batch[1])
    # tissue tile is renormalized but background pixels stay bright
    assert not np.array_equal(out[0], batch[0])
    assert out[0][~tissue].mean() > 200


def test_fused_qkv_mha_matches_einsum(interpret_pallas):
    from stamp_tpu.ops.flash_attention import fused_qkv_mha

    rng = np.random.default_rng(2)
    B, H, T, D = 2, 4, 265, 16
    dim = H * D
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * dim)).astype(np.float32))

    q, k, v = (
        qkv.reshape(B, T, 3, H, D)[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
    )
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), v)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, T, dim)

    out = fused_qkv_mha(qkv, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_shapecheck_rejects_wrong_shapes():
    """Runtime shape checking on kernel entry points (reference beartypes the
    whole package, src/stamp/__init__.py:1-9)."""
    from stamp_tpu.ops.flash_attention import flash_mha

    q = jnp.zeros((2, 16, 8))
    k_bad = jnp.zeros((2, 12, 8))  # k-len mismatch between k and mask
    with pytest.raises(Exception, match="k|type|shape"):
        flash_mha(q, k_bad, k_bad, jnp.ones((2, 16), bool))

    from stamp_tpu.ops.ssd import ssd_chunked

    with pytest.raises(Exception, match="h|type|shape"):
        ssd_chunked(
            jnp.zeros((8, 4, 2)),
            jnp.zeros((8, 3)),  # H mismatch
            jnp.zeros((4,)),
            jnp.zeros((8, 5)),
            jnp.zeros((8, 5)),
        )


def test_flash_mha_gradients_match_einsum(interpret_pallas):
    """The custom VJP must agree with autodiff through the einsum reference
    (enables full-slide training without a [T,T] matrix)."""
    from stamp_tpu.ops.flash_attention import flash_mha

    rng = np.random.default_rng(3)
    BH, T, D = 2, 200, 32
    q = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    mask = jnp.asarray(np.tile((np.arange(T) < 163)[None], (BH, 1)))
    tangent = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))

    def ref_loss(q, k, v):
        logits = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(D)
        w = masked_softmax(logits, mask[:, None, :])
        out = jnp.einsum("bqk,bkd->bqd", w, v)
        return jnp.sum(out * tangent)

    def flash_loss(q, k, v):
        out = flash_mha(q, k, v, mask, block_q=128, block_k=128)
        return jnp.sum(out * tangent)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got_grads = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    for got, ref in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_flash_alibi2d_matches_dense(interpret_pallas):
    """Pre-softmax 2-D-ALiBi flash (TITAN path) vs the dense computation,
    including the CLS row/column exemption."""
    from stamp_tpu.ops.flash_attention import flash_alibi2d_mha

    rng = np.random.default_rng(4)
    BH, T, D = 3, 300, 32
    q = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    coords = jnp.asarray(rng.integers(0, 40, size=(BH, T, 2)).astype(np.float32))
    slopes = jnp.asarray([0.5, 0.1, 0.02], np.float32)

    delta = coords[:, :, None, :] - coords[:, None, :, :]
    dist = jnp.sqrt((delta**2).sum(-1))
    bias = -slopes[:, None, None] * dist
    idx = jnp.arange(T)
    exempt = (idx[:, None] == 0) | (idx[None, :] == 0)
    bias = jnp.where(exempt[None], 0.0, bias)
    logits = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(D) + bias
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, axis=-1), v)

    out = flash_alibi2d_mha(q, k, v, coords, slopes, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_alibi_gradients_match_einsum(interpret_pallas):
    """ALiBi flash VJP (softmax branch + post-softmax bias branch) vs
    autodiff through the einsum reference — full-slide ALiBi training."""
    from stamp_tpu.ops.flash_attention import flash_alibi_mha

    rng = np.random.default_rng(5)
    BH, T, D = 2, 180, 16
    q = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(size=(BH, T, 2)).astype(np.float32) * 1000)
    dist_scale = jnp.asarray(rng.uniform(size=(BH,)).astype(np.float32) * 1e-4)
    mask = jnp.asarray(np.tile((np.arange(T) < 151)[None], (BH, 1)))
    tangent = jnp.asarray(rng.normal(size=(BH, T, D)).astype(np.float32))

    def ref_loss(q, k, v, ds):
        logits = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(D)
        w = masked_softmax(logits, mask[:, None, :])
        sd = ds[:, None, None] * pairwise_distances(coords, coords)
        out = jnp.einsum("bqk,bkd->bqd", (w - sd) * mask[:, None, :], v)
        return jnp.sum(out * tangent)

    def flash_loss(q, k, v, ds):
        out = flash_alibi_mha(
            q, k, v, coords, coords, ds, mask, block_q=128, block_k=128
        )
        return jnp.sum(out * tangent)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, dist_scale)
    got_grads = jax.grad(flash_loss, argnums=(0, 1, 2, 3))(q, k, v, dist_scale)
    for got, ref in zip(got_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-3
        )


def test_mean_pairwise_distance_matches_dense():
    from stamp_tpu.ops.attention import mean_pairwise_distance

    rng = np.random.default_rng(6)
    coords = jnp.asarray(rng.uniform(0, 1000, size=(2, 307, 2)).astype(np.float32))
    dense = float(pairwise_distances(coords, coords).mean())
    streamed = float(mean_pairwise_distance(coords, block=64))
    np.testing.assert_allclose(streamed, dense, rtol=1e-5)


# ---------------------------------------------------------------------------
# fused LayerNorm→matmul (ops/ln_dense.py)
# ---------------------------------------------------------------------------


def test_ln_dense_fused_matches_reference(interpret_pallas):
    from stamp_tpu.ops.ln_dense import ln_dense, ln_dense_reference

    rng = np.random.default_rng(0)
    m, k, n = 512, 128, 256  # tiles onto the (256, 256) grid path
    x = jnp.asarray(rng.normal(size=(4, m // 4, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(k, n)) * 0.05).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    ref = ln_dense_reference(x.reshape(-1, k), g, b, w, d).reshape(4, -1, n)
    got = ln_dense(x, g, b, w, d)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    # no dense bias
    ref0 = ln_dense_reference(x.reshape(-1, k), g, b, w).reshape(4, -1, n)
    got0 = ln_dense(x, g, b, w)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), atol=2e-4)


def test_ln_dense_untileable_falls_back():
    from stamp_tpu.ops.ln_dense import ln_dense, ln_dense_reference

    rng = np.random.default_rng(1)
    m, k, n = 197, 192, 320  # m not a tile multiple → unfused XLA path
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(k, n)) * 0.05).astype(np.float32))
    got = ln_dense(x, g, b, w)
    ref = ln_dense_reference(x, g, b, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_ln_dense_gradients_match_autodiff(interpret_pallas):
    from stamp_tpu.ops.ln_dense import ln_dense, ln_dense_reference

    rng = np.random.default_rng(2)
    m, k, n = 256, 128, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(k, n)) * 0.05).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    tangent = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))

    def loss(fn):
        return lambda x, g, b, w, d: jnp.sum(fn(x, g, b, w, d) * tangent)

    ref_grads = jax.grad(loss(ln_dense_reference), argnums=(0, 1, 2, 3, 4))(
        x, g, b, w, d
    )
    got_grads = jax.grad(loss(ln_dense), argnums=(0, 1, 2, 3, 4))(x, g, b, w, d)
    for got, ref in zip(got_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-3
        )


def test_ln_quant_dense_fused_matches_reference(interpret_pallas):
    from stamp_tpu.ops.ln_dense import (
        ln_quant_dense,
        ln_quant_dense_reference,
    )

    rng = np.random.default_rng(3)
    # bm=512, bn=1024 → grid (1, 2): the j=1 step re-reads the int8 VMEM
    # scratch written at j=0, covering the scratch-reuse path
    m, k, n = 512, 128, 2048
    x = jnp.asarray(rng.normal(size=(2, m // 2, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    s_x = jnp.asarray(6.0, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)), dtype=jnp.int8)
    ws = jnp.asarray((rng.uniform(0.5, 2.0, size=(n,)) * 1e-3).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    ref = ln_quant_dense_reference(
        x.reshape(-1, k), g, b, s_x, wq, ws, d
    ).reshape(2, -1, n)
    got = ln_quant_dense(x, g, b, s_x, wq, ws, d)
    assert got.shape == ref.shape
    # both paths quantize from the same cast activation; only the int8 dot
    # accumulation order differs (it is exact in i32), so parity is tight
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # no dense bias
    ref0 = ln_quant_dense_reference(
        x.reshape(-1, k), g, b, s_x, wq, ws
    ).reshape(2, -1, n)
    got0 = ln_quant_dense(x, g, b, s_x, wq, ws)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), atol=1e-5)


def test_ln_quant_dense_untileable_falls_back():
    from stamp_tpu.ops.ln_dense import (
        ln_quant_dense,
        ln_quant_dense_reference,
    )

    rng = np.random.default_rng(4)
    m, k, n = 197, 192, 320  # m not a tile multiple → unfused XLA path
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    s_x = jnp.asarray(4.0, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)), dtype=jnp.int8)
    ws = jnp.asarray(np.full((n,), 1e-3, np.float32))
    got = ln_quant_dense(x, g, b, s_x, wq, ws)
    ref = ln_quant_dense_reference(x, g, b, s_x, wq, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_ln_quant_dense_gradients_match_unfused(interpret_pallas):
    """The fused int8 path must differentiate (custom VJP recomputing via
    the unfused reference) instead of trapping on a missing pallas AD rule,
    and its gradients must equal the unfused formulation's — including the
    zero gradient to x through the round/clip quantize."""
    from stamp_tpu.ops.ln_dense import (
        ln_quant_dense,
        ln_quant_dense_reference,
    )

    rng = np.random.default_rng(5)
    m, k, n = 512, 128, 2048  # fused-tileable (bm=512, bn=1024)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    s_x = jnp.asarray(6.0, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)), dtype=jnp.int8)
    ws = jnp.asarray((rng.uniform(0.5, 2.0, size=(n,)) * 1e-3).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    tangent = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))

    def loss(fn):
        return lambda x, g, b, ws, d: jnp.sum(
            fn(x, g, b, s_x, wq, ws, d) * tangent
        )

    got = jax.grad(loss(ln_quant_dense), argnums=(0, 1, 2, 3, 4))(
        x, g, b, ws, d
    )
    ref = jax.grad(loss(ln_quant_dense_reference), argnums=(0, 1, 2, 3, 4))(
        x, g, b, ws, d
    )
    for got_g, ref_g in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(ref_g), atol=1e-5, rtol=1e-5
        )
    # round/clip blocks gradients to the activation on BOTH paths
    np.testing.assert_allclose(np.asarray(got[0]), 0.0)
