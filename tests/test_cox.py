"""Cox loss parity with the reference's torchsurv-derived doctests
(reference cox.py:192-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stamp_tpu.ops.cox import cox_loss_breslow, neg_partial_log_likelihood


@pytest.fixture
def example():
    log_hz = jnp.array([0.1, 0.2, 0.3, 0.4, 0.5])
    event = jnp.array([1.0, 0.0, 1.0, 0.0, 1.0])
    time = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    return log_hz, time, event


def test_no_ties(example):
    log_hz, time, event = example
    assert np.isclose(
        float(neg_partial_log_likelihood(log_hz, time, event)), 1.0071, atol=1e-3
    )


def test_sum_reduction(example):
    log_hz, time, event = example
    assert np.isclose(
        float(neg_partial_log_likelihood(log_hz, time, event, reduction="sum")),
        3.0214,
        atol=1e-3,
    )


def test_ties_efron_and_breslow(example):
    log_hz, _, event = example
    time = jnp.array([1.0, 2.0, 2.0, 4.0, 5.0])
    assert np.isclose(
        float(neg_partial_log_likelihood(log_hz, time, event)), 1.0873, atol=1e-3
    )
    assert np.isclose(
        float(
            neg_partial_log_likelihood(log_hz, time, event, ties_method="breslow")
        ),
        1.0873,
        atol=1e-3,
    )


def test_no_events_returns_zero(example):
    log_hz, time, _ = example
    event = jnp.zeros(5)
    assert float(neg_partial_log_likelihood(log_hz, time, event)) == 0.0
    assert float(cox_loss_breslow(log_hz, time, event)) == 0.0


def test_gradients_finite(example):
    log_hz, _, event = example
    time = jnp.array([1.0, 2.0, 2.0, 4.0, 5.0])
    g = jax.grad(lambda x: neg_partial_log_likelihood(x, time, event))(log_hz)
    assert bool(jnp.all(jnp.isfinite(g)))
    g2 = jax.grad(lambda x: cox_loss_breslow(x, time, event))(log_hz)
    assert bool(jnp.all(jnp.isfinite(g2)))


def test_nan_labels_excluded(example):
    log_hz, time, event = example
    time_with_nan = time.at[1].set(jnp.nan)
    loss = neg_partial_log_likelihood(log_hz, time_with_nan, event)
    assert bool(jnp.isfinite(loss))
