"""VaryPrecision transform (reference tests/test_vary_precision_transform.py).

Same contract: masking mantissa bits never flips the sign, and the relative
error stays under 2^-min_fraction_bits (at least that many fraction bits
survive).
"""

import numpy as np
import pytest

from stamp_tpu.modeling.transforms import VaryPrecisionTransform, vary_precision


def test_vary_precision_transform():
    rng = np.random.default_rng(0)
    raw = (rng.uniform(size=10000) * 2**10 - 2**9).astype(np.float32)
    raw = raw[raw != 0]  # log2(|0|) is undefined; the contract is about bits
    for min_fraction_bits in range(1, 10):
        augmented = vary_precision(raw, min_fraction_bits=min_fraction_bits)
        assert (np.sign(raw) == np.sign(augmented)).all()
        assert (
            np.log2(np.abs(raw)) - np.log2(np.abs(augmented))
            < 2.0**-min_fraction_bits
        ).all()


def test_vary_precision_float16():
    rng = np.random.default_rng(1)
    raw = (rng.uniform(size=4096).astype(np.float16) + np.float16(0.5))
    out = vary_precision(raw, min_fraction_bits=3)
    assert out.dtype == np.float16
    assert (np.sign(raw) == np.sign(out)).all()
    assert (np.log2(np.abs(raw.astype(np.float32))) -
            np.log2(np.abs(out.astype(np.float32))) < 2.0**-3).all()


def test_vary_precision_rejects_bad_args():
    with pytest.raises(ValueError, match="at least 1"):
        vary_precision(np.ones(4, np.float32), min_fraction_bits=0)
    with pytest.raises(NotImplementedError):
        vary_precision(np.ones(4, np.float64), min_fraction_bits=2)


def test_vary_precision_transform_class():
    t = VaryPrecisionTransform(min_fraction_bits=2)
    x = np.full((8, 8), 1.2345, np.float32)
    y = t(x)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, rtol=2.0**-2)
