"""Macenko stain-normalization ground truth.

Pins ops/macenko.py against (a) an independently written numpy
implementation of the canonical Macenko-2009 algorithm (the staintools /
``normalizeStaining`` convention: natural-log OD at Io=240, β=0.15 tissue
mask, α=1 angular percentiles, all-pixel 99th-percentile concentration
maxima, reference HE matrix + maxima), and (b) frozen golden values
committed as ``tests/data/macenko_golden.npz`` so the kernel and the oracle
cannot drift together unnoticed.  North-star config #2 (BASELINE.json)
names Macenko explicitly; the reference v2.5 has no stain code (SURVEY §6).
"""

from pathlib import Path

import numpy as np
import pytest

_GOLDEN = Path(__file__).parent / "data" / "macenko_golden.npz"

_HE_REF = np.array(
    [[0.5626, 0.2159], [0.7201, 0.8012], [0.4062, 0.5581]], dtype=np.float64
)
_MAX_C_REF = np.array([1.9705, 1.0308], dtype=np.float64)


def synthetic_he_tile(size: int = 96, seed: int = 0) -> np.ndarray:
    """An H&E-looking tile: two smooth stain-concentration fields pushed
    through Beer-Lambert with slightly off-reference stain vectors, plus a
    white background corner."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size))
    c_h = 0.9 * np.exp(-((xx - 0.4) ** 2 + (yy - 0.5) ** 2) * 6) + 0.15
    c_e = 0.7 * np.exp(-((xx - 0.7) ** 2 + (yy - 0.3) ** 2) * 8) + 0.1
    conc = np.stack([c_h.ravel(), c_e.ravel()])  # [2, N]
    stains = _HE_REF + rng.normal(scale=0.05, size=_HE_REF.shape)
    stains /= np.linalg.norm(stains, axis=0, keepdims=True)
    img = 240.0 * np.exp(-stains @ conc)  # [3, N]
    img = img.T.reshape(size, size, 3)
    img = img + rng.normal(scale=2.0, size=img.shape)
    img[: size // 4, : size // 4] = 250.0  # background corner
    return np.clip(img, 0, 255).astype(np.uint8)


def macenko_oracle(image: np.ndarray, io=240.0, alpha=1.0, beta=0.15) -> np.ndarray:
    """Canonical Macenko-2009 in plain numpy (independent of ops/macenko.py)."""
    h, w, _ = image.shape
    od = -np.log((image.reshape(-1, 3).astype(np.float64) + 1.0) / io)
    odhat = od[~np.any(od <= beta, axis=1)]

    _eigvals, eigvecs = np.linalg.eigh(np.cov(odhat.T))
    basis = eigvecs[:, 1:3]
    # deterministic orientation (same convention as the kernel; see
    # ops/macenko.py — extremes swap consistently, H/E re-ordering fixes it)
    basis = basis * np.where(basis[0] < 0, -1.0, 1.0)[None, :]

    proj = odhat @ basis
    phi = np.arctan2(proj[:, 1], proj[:, 0])
    min_phi = np.percentile(phi, alpha)
    max_phi = np.percentile(phi, 100 - alpha)
    v1 = basis @ np.array([np.cos(min_phi), np.sin(min_phi)])
    v2 = basis @ np.array([np.cos(max_phi), np.sin(max_phi)])
    he = np.stack([v1, v2] if v1[0] > v2[0] else [v2, v1], axis=1)

    conc = np.linalg.lstsq(he, od.T, rcond=None)[0]  # [2, N]
    max_c = np.percentile(conc, 99, axis=1)
    conc *= (_MAX_C_REF / max_c)[:, None]

    out = io * np.exp(-_HE_REF @ conc)
    return np.clip(out.T, 0, 255).reshape(h, w, 3).astype(np.uint8)


def test_macenko_matches_independent_oracle():
    import jax.numpy as jnp

    from stamp_tpu.ops.macenko import macenko_normalize

    img = synthetic_he_tile()
    want = macenko_oracle(img).astype(np.int32)
    got = np.asarray(macenko_normalize(jnp.asarray(img[None]))[0]).astype(np.int32)

    # fp32 kernel vs fp64 oracle: allow ±2 intensity levels on a tail of
    # pixels, exact-ish elsewhere
    diff = np.abs(got - want)
    assert np.median(diff) <= 1
    assert np.percentile(diff, 99) <= 2
    assert diff.max() <= 6


def test_macenko_matches_frozen_golden():
    import jax.numpy as jnp

    from stamp_tpu.ops.macenko import macenko_normalize

    if not _GOLDEN.exists():
        pytest.fail(
            f"{_GOLDEN} missing — regenerate with "
            "`python -m tests.test_macenko_groundtruth`"
        )
    golden = np.load(_GOLDEN)
    img = synthetic_he_tile()
    np.testing.assert_array_equal(img, golden["input"])  # generator stable

    want = golden["normalized"].astype(np.int32)
    got = np.asarray(macenko_normalize(jnp.asarray(img[None]))[0]).astype(np.int32)
    diff = np.abs(got - want)
    assert np.percentile(diff, 99) <= 2
    assert diff.max() <= 6

    # the oracle itself must reproduce the frozen values bit-for-bit
    np.testing.assert_array_equal(macenko_oracle(img), golden["normalized"])


def test_macenko_background_tile_passthrough():
    import jax.numpy as jnp

    from stamp_tpu.ops.macenko import macenko_normalize

    white = np.full((64, 64, 3), 245, np.uint8)
    out = np.asarray(macenko_normalize(jnp.asarray(white[None]))[0])
    np.testing.assert_array_equal(out, white)


if __name__ == "__main__":
    _GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    img = synthetic_he_tile()
    np.savez_compressed(_GOLDEN, input=img, normalized=macenko_oracle(img))
    print(f"wrote {_GOLDEN}")
