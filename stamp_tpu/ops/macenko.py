"""Macenko stain normalization as a fused, jittable device kernel.

The north-star spec calls for tessellation + stain normalization as fused
JAX/Pallas image kernels (BASELINE.md; Macenko was a STAMP-v1 capability —
SURVEY.md §6 note).  This implements Macenko et al., *A method for
normalizing histology slides for quantitative analysis* (ISBI 2009),
vectorized over a tile batch:

  1. optical density  OD = −ln((I+1)/240)  (natural log, as in the
     canonical Macenko implementations — the reference stain maxima
     ``MAX_C_REF`` are in natural-log OD units)
  2. tissue mask      every channel's OD > β
  3. top-2 eigenvectors of the masked OD covariance (3×3 ``eigh``)
  4. robust angular extremes (α/100−α percentiles) → stain vectors H, E
  5. concentrations by least squares over all pixels, 99th-percentile
     scaled to the reference maxima
  6. reconstruction ``Io·exp(−HE_ref·C)``

Everything is static-shape; tiles with too little tissue fall back to the
identity (a ``where`` on the masked pixel count), so background tiles pass
through unchanged inside one compiled graph.  Pinned against an independent
numpy implementation of the canonical algorithm + frozen values in
tests/test_macenko_groundtruth.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Canonical reference stain matrix and max concentrations (Macenko 2009 /
# staintools convention).
HE_REF = jnp.array(
    [
        [0.5626, 0.2159],
        [0.7201, 0.8012],
        [0.4062, 0.5581],
    ],
    dtype=jnp.float32,
)
MAX_C_REF = jnp.array([1.9705, 1.0308], dtype=jnp.float32)

_IO = 240.0  # transmitted-light intensity
_BETA = 0.15  # OD threshold for tissue
_ALPHA = 1.0  # percentile for robust angles
_MIN_TISSUE = 100  # pixels; below this the tile passes through unchanged


def _normalize_single(image: jax.Array) -> jax.Array:
    """image: [H, W, 3] uint8 → normalized [H, W, 3] uint8."""
    h, w, _ = image.shape
    ih = image.reshape(-1, 3).astype(jnp.float32)

    od = -jnp.log((ih + 1.0) / _IO)  # [N, 3], natural-log OD
    tissue = jnp.all(od > _BETA, axis=1)  # [N]
    n_tissue = jnp.sum(tissue)

    odt = jnp.where(tissue[:, None], od, 0.0)
    mean = jnp.sum(odt, axis=0) / jnp.maximum(n_tissue, 1)
    centered = jnp.where(tissue[:, None], od - mean, 0.0)
    cov = (centered.T @ centered) / jnp.maximum(n_tissue - 1, 1)

    _eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    v = eigvecs[:, 1:3]  # top-2 plane [3, 2]
    # orient eigenvectors consistently
    v = v * jnp.where(v[0] < 0, -1.0, 1.0)[None, :]

    proj = od @ v  # [N, 2]
    phi = jnp.arctan2(proj[:, 1], proj[:, 0])
    # masked percentiles: push non-tissue to the median so they don't bias
    big = jnp.where(tissue, phi, jnp.nan)
    min_phi = jnp.nanpercentile(big, _ALPHA)
    max_phi = jnp.nanpercentile(big, 100 - _ALPHA)

    v1 = v @ jnp.stack([jnp.cos(min_phi), jnp.sin(min_phi)])
    v2 = v @ jnp.stack([jnp.cos(max_phi), jnp.sin(max_phi)])
    # H first (larger first coordinate), E second — Macenko convention
    he = jnp.where(
        v1[0] > v2[0],
        jnp.stack([v1, v2], axis=1),
        jnp.stack([v2, v1], axis=1),
    )  # [3, 2]

    # concentrations: least squares he @ C = od^T; the 99th-percentile
    # maxima run over ALL pixels (canonical Macenko behavior)
    conc = jnp.linalg.lstsq(he, od.T)[0]  # [2, N]
    max_c = jnp.percentile(conc, 99, axis=1)
    conc_scaled = conc * (MAX_C_REF / jnp.maximum(max_c, 1e-6))[:, None]

    normalized = _IO * jnp.exp(-(HE_REF @ conc_scaled))  # [3, N]
    normalized = jnp.clip(normalized.T, 0.0, 255.0)

    out = normalized.reshape(h, w, 3)
    # not enough tissue (or degenerate stats) → identity
    ok = (n_tissue >= _MIN_TISSUE) & jnp.all(jnp.isfinite(out))
    return jnp.where(ok, out, image.astype(jnp.float32)).astype(jnp.uint8)


@jax.jit
def macenko_normalize(images: jax.Array) -> jax.Array:
    """Batched Macenko normalization: uint8 [B, H, W, 3] → uint8 [B, H, W, 3]."""
    return jax.vmap(_normalize_single)(images)
