"""Global seeding utility.

Behavioral parity with the reference seed utility
(src/stamp/utils/seed.py:15-49), adapted for JAX: instead of seeding a global
torch RNG we hold a root ``jax.random`` key which consumers split from, plus
seeding numpy / python RNGs for the host-side data pipeline.
"""

import random
from typing import ClassVar

import numpy as np


class Seed:
    seed: ClassVar[int | None] = None
    _numpy_rng: ClassVar[np.random.Generator | None] = None

    @classmethod
    def set(cls, seed: int) -> None:
        random.seed(seed)
        np.random.seed(seed)
        cls._numpy_rng = np.random.default_rng(seed)
        cls.seed = seed

    @classmethod
    def _is_set(cls) -> bool:
        return cls.seed is not None

    @classmethod
    def jax_key(cls):
        """Root PRNG key derived from the global seed (0 if unset)."""
        import jax

        return jax.random.PRNGKey(cls.seed if cls.seed is not None else 0)

    @classmethod
    def numpy_rng(cls) -> np.random.Generator:
        """Host-side RNG used by the data pipeline (bag sampling)."""
        if cls._numpy_rng is None:
            cls._numpy_rng = np.random.default_rng()
        return cls._numpy_rng
