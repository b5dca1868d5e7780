"""MLP / Linear heads for slide- and patient-level features.

Port of reference src/stamp/modeling/models/mlp.py:6-62: accepts ``[B, F]`` or
``[B, T, F]`` (mean-pooled over tiles).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    dim_output: int
    dim_input: int
    dim_hidden: int = 512
    num_layers: int = 2
    dropout: float = 0.25

    supports_coords = False

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False, **_: object
    ) -> jax.Array:
        if x.ndim == 3:
            x = jnp.mean(x, axis=1)
        elif x.ndim != 2:
            raise ValueError(f"Expected 2D or 3D input, got {x.shape}")
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.dim_hidden, name=f"fc{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.dim_output, name="out")(x)

    @staticmethod
    def model_params_keys() -> list[str]:
        return ["dim_hidden", "num_layers", "dropout"]


class Linear(nn.Module):
    dim_output: int
    dim_input: int

    supports_coords = False

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False, **_: object
    ) -> jax.Array:
        if x.ndim == 3:
            x = jnp.mean(x, axis=1)
        elif x.ndim != 2:
            raise ValueError(f"Expected 2D or 3D input, got {x.shape}")
        return nn.Dense(self.dim_output, name="fc")(x)

    @staticmethod
    def model_params_keys() -> list[str]:
        return []
