"""MLP / Linear heads for slide- and patient-level features.

Port of reference src/stamp/modeling/models/mlp.py:6-62: accepts ``[B, F]`` or
``[B, T, F]`` (mean-pooled over tiles).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jaxtyping import ArrayLike, Float

from stamp_tpu.utils.shapecheck import shapechecked


class MLP(nn.Module):
    dim_output: int
    dim_input: int
    dim_hidden: int = 512
    num_layers: int = 2
    dropout: float = 0.25

    supports_coords = False

    @nn.compact
    @shapechecked
    def __call__(
        self,
        x: Float[ArrayLike, "batch feat"] | Float[ArrayLike, "batch tiles feat"],
        *,
        train: bool = False,
        **_: object,
    ) -> Float[ArrayLike, "batch out"]:
        if x.ndim == 3:
            x = jnp.mean(x, axis=1)
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
    @shapechecked
    def __call__(
        self,
        x: Float[ArrayLike, "batch feat"] | Float[ArrayLike, "batch tiles feat"],
        *,
        train: bool = False,
        **_: object,
    ) -> Float[ArrayLike, "batch out"]:
        if x.ndim == 3:
            x = jnp.mean(x, axis=1)
        return nn.Dense(self.dim_output, name="fc")(x)

    @staticmethod
    def model_params_keys() -> list[str]:
        return []
