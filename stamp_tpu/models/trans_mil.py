"""TransMIL with Nyström linear attention.

Behavioral port of reference src/stamp/modeling/models/trans_mil.py (itself
adapted from szc19990412/TransMIL): square-pad token layout, two Nyström
attention blocks around a PPEG depthwise-conv positional encoding, CLS head.

TPU notes: the Moore-Penrose iteration and landmark reductions are pure
matmuls (MXU-friendly); the depthwise convs use
``lax.conv_general_dilated`` with ``feature_group_count``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
from jaxtyping import ArrayLike, Float

from stamp_tpu.utils.shapecheck import shapechecked


def moore_penrose_iter_pinv(x: jax.Array, iters: int = 6) -> jax.Array:
    """Iterative Moore-Penrose pseudo-inverse (reference trans_mil.py:23-37)."""
    abs_x = jnp.abs(x)
    col = abs_x.sum(axis=-1)
    row = abs_x.sum(axis=-2)
    z = jnp.swapaxes(x, -1, -2) / (jnp.max(col) * jnp.max(row))

    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    eye = eye[None, ...]

    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))
    return z


class NystromAttention(nn.Module):
    """Nyström approximation of self-attention (reference trans_mil.py:43-163)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    eps: float = 1e-8
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, *, deterministic: bool = True
    ) -> jax.Array:
        b, n, _ = x.shape
        h, m = self.heads, self.num_landmarks
        inner_dim = h * self.dim_head

        # pad sequence (on the LEFT, like reference F.pad(..., pad_len, 0))
        remainder = n % m
        if remainder > 0:
            pad_len = m - remainder
            x = jnp.pad(x, ((0, 0), (pad_len, 0), (0, 0)))
        n_padded = x.shape[1]

        qkv = nn.Dense(inner_dim * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(b, n_padded, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = q * self.dim_head**-0.5

        # landmarks: sum-pool groups of l = ceil(n / m) tokens
        l = math.ceil(n / m)
        # n_padded == number of groups × l? Reference reduces with l fixed and
        # group count n_padded // l.
        groups = n_padded // l
        q_land = q.reshape(b, h, groups, l, self.dim_head).sum(axis=3) / l
        k_land = k.reshape(b, h, groups, l, self.dim_head).sum(axis=3) / l

        sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_land)
        sim2 = jnp.einsum("bhid,bhjd->bhij", q_land, k_land)
        sim3 = jnp.einsum("bhid,bhjd->bhij", q_land, k)

        attn1 = jax.nn.softmax(sim1, axis=-1)
        attn2 = jax.nn.softmax(sim2, axis=-1)
        attn3 = jax.nn.softmax(sim3, axis=-1)
        attn2_inv = moore_penrose_iter_pinv(attn2, self.pinv_iterations)

        out = (attn1 @ attn2_inv) @ (attn3 @ v)  # [b, h, n_padded, dh]

        if self.residual:
            # depthwise conv over the sequence dim, groups=heads
            # v: [b, h, n, d] → conv (kernel k×1) over (n, d) with h channels
            kernel = self.param(
                "res_conv_kernel",
                nn.initializers.lecun_normal(),
                (self.residual_conv_kernel, 1, 1, h),
            )
            v_img = v.transpose(0, 2, 3, 1)  # [b, n, d, h] NHWC
            conv = jax.lax.conv_general_dilated(
                v_img,
                kernel,
                window_strides=(1, 1),
                padding=((self.residual_conv_kernel // 2,) * 2, (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=h,
            )
            out = out + conv.transpose(0, 3, 1, 2)

        out = out.transpose(0, 2, 1, 3).reshape(b, n_padded, inner_dim)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out[:, -n:]


class TransLayer(nn.Module):
    """x + NystromAttention(LayerNorm(x)) (reference trans_mil.py:245-263)."""

    dim: int = 512

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = nn.LayerNorm(name="norm")(x)
        h = NystromAttention(
            dim=self.dim,
            dim_head=self.dim // 8,
            heads=8,
            num_landmarks=self.dim // 2,
            pinv_iterations=6,
            residual=True,
            dropout=0.1,
            name="attn",
        )(h, deterministic=deterministic)
        return x + h


class PPEG(nn.Module):
    """Pyramid positional-encoding generator: depthwise 7/5/3 convs on the
    square token grid (reference trans_mil.py:266-283)."""

    dim: int = 512

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        b, _, c = x.shape
        cls_token, feat_token = x[:, 0:1], x[:, 1:]
        img = feat_token.reshape(b, H, W, c)  # NHWC

        def dwconv(name: str, ksize: int) -> jax.Array:
            kernel = self.param(
                f"{name}_kernel",
                nn.initializers.lecun_normal(),
                (ksize, ksize, 1, c),
            )
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (c,))
            out = jax.lax.conv_general_dilated(
                img,
                kernel,
                window_strides=(1, 1),
                padding=((ksize // 2,) * 2, (ksize // 2,) * 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
            return out + bias

        out = dwconv("proj", 7) + img + dwconv("proj1", 5) + dwconv("proj2", 3)
        out = out.reshape(b, H * W, c)
        return jnp.concatenate([cls_token, out], axis=1)


class TransMIL(nn.Module):
    """Reference trans_mil.py:286-326."""

    dim_output: int
    dim_input: int
    dim_hidden: int = 512

    supports_coords = False

    @nn.compact
    @shapechecked
    def __call__(
        self,
        h: Float[ArrayLike, "batch tiles feat"],
        *,
        train: bool = False,
        **_: object,
    ) -> Float[ArrayLike, "batch out"]:
        h = nn.Dense(self.dim_hidden, name="fc1")(h)
        h = nn.relu(h)

        n = h.shape[1]
        side = int(math.ceil(math.sqrt(n)))
        add_length = side * side - n
        h = jnp.concatenate([h, h[:, :add_length, :]], axis=1)

        b = h.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.dim_hidden)
        )
        h = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.dim_hidden)), h], axis=1)

        h = TransLayer(dim=self.dim_hidden, name="layer1")(h, deterministic=not train)
        h = PPEG(dim=self.dim_hidden, name="pos_layer")(h, side, side)
        h = TransLayer(dim=self.dim_hidden, name="layer2")(h, deterministic=not train)

        h = nn.LayerNorm(name="norm")(h)[:, 0]
        return nn.Dense(self.dim_output, name="fc2")(h)

    @staticmethod
    def model_params_keys() -> list[str]:
        return ["dim_hidden"]
