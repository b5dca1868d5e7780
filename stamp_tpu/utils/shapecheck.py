"""Runtime shape/type checking for kernel and model entry points.

The reference beartypes its whole package and jaxtypes model forwards
(reference src/stamp/__init__.py:1-9, modeling/models/vision_tranformer.py:193).
Here the hot functions are jitted, so the checks run on the *outside* of the
jit boundary: a wrong-shape call raises a typed error before dispatch, and
the per-call cost is a few microseconds of Python — nothing on-device.

beartype is not available in this environment; typeguard provides the
checker jaxtyping plugs into.
"""

from __future__ import annotations

from jaxtyping import jaxtyped
from typeguard import typechecked


def shapechecked(fn):
    """Enforce the function's jaxtyping annotations at call time."""
    return jaxtyped(typechecker=typechecked)(fn)
