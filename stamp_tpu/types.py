"""Unit types and shared aliases.

Mirrors the semantic unit system of the reference (src/stamp/types.py:23-62)
without depending on torch: all array-valued aliases refer to numpy / JAX
arrays instead of torch tensors.
"""

from collections.abc import Mapping
from pathlib import Path
from typing import Final, Literal, NewType, TypeAlias, TypeVar

# --- tiling ---

ImageExtension: TypeAlias = Literal["png", "jpg"]
EXTENSION_TO_FORMAT: Final[Mapping[str, str]] = {
    "png": "png",
    "jpg": "jpeg",
}

Microns = NewType("Microns", float)
"""Micrometers, usually referring to the tissue on the slide."""

SlidePixels = NewType("SlidePixels", int)
"""Pixels of the WSI scan at largest magnification (level-0 coordinates)."""

TilePixels = NewType("TilePixels", int)
"""Pixels after resizing, i.e. how they appear on the final tile."""

SlideMPP = NewType("SlideMPP", float)
"""Microns per pixel at level 0."""

# --- modeling ---

DeviceLikeType: TypeAlias = str | int

PatientId: TypeAlias = str
GroundTruth: TypeAlias = str
SurvivalGroundTruth: TypeAlias = tuple[float | None, int | None]
MultiClassGroundTruth: TypeAlias = tuple[str, ...]
FeaturePath = NewType("FeaturePath", Path)

Category: TypeAlias = str
BagSize: TypeAlias = int
PandasLabel: TypeAlias = str

GroundTruthType = TypeVar("GroundTruthType", covariant=True)

Task: TypeAlias = Literal["classification", "regression", "survival"]
