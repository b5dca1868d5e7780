"""The ``empty`` extractor: zero-dim features, used to only build tile caches
(reference extractor/empty.py:1-39)."""

import numpy as np
from PIL import Image

from stamp_tpu.preprocessing.extractor import Extractor


def empty() -> Extractor:
    def transform(img: Image.Image) -> np.ndarray:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)

    def forward(batch: np.ndarray) -> np.ndarray:
        return np.zeros((batch.shape[0], 0), dtype=np.float32)

    return Extractor(
        identifier="empty",
        input_px=224,
        feat_dim=0,
        transform_host=transform,
        forward=forward,
    )
