"""Shared helpers for the golden-extraction regression fixture."""

from pathlib import Path

import numpy as np
from PIL import Image

GOLDEN_EXTRACTOR_ARCH = "dino_vits14"  # smallest real ViT in the zoo


def write_golden_slide(directory: Path) -> Path:
    """A deterministic synthetic slide: LZW (lossless) pyramidal-free TIFF,
    1 µm/px, with a textured tissue region on white background."""
    rng = np.random.default_rng(1234)
    img = np.full((1536, 1536, 3), 255, np.uint8)
    img[256:1280, 256:1280] = rng.integers(0, 255, (1024, 1024, 3)).astype(np.uint8)
    path = directory / "golden.tiff"
    Image.fromarray(img).save(
        path, compression="tiff_lzw", resolution=10000.0, resolution_unit=3
    )
    return path


def extract_golden(slide_path: Path, output_dir: Path) -> Path:
    """Run the full extraction pipeline (tiling + ViT forward) on the golden
    slide with deterministic random weights; returns the produced h5."""
    from stamp_tpu.preprocessing.extract import extract_
    from stamp_tpu.preprocessing.extractor import make_vit_extractor

    extractor = make_vit_extractor(
        identifier="golden-vit", arch=GOLDEN_EXTRACTOR_ARCH
    )
    extract_(
        wsi_dir=slide_path.parent,
        output_dir=output_dir,
        wsi_list=None,
        cache_dir=None,
        cache_tiles_ext=".jpg",
        extractor=extractor,
        tile_size_px=224,
        tile_size_um=256.0,
        max_workers=2,
        default_slide_mpp=None,  # must come from the TIFF resolution tags
        generate_hash=False,
    )
    return output_dir / "golden-vit" / "golden.h5"
