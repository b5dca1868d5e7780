"""Regenerate the golden extraction fixture (tests/data/golden_extraction.h5).

The reference pins a TCGA slide + reference h5 to lock extraction numerics
(reference tests/test_feature_extractors.py:84-169).  With zero egress we pin
a *self-generated* golden instead: a deterministic synthetic slide pushed
through the full tiling + random-weight ViT extraction pipeline on CPU.  Run
this script ONLY when an intentional numerics change invalidates the golden:

    JAX_PLATFORMS=cpu python tests/make_golden.py
"""

import os
import sys
from pathlib import Path

os.environ["STAMP_RANDOM_WEIGHTS"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from wsi_golden import extract_golden, write_golden_slide  # noqa: E402

if __name__ == "__main__":
    data_dir = Path(__file__).parent / "data"
    data_dir.mkdir(exist_ok=True)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        slide = write_golden_slide(Path(tmp))
        out = extract_golden(slide, Path(tmp) / "out")
        import shutil

        shutil.copy(out, data_dir / "golden_extraction.h5")
    print(f"wrote {data_dir / 'golden_extraction.h5'}")
