"""End-to-end extraction benchmark: slides/hour through the REAL pipeline.

Unlike bench.py (device forward only), this drives ``extract_`` exactly as
`stamp preprocess` does — native WSI decode, tiling + brightness/Canny
filters on host threads, producer/consumer batching, device forward, fp16
h5 writes — over a synthetic cohort of LZW-TIFF and MIRAX slides, and
reports tiles/s, slides/hour and the per-stage host/device wall breakdown
from utils/profiling.

Notes for interpreting numbers in this harness: the TPU is reached through
a relay whose host→device link is ~25 MB/s, so the device share includes
tunnel transfer of every tile batch (224·224·3 bytes/tile ≈ 150 KB ⇒ the
link alone caps ≈170 tiles/s); production chips are PCIe/ICI-attached.
The probe therefore also runs a host-only pass (extractor="empty") to
separate the tiling pipeline's own ceiling from the tunnel.

Usage: python scripts/e2e_extract_probe.py [n_tiff] [tiff_px] [extractor]
Prints one JSON line at the end.
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

os.environ.setdefault("STAMP_RANDOM_WEIGHTS", "1")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation_cache"
)

import numpy as np
from PIL import Image

N_TIFF = int(sys.argv[1]) if len(sys.argv) > 1 else 4
TIFF_PX = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
EXTRACTOR = sys.argv[3] if len(sys.argv) > 3 else "uni2"
N_MRXS = 2


def build_slides(wsi_dir: Path) -> None:
    rng = np.random.default_rng(0)
    for i in range(N_TIFF):
        img = np.full((TIFF_PX, TIFF_PX, 3), 255, np.uint8)
        # tissue block covering ~60% of the area, textured so Canny keeps it
        m = TIFF_PX // 8
        img[m : TIFF_PX - m, m : TIFF_PX - m] = rng.integers(
            40, 200, size=(TIFF_PX - 2 * m, TIFF_PX - 2 * m, 3)
        ).astype(np.uint8)
        Image.fromarray(img).save(
            wsi_dir / f"tiff_{i}.tiff", compression="tiff_lzw",
            resolution=10000.0, resolution_unit=3,  # 1 µm/px
        )
    from mirax_util import write_mirax

    for i in range(N_MRXS):
        mrxs_px = 2048
        arr = rng.integers(40, 200, size=(mrxs_px, mrxs_px, 3)).astype(np.uint8)
        write_mirax(wsi_dir / f"mrxs_{i}.mrxs", arr, tile=256, mpp=1.0)


def run(extractor: str, wsi_dir: Path, out_dir: Path) -> dict:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import h5py

    from stamp_tpu.preprocessing.config import ExtractorName
    from stamp_tpu.preprocessing.extract import extract_
    from stamp_tpu.types import Microns, TilePixels
    from stamp_tpu.utils import profiling

    profiling.timer.enabled = True
    profiling.timer.reset()
    t0 = time.perf_counter()
    extract_(
        wsi_dir=wsi_dir,
        wsi_list=None,
        output_dir=out_dir,
        generate_hash=False,
        extractor=ExtractorName(extractor),
        tile_size_um=Microns(256.0),
        tile_size_px=TilePixels(224),
        cache_dir=None,
        cache_tiles_ext="jpg",
        max_workers=8,
        default_slide_mpp=None,
    )
    wall = time.perf_counter() - t0
    report = profiling.timer.report()
    profiling.timer.enabled = False
    print(report, file=sys.stderr)

    n_tiles = 0
    n_slides = 0
    for h5_path in out_dir.rglob("*.h5"):
        with h5py.File(h5_path) as h5:
            n_tiles += h5["coords"].shape[0]
            n_slides += 1
    stages = {
        name: round(secs, 2) for name, secs in profiling.timer.seconds.items()
    }
    return {
        "extractor": extractor,
        "n_slides": n_slides,
        "n_tiles": n_tiles,
        "wall_s": round(wall, 2),
        "tiles_per_s": round(n_tiles / wall, 1),
        "slides_per_hour": round(n_slides / wall * 3600, 1),
        "stages_s": stages,
        "stage_report": report,
    }


def main() -> None:
    work = Path(tempfile.mkdtemp(prefix="e2e_extract_"))
    wsi_dir = work / "wsi"
    wsi_dir.mkdir(parents=True)
    build_slides(wsi_dir)

    # host-only ceiling first (tiling + h5 writes, no device in the loop)
    host_only = run("empty", wsi_dir, work / "out_empty")
    full = run(EXTRACTOR, wsi_dir, work / "out_model")

    print(json.dumps({
        "slide_mix": f"{N_TIFF}x LZW-TIFF {TIFF_PX}px + {N_MRXS}x MIRAX",
        "host_pipeline_only": {
            k: host_only[k]
            for k in ("n_slides", "n_tiles", "wall_s", "tiles_per_s",
                      "slides_per_hour")
        },
        "end_to_end": {
            k: full[k]
            for k in ("extractor", "n_slides", "n_tiles", "wall_s",
                      "tiles_per_s", "slides_per_hour", "stages_s")
        },
    }))


if __name__ == "__main__":
    main()
