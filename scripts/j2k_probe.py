"""Measure native J2K decode (native/j2k.cpp via libopenjp2) vs the PIL path.

VERDICT r3 item 5 asks the native Aperio-JPEG2000 path to be bit-exact vs
Pillow and materially faster.  This probe builds a synthetic 33005 (RGB)
J2K tiled TIFF — the layout Aperio scanners emit — and times whole-image
region reads through

  * the native path (`CTiffSlide.read_region_array`, tile codestreams
    decoded in C++ by j2k.cpp), and
  * the host fallback (`CTiffSlide._read_region_raw`, raw codestreams
    shipped to Python and decoded per tile by Pillow/openjpeg) — what
    every read cost before j2k.cpp landed.

Both paths land in the same libopenjp2 so the delta is the per-tile
Python/PIL overhead (BytesIO, Image.open header sniffing, convert("RGB"),
ndarray copies), which is exactly what the native path deletes.

Usage: python scripts/j2k_probe.py [edge_px] [tile_px] [reps]
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main() -> None:
    edge = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from wsi_util import write_j2k_tiff

    from stamp_tpu.preprocessing.wsi import open_slide

    rng = np.random.default_rng(0)
    # smooth-ish tissue-like content so J2K entropy coding does real work
    base = rng.integers(100, 255, (edge // 16, edge // 16, 3), dtype=np.uint8)
    arr = np.kron(base, np.ones((16, 16, 1), np.uint8))
    arr ^= rng.integers(0, 8, arr.shape, dtype=np.uint8)

    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "probe.tif"
        write_j2k_tiff(path, arr, tile=tile)
        slide = open_slide(path)
        if slide._raw_only:
            print("libopenjp2 unavailable: native J2K path not active")
            return

        native = slide.read_region_array((0, 0), (edge, edge))[:, :, :3]
        fallback = slide._read_region_raw(0, 0, edge, edge)[:, :, :3]
        assert np.array_equal(native, fallback), "native and PIL decodes differ"

        t_native = min(
            _timeit(lambda: slide.read_region_array((0, 0), (edge, edge)), reps)
        )
        t_pil = min(
            _timeit(lambda: slide._read_region_raw(0, 0, edge, edge), reps)
        )

    mpx = edge * edge / 1e6
    print(f"{edge}x{edge} px, {tile}px tiles, best of {reps}:")
    print(f"  native j2k.cpp : {t_native:.3f}s  ({mpx / t_native:.1f} Mpx/s)")
    print(f"  PIL fallback   : {t_pil:.3f}s  ({mpx / t_pil:.1f} Mpx/s)")
    print(f"  speedup        : {t_pil / t_native:.2f}x")


def _timeit(fn, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return out


if __name__ == "__main__":
    main()
