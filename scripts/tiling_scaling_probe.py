"""Host-tiling thread-scaling evidence on a single-core harness.

The production claim under test: the tiling hot loop
(`_tissue_tile_batches` — native WSI decode + PIL resize/convert +
numpy cut + cv2.Canny) scales with host cores.  This harness has ONE
core (`os.sched_getaffinity` = {0}), so an N-core speedup curve cannot
be measured directly.  What CAN be measured, and determines the curve:

1. **GIL-held fraction** of the hot loop.  Thread scaling at N cores is
   bounded by 1/(H + (1-H)/N) where H is the fraction of wall time the
   loop holds the GIL (the held part serializes across all threads).
   ≥0.7× linear at 8 threads needs H ≤ ~5.4%.  Measured with a sampler
   thread: it sleeps a fixed interval and records how much longer than
   the interval it took to get scheduled again — excess beyond the
   interpreter switch interval means a GIL-holding bytecode run blocked
   it.  (Same principle as the `gil_load` package.)

2. **Contention flatness**: aggregate throughput at max_workers=1/2/4
   on one core.  If the per-thread reader-handle pool (`_ReaderPool`)
   or any hidden lock serialized with *added* cost, throughput would
   drop as threads are added; flat throughput = no contention penalty.

3. The per-process numbers that anchor the fleet-scaling story:
   production extraction parallelism is ALSO process-level (shuffled
   worklists + skip-if-exists + atomic renames, extract.py:318 — one
   process per core shares no Python state at all), so even a
   pessimistic GIL reading only bounds intra-slide threads, not the
   per-host core scaling of `stamp preprocess` fleets.

Usage: python scripts/tiling_scaling_probe.py [slide_px] [reps]
Prints one JSON line at the end.
"""

import json
import statistics
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stamp_tpu.preprocessing.tiling import _grid_spec, _tissue_tile_batches
from stamp_tpu.preprocessing.wsi import open_slide
from stamp_tpu.types import Microns, SlidePixels, TilePixels

SLIDE_PX = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def build_slide(path: Path) -> None:
    rng = np.random.default_rng(0)
    img = np.full((SLIDE_PX, SLIDE_PX, 3), 255, np.uint8)
    m = SLIDE_PX // 8
    img[m:-m, m:-m] = rng.integers(40, 200, size=(SLIDE_PX - 2 * m,) * 2 + (3,)).astype(
        np.uint8
    )
    Image.fromarray(img).save(
        path,
        compression="tiff_lzw",
        resolution=10000.0,
        resolution_unit=3,  # 1 µm/px
    )


class GilSampler:
    """Estimate the GIL-held fraction of whatever else is running.

    Sleeps `interval` per tick; any wake-up delay beyond the interval +
    scheduler noise means a GIL-holding bytecode stretch made the
    sampler wait.  Reports excess-delay time over wall time.
    """

    def __init__(self, interval: float = 0.002) -> None:
        self.interval = interval
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            t0 = time.perf_counter()
            time.sleep(self.interval)
            self.samples.append(time.perf_counter() - t0 - self.interval)

    def __enter__(self) -> "GilSampler":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join()

    def held_fraction(self, baseline: float) -> float:
        """Excess wake-up delay (beyond `baseline` scheduler noise) as a
        fraction of sampled wall time."""
        if not self.samples:
            return float("nan")
        excess = sum(max(0.0, s - baseline) for s in self.samples)
        wall = sum(s + self.interval for s in self.samples)
        return excess / wall


def run_tiling(slide_path: Path, max_workers: int) -> tuple[float, int]:
    slide = open_slide(slide_path)
    spec = _grid_spec(
        slide,
        tile_size_um=Microns(256.0),
        tile_size_px=TilePixels(224),
        max_supertile_size_slide_px=SlidePixels(2048),
        default_slide_mpp=None,
    )
    n_tiles = 0
    t0 = time.perf_counter()
    for batch in _tissue_tile_batches(
        slide_path,
        slide,
        spec=spec,
        max_workers=max_workers,
        brightness_cutoff=224,
        canny_cutoff=0.02,
    ):
        n_tiles += int(batch.keep.sum())
    return time.perf_counter() - t0, n_tiles


def main() -> None:
    tmp = Path(tempfile.mkdtemp())
    slide_path = tmp / "probe.tiff"
    build_slide(slide_path)

    # scheduler-noise baseline: sampler alone, nothing else running
    with GilSampler() as idle:
        time.sleep(1.0)
    idle_samples = sorted(idle.samples)
    baseline = idle_samples[int(len(idle_samples) * 0.95)]  # p95 idle delay

    run_tiling(slide_path, 1)  # warm page cache / lazy imports

    results: dict[int, list[float]] = {}
    gil_fracs: list[float] = []
    for workers in (1, 2, 4):
        for rep in range(REPS):
            if workers == 1:
                with GilSampler() as g:
                    wall, n_tiles = run_tiling(slide_path, workers)
                gil_fracs.append(g.held_fraction(baseline))
            else:
                wall, n_tiles = run_tiling(slide_path, workers)
            results.setdefault(workers, []).append(n_tiles / wall)

    t1 = statistics.median(results[1])
    out = {
        "metric": "tiling_thread_scaling",
        "slide_px": SLIDE_PX,
        "tiles_per_s": {w: round(statistics.median(v), 1) for w, v in results.items()},
        "contention_penalty_vs_1thread": {
            w: round(1.0 - statistics.median(v) / t1, 3) for w, v in results.items()
        },
        "gil_held_fraction": round(statistics.median(gil_fracs), 4),
        "gil_baseline_p95_s": round(baseline, 5),
        "amdahl_8thread_linear_eff": round(
            1.0
            / (
                statistics.median(gil_fracs)
                + (1 - statistics.median(gil_fracs)) / 8.0
            )
            / 8.0,
            3,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
