"""Memory-safety fuzzing of the native WSI readers under ASan+UBSan.

The readers parse untrusted scanner files (reference delegates this to
OpenSlide, which gets continuous oss-fuzz coverage); this is the TPU
build's equivalent evidence.  `make fuzz` builds native/fuzzdrv.cpp with
-fsanitize=address,undefined -fno-sanitize-recover=all; the driver opens a
slide and pushes it through metadata, clipped/out-of-bounds region reads,
bounded level reads and raw-tile access.  A graceful failure (named error,
nonzero exit, bad_alloc) is acceptable on corrupted input — a sanitizer
report never is.

Two passes:
  * clean corpus — one fixture per format/compression family, driver must
    exit 0 with no report;
  * mutation corpus — seeded random byte flips and truncations of every
    container file, driver may fail but must not trip the sanitizers.
"""

import os
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from tests.czi_util import write_czi
from tests.hamamatsu_util import write_vms, write_vmu
from tests.mirax_util import write_mirax
from tests.ndpi_huge_util import write_huge_ndpi
from tests.wsi_golden import write_golden_slide
from tests.scn_util import write_scn
from tests.wsi_util import write_j2k_tiff

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
DRIVER = NATIVE_DIR / "build" / "wsifuzz"
N_MUTATIONS = 12  # per container file (byte flips) + 3 truncations

_ENV = {
    **os.environ,
    # huge claimed sizes must fail as bad_alloc (graceful), not as a
    # sanitizer abort; the driver closes every handle it opens, and
    # error-path leak noise would drown corruption signal
    "ASAN_OPTIONS": "allocator_may_return_null=1:detect_leaks=0",
    "UBSAN_OPTIONS": "print_stacktrace=1",
}


@pytest.fixture(scope="module")
def driver() -> Path:
    if shutil.which("g++") is None or shutil.which("make") is None:
        pytest.skip("no C++ toolchain")
    build = subprocess.run(
        ["make", "fuzz"], cwd=NATIVE_DIR, capture_output=True, text=True
    )
    if build.returncode != 0 or not DRIVER.exists():
        pytest.skip(f"sanitizer build unavailable: {build.stderr[-500:]}")
    return DRIVER


@pytest.fixture(scope="module")
def corpus(tmp_path_factory) -> list[Path]:
    """One slide per format family; returns the paths to open."""
    root = tmp_path_factory.mktemp("san_corpus")
    rng = np.random.default_rng(7)
    slides: list[Path] = []

    def subdir(name: str) -> Path:
        d = root / name  # one dir per slide so mutation copies stay small
        d.mkdir()
        return d

    slides.append(write_golden_slide(subdir("golden")))  # LZW TIFF

    arr = rng.integers(0, 255, (192, 256, 3), np.uint8)
    j2k = subdir("j2k") / "aperio_j2k.svs"
    write_j2k_tiff(j2k, arr)
    slides.append(j2k)

    cam = rng.integers(0, 255, (160, 224, 3), np.uint8)
    for fmt in ("JPEG", "PNG", "BMP24"):
        mrxs = subdir(f"mirax_{fmt.lower()}") / "slide.mrxs"
        write_mirax(mrxs, cam, tile=64, divisions=2, n_levels=2, tile_format=fmt)
        slides.append(mrxs)

    stub, _ = write_vms(subdir("vms"))
    slides.append(Path(stub))

    stub_u, _ = write_vmu(subdir("vmu"))
    slides.append(Path(stub_u))

    huge = subdir("huge") / "huge.ndpi"  # level past the 65535-px SOF limit
    write_huge_ndpi(huge)
    slides.append(huge)

    czi = subdir("czi") / "mosaic.czi"
    write_czi(czi)
    slides.append(czi)

    czi_jxr = subdir("czi_jxr") / "mosaic_jxr.czi"  # real T.832 payload
    write_czi(czi_jxr, with_jpegxr=True)
    slides.append(czi_jxr)

    czi_jxr_bad = subdir("czi_jxr_bad") / "mosaic_jxr_bad.czi"  # error path
    write_czi(czi_jxr_bad, jpegxr_corrupt=True)
    slides.append(czi_jxr_bad)

    scn = subdir("scn") / "collection.scn"  # Leica XML + stitched mains
    write_scn(
        scn,
        [
            {
                "arr": rng.integers(0, 255, (96, 80, 3), np.uint8),
                "offset_nm": (1_000_000, 1_000_000),
                "nm_per_px": 250.0,
            },
            {
                "arr": rng.integers(0, 255, (96, 80, 3), np.uint8),
                "offset_nm": (1_030_000, 1_000_000),
                "nm_per_px": 250.0,
            },
        ],
    )
    slides.append(scn)

    from tests.bif_util import write_bif

    bif = subdir("bif") / "slide.bif"  # Ventana iScan metadata + pyramid
    write_bif(bif, rng.integers(0, 255, (96, 128, 3), np.uint8))
    slides.append(bif)

    from tests.qptiff_util import write_qptiff_brightfield

    qp = subdir("qptiff") / "slide.qptiff"  # Akoya QPI brightfield layout
    write_qptiff_brightfield(qp, rng.integers(0, 255, (96, 128, 3), np.uint8))
    slides.append(qp)

    return slides


def _run(driver: Path, slide: Path) -> tuple[subprocess.CompletedProcess, str]:
    proc = subprocess.run(
        [str(driver), str(slide)],
        capture_output=True,
        text=True,
        errors="replace",  # mutated descriptions echo as non-UTF-8 bytes
        env=_ENV,
        timeout=300,
    )
    report = ""
    for needle in ("AddressSanitizer", "runtime error", "Sanitizer"):
        if needle in proc.stderr:
            report = proc.stderr[-2000:]
            break
    return proc, report


def _container_files(slide: Path) -> list[Path]:
    """Every file the reader may touch for this slide."""
    files = [slide]
    datadir = slide.with_suffix("")  # MIRAX layout
    if datadir.is_dir():
        files += sorted(p for p in datadir.iterdir() if p.is_file())
    if slide.suffix in (".vms", ".vmu"):
        files += sorted(
            p for p in slide.parent.iterdir() if p.is_file() and p != slide
        )
    return files


def test_clean_corpus_is_sanitizer_silent(driver, corpus):
    for slide in corpus:
        proc, report = _run(driver, slide)
        assert not report, f"{slide.name}: sanitizer report\n{report}"
        assert proc.returncode == 0, (
            f"{slide.name}: driver failed on a clean fixture "
            f"(rc={proc.returncode})\n{proc.stdout}\n{proc.stderr[-500:]}"
        )


def test_mutated_big_ndpi_never_trips_sanitizers(driver, tmp_path):
    """The ≥4 GiB NDPI backends (wrapped offsets + read_huge), fuzzed
    in place: the fixtures are sparse, so copying them per mutation would
    materialize gigabytes of holes — instead each case flips bytes inside
    the materialized windows (first/last 4 MiB, where every structure
    lives) and restores them afterwards."""
    from tests.ndpi_huge_util import write_big_huge_ndpi
    from tests.ndpi_util import write_big_ndpi

    rng = np.random.default_rng(99)
    failures = []
    for name, writer in (("big.ndpi", write_big_ndpi),
                         ("big_huge.ndpi", write_big_huge_ndpi)):
        path = tmp_path / name
        writer(path)
        size = path.stat().st_size
        windows = [(0, 4 << 20), (max(0, size - (4 << 20)), size)]
        proc, report = _run(driver, path)
        assert not report and proc.returncode == 0, f"{name} clean: {report}"
        with open(path, "r+b") as f:
            for i in range(N_MUTATIONS):
                lo, hi = windows[i % 2]
                edits = []
                for _ in range(int(rng.integers(1, 5))):
                    off = int(rng.integers(lo, hi))
                    f.seek(off)
                    old = f.read(1)
                    f.seek(off)
                    f.write(bytes([int(rng.integers(0, 256))]))
                    edits.append((off, old))
                f.flush()
                _, report = _run(driver, path)
                if report:
                    failures.append(f"{name} mutation {i}:\n{report}")
                for off, old in edits:  # restore for the next case
                    f.seek(off)
                    f.write(old)
                f.flush()
    assert not failures, "\n\n".join(failures[:5])


def test_mutated_corpus_never_trips_sanitizers(driver, corpus, tmp_path):
    rng = np.random.default_rng(1234)
    failures = []
    for slide in corpus:
        for target in _container_files(slide):
            if target.stat().st_size == 0:
                continue
            for i in range(N_MUTATIONS + 3):
                case = tmp_path / f"{slide.stem}_{target.name}_{i}"
                shutil.copytree(slide.parent, case)
                victim = case / target.relative_to(slide.parent)
                data = bytearray(victim.read_bytes())
                if i >= N_MUTATIONS:  # truncation cases
                    data = data[: int(rng.integers(0, len(data)))]
                else:
                    for _ in range(int(rng.integers(1, 5))):
                        data[int(rng.integers(0, len(data)))] = int(
                            rng.integers(0, 256)
                        )
                victim.write_bytes(bytes(data))
                _, report = _run(driver, case / slide.name)
                if report:
                    failures.append(
                        f"{slide.name} / {target.name} mutation {i}:\n{report}"
                    )
                shutil.rmtree(case)
    assert not failures, "\n\n".join(failures[:5])
