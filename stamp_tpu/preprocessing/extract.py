"""Feature-extraction driver: slides → tiles → device batches → ``.h5``.

Behavioral parity with reference src/stamp/preprocessing/__init__.py:110-380:
shuffled slide work-list (multi-machine sharing via the filesystem contract),
skip-if-h5-exists, per-slide fail-safe try/except, fp16 features with the
exact attrs set, atomic temp-file writes, rejection thumbnail JPG.

TPU-first pipeline: host tiling threads produce uint8 tile batches into a
bounded queue; the consumer runs the jitted bf16 backbone — so WSI decode,
host→HBM transfer, and MXU compute overlap (the reference pipelines these
through a single torch DataLoader worker, SURVEY.md §3.1).  Each slide is
processed by ``_extract_slide``; the driver loop owns only worklist
construction and the per-slide fail-safe."""

from __future__ import annotations

import logging
import os
import queue
import threading
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image
from tqdm import tqdm

from stamp_tpu.io.h5 import write_tile_feats_atomic
from stamp_tpu.preprocessing.config import ExtractorName
from stamp_tpu.preprocessing.extractor import Extractor
from stamp_tpu.preprocessing.tiling import (
    MPPExtractionError,
    get_slide_mpp_,
    tiles_with_cache,
)
from stamp_tpu.preprocessing.wsi import (
    UNSUPPORTED_CONTAINER_SUFFIXES,
    UnsupportedFormatError,
    open_slide,
)
from stamp_tpu.types import (
    ImageExtension,
    Microns,
    SlideMPP,
    SlidePixels,
    TilePixels,
)
from stamp_tpu.utils import profiling
from stamp_tpu.utils.cache import get_processing_code_hash

__all__ = ["extract_", "supported_extensions"]

Image.MAX_IMAGE_PIXELS = None

supported_extensions = {
    ".czi", ".svs", ".tif", ".vms", ".vmu", ".ndpi", ".scn", ".mrxs",
    ".tiff", ".svslide", ".bif", ".qptiff",
}  # fmt: skip

_logger = logging.getLogger("stamp")

# device batch of the extraction pipeline; larger batches amortize dispatch
# and (with the matching pad floor in the extractor layer) keep one compiled
# shape — 256 is the throughput sweet spot on TPU v5e (bench.py)
_BATCH_SIZE = int(os.environ.get("STAMP_EXTRACT_BATCH", "64"))
_QUEUE_DEPTH = 4


def _slides_named_in(wsi_list: Path) -> set[str]:
    """Slide filenames from the first column of a .txt/.csv/.xls(x) worklist
    file (behavior of reference preprocessing/__init__.py:419-436).

    ``.txt`` is one *verbatim* filename per line — no delimiter, quoting or
    type inference, so names containing tabs, quotes or digits survive.
    """
    suffix = wsi_list.suffix.lower()
    if suffix == ".txt":
        lines = (line.strip() for line in wsi_list.read_text().splitlines())
        return {line for line in lines if line}

    loaders = {
        ".csv": lambda p: pd.read_csv(p, header=None),
        ".xls": lambda p: pd.read_excel(p, header=None),
        ".xlsx": lambda p: pd.read_excel(p, header=None),
    }
    loader = loaders.get(suffix)
    if loader is None:
        raise ValueError(f"Unsupported file type: {suffix}")
    try:
        table = loader(wsi_list)
    except pd.errors.EmptyDataError:
        return set()
    first_column = table.iloc[:, 0].astype(str).str.strip()
    return set(first_column[first_column != ""])


def _build_worklist(wsi_dir: Path, wsi_list: Path | None) -> list[Path]:
    """Assemble + shuffle the slide worklist.

    Shuffling lets several machines share one output directory: combined
    with skip-if-exists, concurrent jobs mostly work on different slides
    (reference preprocessing/__init__.py:269-273).  Vendor containers the
    native reader does not implement are dropped here with a named error
    rather than failing cryptically mid-decode.
    """
    if wsi_list is not None:
        candidates = [wsi_dir / name for name in _slides_named_in(wsi_list)]
    else:
        candidates = [
            p for ext in supported_extensions for p in wsi_dir.glob(f"**/*{ext}")
        ]

    readable = [
        p for p in candidates
        if p.suffix.lower() not in UNSUPPORTED_CONTAINER_SUFFIXES
    ]
    if dropped := sorted(set(candidates) - set(readable)):
        _logger.error(
            f"skipping {len(dropped)} slide(s) in unsupported container "
            f"formats {sorted({p.suffix.lower() for p in dropped})}: "
            f"{[p.name for p in dropped]} — convert to pyramidal "
            "TIFF/SVS or extract them with the reference pipeline."
        )
        if not readable:
            raise UnsupportedFormatError(
                f"every slide found in {wsi_dir} is in an unsupported "
                "container format"
            )
    if not readable:
        raise FileNotFoundError(
            f"no slides found in {wsi_dir}"
            + (" (or the wsi_list matched nothing)" if wsi_list else "")
        )

    rng = np.random.default_rng()  # deliberately unseeded: system entropy
    return [readable[i] for i in rng.permutation(len(readable))]


@dataclass(frozen=True)
class _TilingParams:
    """Host-side tiling knobs, grouped so the per-slide plumbing is one
    object instead of eight keyword arguments."""

    cache_dir: Path | None
    cache_tiles_ext: ImageExtension
    tile_size_um: Microns
    tile_size_px: TilePixels
    max_workers: int
    brightness_cutoff: int | None
    canny_cutoff: float | None
    default_slide_mpp: SlideMPP | None


def _batched_tiles(slide_path: Path, extractor: Extractor, p: _TilingParams):
    """Producer thread fills a bounded queue of (uint8 batch, coords) pairs."""
    q: queue.Queue = queue.Queue(maxsize=_QUEUE_DEPTH)
    _SENTINEL = object()
    error: list[BaseException] = []

    def _timed(iterator, name: str):
        """Attribute the generator's own time (tile decode/filter) to a stage."""
        iterator = iter(iterator)
        while True:
            with profiling.stage(name):
                try:
                    item = next(iterator)
                except StopIteration:
                    return
            yield item

    def producer() -> None:
        try:
            images: list[np.ndarray] = []
            coords: list[tuple[float, float]] = []
            for tile in _timed(tiles_with_cache(
                slide_path,
                cache_dir=p.cache_dir,
                cache_tiles_ext=p.cache_tiles_ext,
                tile_size_um=p.tile_size_um,
                tile_size_px=p.tile_size_px,
                max_supertile_size_slide_px=SlidePixels(2**10),
                max_workers=p.max_workers,
                brightness_cutoff=p.brightness_cutoff,
                canny_cutoff=p.canny_cutoff,
                default_slide_mpp=p.default_slide_mpp,
            ), "preprocess/tiling"):
                with profiling.stage("preprocess/host_transform"):
                    images.append(extractor.transform_host(tile.image))
                coords.append((float(tile.coordinates.x), float(tile.coordinates.y)))
                if len(images) == _BATCH_SIZE:
                    q.put((np.stack(images), np.array(coords, dtype=np.float32)))
                    images, coords = [], []
            if images:
                q.put((np.stack(images), np.array(coords, dtype=np.float32)))
        except BaseException as e:  # noqa: BLE001 — reraised on the consumer side
            error.append(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    thread.join()
    if error:
        raise error[0]


def _extract_slide(
    slide_path: Path,
    extractor: Extractor,
    tiling: _TilingParams,
    macenko_normalization: bool,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Run one slide through the tiling → device pipeline.

    Returns (fp16 feats, µm coords), or None when the slide yields no
    tiles.  Raises on decode/MPP failures — the caller owns the per-slide
    fail-safe.
    """
    if get_slide_mpp_(
        open_slide(slide_path), default_mpp=tiling.default_slide_mpp
    ) is None:
        raise MPPExtractionError()

    feat_batches: list[np.ndarray] = []
    coord_batches: list[np.ndarray] = []
    for batch, coords in _batched_tiles(slide_path, extractor, tiling):
        if macenko_normalization:
            import jax.numpy as jnp

            from stamp_tpu.ops.macenko import macenko_normalize

            batch = np.asarray(macenko_normalize(jnp.asarray(batch)))
        # device arrays accumulate without blocking — transfers and compute
        # of consecutive batches overlap
        with profiling.stage("preprocess/device_forward"):
            feats = extractor.forward(batch)
            if profiling.timer.enabled:
                # attribute the device wait here rather than at the h5
                # write; profiling trades away dispatch overlap
                feats = np.asarray(feats)
        feat_batches.append(feats)
        coord_batches.append(coords)

    if not feat_batches:
        return None
    fp16 = np.concatenate(
        [np.asarray(f).astype(np.float16) for f in feat_batches]
    )
    return fp16, np.concatenate(coord_batches)


def extract_(
    *,
    wsi_dir: Path,
    wsi_list: Path | None,
    output_dir: Path,
    generate_hash: bool = True,
    extractor: ExtractorName | Extractor,
    extractor_precision: str | None = None,
    tile_size_px: TilePixels,
    tile_size_um: Microns,
    default_slide_mpp: SlideMPP | None = None,
    brightness_cutoff: int | None = 240,
    canny_cutoff: float | None = 0.02,
    macenko_normalization: bool = False,
    cache_dir: Path | None,
    cache_tiles_ext: ImageExtension,
    max_workers: int,
    device: str = "auto",
) -> None:
    """Extracts features from slides, fail-safe per slide.

    ``extractor_precision`` None defers to the STAMP_INT8_EXTRACTION env
    var; an explicit "bfloat16"/"int8" from the config always wins over the
    environment.
    """
    del device  # jax picks the backend
    from stamp_tpu.preprocessing.extractor import set_int8_extraction
    from stamp_tpu.preprocessing.extractor.zoo import resolve_extractor

    if extractor_precision is not None:
        # covers the whole zoo: the ImageViT family plus the Swin / CLIP /
        # CoCa / BEiT3 / TICON towers all run W8A8 under this flag
        _logger.info(f"extractor precision pinned by config: {extractor_precision}")
        set_int8_extraction(extractor_precision == "int8")
    try:
        extractor = resolve_extractor(extractor)
    finally:
        set_int8_extraction(None)
    code_hash = get_processing_code_hash(Path(__file__))[:8]
    extractor_id = extractor.identifier
    # the extractor reports the numeric mode it actually runs in (the config
    # request is a no-op for non-ViT architectures and pre-built extractors)
    actual_precision = getattr(extractor, "precision", "bfloat16")
    _logger.info(f"Using extractor {extractor_id} ({actual_precision})")

    if cache_dir:
        cache_dir.mkdir(parents=True, exist_ok=True)

    # non-default precisions get their own artifact directory so a resumed
    # run can never silently mix numeric modes via skip-if-exists
    dir_id = extractor_id + (
        f"-{actual_precision}" if actual_precision != "bfloat16" else ""
    )
    feat_output_dir = output_dir / (
        f"{dir_id}-{code_hash}" if generate_hash else dir_id
    )

    worklist = _build_worklist(wsi_dir, wsi_list)

    # Extraction fleet: under jax.distributed each process takes a disjoint,
    # deterministic share of the worklist (no device communication — slides
    # never span hosts); skip-if-exists + atomic renames keep re-runs and
    # crashed-process pickup safe, exactly like the reference's shared-dir
    # contract but without its collision probability.
    from stamp_tpu.parallel.distributed import init_distributed, shard_worklist

    init_distributed()
    import jax

    if jax.process_count() > 1:
        worklist = shard_worklist(worklist)
        _logger.info(
            f"extraction fleet: process {jax.process_index()}/"
            f"{jax.process_count()} takes {len(worklist)} slides"
        )

    output_dir.mkdir(parents=True, exist_ok=True)
    tiling = _TilingParams(
        cache_dir=cache_dir,
        cache_tiles_ext=cache_tiles_ext,
        tile_size_um=tile_size_um,
        tile_size_px=tile_size_px,
        max_workers=max_workers,
        brightness_cutoff=brightness_cutoff,
        canny_cutoff=canny_cutoff,
        default_slide_mpp=default_slide_mpp,
    )

    n_handled = 0  # slides that produced output or were legitimately skipped
    n_unsupported = 0
    for slide_path in (progress := tqdm(worklist)):
        rel = slide_path.relative_to(wsi_dir)
        progress.set_description(str(rel))
        _logger.debug(f"processing {slide_path}")

        feature_output_path = (feat_output_dir / rel).with_suffix(".h5")
        if feature_output_path.exists():
            _logger.debug(
                f"skipping {slide_path} because {feature_output_path} already exists"
            )
            n_handled += 1
            continue

        try:
            extracted = _extract_slide(
                slide_path, extractor, tiling, macenko_normalization
            )
        except MPPExtractionError:
            _logger.exception(
                "failed to extract MPP from slide. You can try manually setting "
                "it by adding `preprocessing.default_slide_mpp = <MPP>` "
            )
            continue
        except UnsupportedFormatError as e:
            # Per-slide fail-safe (reference preprocessing/__init__.py:290-336),
            # but unsupported containers are named loudly so users learn the
            # format is the problem, not the slide contents.
            n_unsupported += 1
            _logger.error(
                f"skipping {slide_path.name}: unsupported container ({e}) — "
                "convert to pyramidal TIFF/SVS or extract it with the "
                "reference pipeline."
            )
            continue
        except Exception:
            _logger.exception(f"error while extracting features from {slide_path}")
            continue
        n_handled += 1

        if extracted is None:
            _logger.info(f"no tiles found in {slide_path}, skipping")
            continue
        feats, coords = extracted

        try:
            with profiling.stage("preprocess/h5_write"):
                write_tile_feats_atomic(
                    output_path=feature_output_path,
                    feats=feats,
                    coords_um=coords,
                    extractor_id=str(extractor_id),
                    tile_size_um=tile_size_um,
                    tile_size_px=tile_size_px,
                    code_hash=code_hash,
                    precision=(
                        actual_precision
                        if actual_precision != "bfloat16"
                        else None
                    ),
                )
        except Exception:
            _logger.exception(f"error while writing {feature_output_path}")
            continue
        _logger.debug(f"saved features to {feature_output_path}")

        _write_rejection_thumb(
            slide_path,
            thumb_path=(feat_output_dir / rel).with_suffix(".jpg"),
            coords_um=coords,
            tile_size_um=tile_size_um,
            default_slide_mpp=default_slide_mpp,
        )

    if n_unsupported and not n_handled:
        raise UnsupportedFormatError(
            f"every slide found in {wsi_dir} is in an unsupported "
            "container format"
        )


def _write_rejection_thumb(
    slide_path: Path,
    *,
    thumb_path: Path,
    coords_um: np.ndarray,
    tile_size_um: Microns,
    default_slide_mpp: SlideMPP | None,
) -> None:
    """Save a slide thumbnail with every *rejected* tile region tinted red —
    the at-a-glance QC artifact for the background/texture filters
    (behavior of reference preprocessing/__init__.py:383-416)."""
    slide = open_slide(slide_path)
    mpp = get_slide_mpp_(slide, default_mpp=default_slide_mpp)

    # grid of tile cells covering the slide; mark the kept ones
    grid_extent = np.ceil(
        np.asarray(slide.dimensions, np.float64) * mpp / tile_size_um
    ).astype(np.int64)
    kept = np.zeros((grid_extent[1], grid_extent[0]), dtype=bool)  # [gy, gx]
    cells = np.floor(coords_um / tile_size_um).astype(np.int64)
    # Tiling clips tile origins to the slide extent, so cells fit the grid;
    # guard anyway so coords from older feature files can never crash QC.
    cells = cells[(cells >= 0).all(axis=1) & (cells < grid_extent).all(axis=1)]
    kept[cells[:, 1], cells[:, 0]] = True

    # paint rejected cells as a translucent red RGBA layer over the thumb
    overlay_px = np.zeros((*kept.shape, 4), dtype=np.uint8)
    overlay_px[~kept] = (255, 0, 0, 128)
    thumb = slide.get_thumbnail((512, 512)).convert("RGBA")
    overlay = Image.fromarray(overlay_px).resize(
        thumb.size, resample=Image.Resampling.NEAREST
    )
    thumb.paste(overlay, mask=overlay)

    thumb_path.parent.mkdir(exist_ok=True, parents=True)
    thumb.convert("RGB").save(thumb_path)
