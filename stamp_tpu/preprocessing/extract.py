"""Feature-extraction driver: slides → tiles → device batches → ``.h5``.

Behavioral parity with reference src/stamp/preprocessing/__init__.py:110-380:
shuffled slide work-list (multi-machine sharing via the filesystem contract),
skip-if-h5-exists, per-slide fail-safe try/except, fp16 features with the
exact attrs set, atomic temp-file writes, rejection thumbnail JPG.

TPU-first pipeline: host tiling threads produce uint8 tile batches into a
bounded queue; the consumer runs the jitted bf16 backbone — so WSI decode,
host→HBM transfer, and MXU compute overlap (the reference pipelines these
through a single torch DataLoader worker, SURVEY.md §3.1)."""

from __future__ import annotations

import logging
import queue
import threading
from pathlib import Path
from tempfile import NamedTemporaryFile

import h5py
import numpy as np
import pandas as pd
from PIL import Image
from tqdm import tqdm

import stamp_tpu
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

_BATCH_SIZE = 64
_QUEUE_DEPTH = 4


def _get_slide_paths(wsi_list: Path) -> set[str]:
    """Filenames from the first column of a .txt/.csv/.xls(x) list
    (reference preprocessing/__init__.py:419-436)."""
    suf = wsi_list.suffix.lower()
    if suf == ".txt":
        with open(wsi_list) as f:
            return set(line.strip() for line in f if line.strip())
    elif suf == ".csv":
        df = pd.read_csv(wsi_list, header=None)
        return set(df.iloc[:, 0].astype(str))
    elif suf in [".xls", ".xlsx"]:
        df = pd.read_excel(wsi_list, header=None)
        return set(df.iloc[:, 0].astype(str))
    raise ValueError(f"Unsupported file type: {suf}")


def _batched_tiles(
    slide_path: Path,
    extractor: Extractor,
    *,
    cache_dir: Path | None,
    cache_tiles_ext: ImageExtension,
    tile_size_um: Microns,
    tile_size_px: TilePixels,
    max_workers: int,
    brightness_cutoff: int | None,
    canny_cutoff: float | None,
    default_slide_mpp: SlideMPP | None,
):
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
                cache_dir=cache_dir,
                cache_tiles_ext=cache_tiles_ext,
                tile_size_um=tile_size_um,
                tile_size_px=tile_size_px,
                max_supertile_size_slide_px=SlidePixels(2**10),
                max_workers=max_workers,
                brightness_cutoff=brightness_cutoff,
                canny_cutoff=canny_cutoff,
                default_slide_mpp=default_slide_mpp,
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


def extract_(
    *,
    wsi_dir: Path,
    output_dir: Path,
    wsi_list: Path | None,
    cache_dir: Path | None,
    cache_tiles_ext: ImageExtension,
    extractor: ExtractorName | Extractor,
    tile_size_px: TilePixels,
    tile_size_um: Microns,
    max_workers: int,
    device: str = "auto",
    default_slide_mpp: SlideMPP | None = None,
    brightness_cutoff: int | None = 240,
    canny_cutoff: float | None = 0.02,
    generate_hash: bool = True,
    macenko_normalization: bool = False,
    extractor_precision: str = "bfloat16",
) -> None:
    """Extracts features from slides, fail-safe per slide."""
    del device  # jax picks the backend
    from stamp_tpu.preprocessing.extractor import set_int8_extraction
    from stamp_tpu.preprocessing.extractor.zoo import resolve_extractor

    if extractor_precision == "int8":
        # applies to the ViT-family extractors (models/vit_image.py); other
        # architectures log nothing and stay bf16
        _logger.info("int8 (W8A8) extraction requested via config")
        set_int8_extraction(True)
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
    feat_output_dir = (
        output_dir / f"{dir_id}-{code_hash}"
        if generate_hash
        else output_dir / dir_id
    )

    if wsi_list is not None:
        slide_names = _get_slide_paths(wsi_list)
        slide_paths = [wsi_dir / slide for slide in slide_names]
    else:
        slide_paths = [
            p for ext in supported_extensions for p in wsi_dir.glob(f"**/*{ext}")
        ]

    # Fail fast (per slide, with a named error) on vendor containers the
    # native reader does not implement, instead of a cryptic decode failure
    # deep in the tiling stage.
    unsupported = [
        p for p in slide_paths
        if p.suffix.lower() in UNSUPPORTED_CONTAINER_SUFFIXES
    ]
    if unsupported:
        _logger.error(
            f"skipping {len(unsupported)} slide(s) in unsupported container "
            f"formats {sorted({p.suffix.lower() for p in unsupported})}: "
            f"{[p.name for p in unsupported]} — convert to pyramidal "
            "TIFF/SVS or extract them with the reference pipeline."
        )
        slide_paths = [p for p in slide_paths if p not in set(unsupported)]
        if not slide_paths:
            raise UnsupportedFormatError(
                f"every slide found in {wsi_dir} is in an unsupported "
                "container format"
            )
    if not slide_paths:
        raise FileNotFoundError(
            f"no slides found in {wsi_dir}"
            + (" (or the wsi_list matched nothing)" if wsi_list else "")
        )

    # Shuffle so concurrent jobs on a shared filesystem interleave
    # (reference preprocessing/__init__.py:269-273).
    rng = np.random.default_rng()
    perm = rng.permutation(len(slide_paths))
    slide_paths = [slide_paths[i] for i in perm]

    output_dir.mkdir(parents=True, exist_ok=True)

    for slide_path in (progress := tqdm(slide_paths)):
        progress.set_description(str(slide_path.relative_to(wsi_dir)))
        _logger.debug(f"processing {slide_path}")

        feature_output_path = feat_output_dir / slide_path.relative_to(
            wsi_dir
        ).with_suffix(".h5")
        if feature_output_path.exists():
            _logger.debug(
                f"skipping {slide_path} because {feature_output_path} already exists"
            )
            continue

        feature_output_path.parent.mkdir(parents=True, exist_ok=True)

        try:
            if (
                get_slide_mpp_(open_slide(slide_path), default_mpp=default_slide_mpp)
                is None
            ):
                raise MPPExtractionError()

            feats_list: list[np.ndarray] = []
            coords_list: list[np.ndarray] = []
            for batch, coords in _batched_tiles(
                slide_path,
                extractor,
                cache_dir=cache_dir,
                cache_tiles_ext=cache_tiles_ext,
                tile_size_um=tile_size_um,
                tile_size_px=tile_size_px,
                max_workers=max_workers,
                brightness_cutoff=brightness_cutoff,
                canny_cutoff=canny_cutoff,
                default_slide_mpp=default_slide_mpp,
            ):
                if macenko_normalization:
                    import jax.numpy as jnp

                    from stamp_tpu.ops.macenko import macenko_normalize

                    batch = np.asarray(macenko_normalize(jnp.asarray(batch)))
                # device arrays accumulate without blocking — transfers and
                # compute of consecutive batches overlap
                with profiling.stage("preprocess/device_forward"):
                    feats = extractor.forward(batch)
                    if profiling.timer.enabled:
                        # attribute the device wait here rather than at the
                        # h5 write; profiling trades away dispatch overlap
                        feats = np.asarray(feats)
                    feats_list.append(feats)
                coords_list.append(coords)
        except MPPExtractionError:
            _logger.exception(
                "failed to extract MPP from slide. You can try manually setting "
                "it by adding `preprocessing.default_slide_mpp = <MPP>` "
            )
            continue
        except Exception:
            _logger.exception(f"error while extracting features from {slide_path}")
            continue

        if len(feats_list) == 0:
            _logger.info(f"no tiles found in {slide_path}, skipping")
            continue

        coords = np.concatenate(coords_list)

        with profiling.stage("preprocess/h5_write"), NamedTemporaryFile(
            dir=output_dir, delete=False
        ) as tmp_h5_file:
            try:
                with h5py.File(tmp_h5_file.name, "w") as h5_fp:
                    h5_fp["coords"] = coords
                    h5_fp["feats"] = np.concatenate(
                        [np.asarray(f).astype(np.float16) for f in feats_list]
                    )
                    h5_fp.attrs["stamp_version"] = stamp_tpu.__version__
                    h5_fp.attrs["extractor"] = str(extractor_id)
                    h5_fp.attrs["unit"] = "um"
                    h5_fp.attrs["tile_size_um"] = tile_size_um
                    h5_fp.attrs["tile_size_px"] = tile_size_px
                    h5_fp.attrs["code_hash"] = code_hash
                    h5_fp.attrs["feat_type"] = "tile"
                    if actual_precision != "bfloat16":
                        # provenance: features from a non-default numeric mode
                        h5_fp.attrs["precision"] = actual_precision
            except Exception:
                _logger.exception(f"error while writing {feature_output_path}")
                Path(tmp_h5_file.name).unlink(missing_ok=True)
                continue

            Path(tmp_h5_file.name).rename(feature_output_path)
            _logger.debug(f"saved features to {feature_output_path}")

        thumbnail_path = feat_output_dir / slide_path.relative_to(wsi_dir).with_suffix(
            ".jpg"
        )
        thumbnail_path.parent.mkdir(exist_ok=True, parents=True)
        _get_rejection_thumb(
            open_slide(slide_path),
            size=(512, 512),
            coords_um=coords,
            tile_size_um=tile_size_um,
            default_slide_mpp=default_slide_mpp,
        ).convert("RGB").save(thumbnail_path)


def _get_rejection_thumb(
    slide,
    *,
    size: tuple[int, int],
    coords_um: np.ndarray,
    tile_size_um: Microns,
    default_slide_mpp: SlideMPP | None,
) -> Image.Image:
    """Thumbnail with rejected regions tinted red
    (reference preprocessing/__init__.py:383-416)."""
    inclusion_map = np.zeros(
        np.uint32(
            np.ceil(
                np.array(slide.dimensions)
                * get_slide_mpp_(slide, default_mpp=default_slide_mpp)
                / tile_size_um
            )
        ),
        dtype=bool,
    )
    tile_indices = np.floor(coords_um / tile_size_um).astype(np.uint32)
    inclusion_map[tile_indices[:, 0], tile_indices[:, 1]] = True

    thumb = slide.get_thumbnail(size).convert("RGBA")
    discarded_im = Image.fromarray(
        np.where(
            inclusion_map.transpose()[:, :, None], [0, 0, 0, 0], [255, 0, 0, 128]
        ).astype(np.uint8)
    ).resize(thumb.size, resample=Image.Resampling.NEAREST)
    thumb.paste(discarded_im, mask=discarded_im)
    return thumb
