"""Tiling engine: foreground grid, supertile reads, texture rejection, cache.

Behavioral parity with reference src/stamp/preprocessing/tiling.py: MPP
extraction cascade, brightness-thumbnail foreground grid, thread-pooled
"supertile" batched reads (1024 slide-px default), crop into tiles,
Canny-edge texture filter, zip-based tile cache keyed on
sha256(params + code hash) with atomic temp-file renames.

TPU-era changes:
  * slide decoding goes through the native libtiff reader
    (stamp_tpu/preprocessing/wsi.py); each worker thread holds its own
    reader handle (libtiff handles are not thread safe).
  * the tile iterator can also emit raw uint8 numpy arrays so the extraction
    driver can assemble device batches without a PIL round-trip.
"""

from __future__ import annotations

import hashlib
import json
import logging
import re
import threading
from collections.abc import Iterator
from concurrent import futures
from dataclasses import dataclass
from pathlib import Path
from tempfile import NamedTemporaryFile
from typing import Final, Generic, NamedTuple, TypedDict, TypeVar, cast
from zipfile import ZipFile

import cv2
import numpy as np
from PIL import Image

from stamp_tpu.preprocessing.wsi import (
    CTiffSlide,
    ImageSlide,
    MPPExtractionError,
    get_slide_mpp_,
    open_slide,
)
from stamp_tpu.types import (
    EXTENSION_TO_FORMAT,
    ImageExtension,
    Microns,
    SlideMPP,
    SlidePixels,
    TilePixels,
)

__all__ = [
    "tiles_with_cache",
    "get_slide_mpp_",
    "MPPExtractionError",
]

_logger = logging.getLogger("stamp")

# Digest of _this_ file: identifies the tiling procedure in cache keys so a
# change in rejection logic invalidates caches (reference tiling.py:43-46).
with open(__file__, "rb") as _this_file_fp:
    _CODE_HASH: Final[str] = hashlib.file_digest(_this_file_fp, "sha256").hexdigest()

_Unit = TypeVar("_Unit")


@dataclass
class _XYCoords(Generic[_Unit]):
    x: _Unit
    y: _Unit


class _Tile(NamedTuple, Generic[_Unit]):
    """A tile with associated metadata."""

    image: Image.Image
    coordinates: _XYCoords[_Unit]
    size: _Unit


class _TilerParams(TypedDict):
    """The parameters used during tiling / background rejection.

    Key set identical to the reference (tiling.py:356-377) so cache zips are
    structurally interchangeable (the code hash inside necessarily differs).
    """

    slide_path: str
    tile_size_um: Microns
    tile_size_px: TilePixels
    max_supertile_size_slide_px: SlidePixels
    brightness_cutoff: int | None
    code_sha256: str
    tile_ext: ImageExtension


def _has_enough_texture(tile: Image.Image, cutoff: float) -> bool:
    """True if the tile has enough edges to plausibly contain tissue
    (reference tiling.py:280-291; same hardcoded Canny thresholds)."""
    tile_grayscale = np.array(tile.convert("L"))
    edges = cv2.Canny(tile_grayscale, 40, 100)
    edge_score = edges.mean() / 255
    return bool(edge_score >= cutoff)


def _foreground_coords(
    slide,
    tile_size_slide_px: SlidePixels,
    brightness_cutoff: int | None,
) -> Iterator[_XYCoords[SlidePixels]]:
    """Coordinates of supertiles that aren't too bright
    (reference tiling.py:250-277)."""
    supertile_thumb_size = np.ceil(
        np.array(slide.dimensions) / tile_size_slide_px
    ).astype(np.uint32)
    thumb_grayscale = np.array(
        slide.get_thumbnail(tuple(supertile_thumb_size.astype(np.uint32) * 2))
        .resize(tuple(supertile_thumb_size))
        .convert("I")
    )
    is_foreground = (
        thumb_grayscale < brightness_cutoff
        if brightness_cutoff is not None
        else np.full_like(thumb_grayscale, True, dtype=bool)
    )

    for y_slide_px in range(0, slide.dimensions[1], tile_size_slide_px):
        for x_slide_px in range(0, slide.dimensions[0], tile_size_slide_px):
            if is_foreground[
                y_slide_px // tile_size_slide_px, x_slide_px // tile_size_slide_px
            ]:
                yield _XYCoords(SlidePixels(x_slide_px), SlidePixels(y_slide_px))


class _ThreadLocalSlide:
    """One reader handle per worker thread (libtiff isn't thread safe)."""

    def __init__(self, slide_path: Path, shared_slide) -> None:
        self._path = slide_path
        self._shared = shared_slide
        self._local = threading.local()

    def get(self):
        if isinstance(self._shared, ImageSlide):
            # PIL crops are cheap and effectively read-only; share it.
            return self._shared
        slide = getattr(self._local, "slide", None)
        if slide is None:
            slide = CTiffSlide(self._path)
            self._local.slide = slide
        return slide


def _supertiles(
    slide_path: Path,
    slide,
    *,
    tile_size_um: Microns,
    tile_size_px: TilePixels,
    max_supertile_size_slide_px: SlidePixels,
    max_workers: int,
    brightness_cutoff: int | None,
    default_slide_mpp: SlideMPP | None,
) -> Iterator[_Tile[Microns]]:
    """Thread-pooled supertile reads (reference tiling.py:294-347)."""
    slide_mpp = cast(SlideMPP, get_slide_mpp_(slide, default_mpp=default_slide_mpp))

    max_supertile_um = max_supertile_size_slide_px * slide_mpp
    len_of_supertile_in_tiles = max(int(max_supertile_um // tile_size_um), 1)

    tile_size_slide_px = int(np.ceil(tile_size_um / slide_mpp))
    supertile_size_slide_px = SlidePixels(
        tile_size_slide_px * len_of_supertile_in_tiles
    )
    supertile_size_tile_px = TilePixels(tile_size_px * len_of_supertile_in_tiles)
    supertile_size_um = Microns(supertile_size_slide_px * slide_mpp)

    tl_slide = _ThreadLocalSlide(slide_path, slide)

    def read_supertile(x_slide_px: int, y_slide_px: int) -> _Tile[Microns]:
        region = (
            tl_slide.get()
            .read_region(
                (x_slide_px, y_slide_px),
                0,
                (supertile_size_slide_px, supertile_size_slide_px),
            )
            .resize((supertile_size_tile_px, supertile_size_tile_px))
            .convert("RGB")
        )
        return _Tile(
            image=region,
            coordinates=_XYCoords(
                x=Microns(x_slide_px * slide_mpp),
                y=Microns(y_slide_px * slide_mpp),
            ),
            size=supertile_size_um,
        )

    with futures.ThreadPoolExecutor(max_workers) as executor:
        futs = [
            executor.submit(read_supertile, coords.x, coords.y)
            for coords in _foreground_coords(
                slide=slide,
                tile_size_slide_px=supertile_size_slide_px,
                brightness_cutoff=brightness_cutoff,
            )
        ]
        for future in futures.as_completed(futs):
            yield future.result()


def _tiles(
    slide_path: Path,
    slide,
    *,
    tile_size_um: Microns,
    tile_size_px: TilePixels,
    max_supertile_size_slide_px: SlidePixels,
    max_workers: int,
    brightness_cutoff: int | None,
    default_slide_mpp: SlideMPP | None,
) -> Iterator[_Tile[Microns]]:
    """Crop supertiles into tiles (reference tiling.py:196-247).

    Unlike the reference, tiles whose origin lies past the slide extent are
    dropped here instead of being emitted as 100%-padding images: the
    reference relies on the canny filter to reject them (black padding has
    no edges), which silently breaks when ``canny_cutoff`` is disabled and
    crashes its rejection-thumbnail grid (`_get_rejection_thumb`,
    reference preprocessing/__init__.py:395-407 — floor(coords/tile) indexes
    past the ceil-sized inclusion map).  Partial edge tiles (origin inside
    the slide) are kept, matching the reference.
    """
    slide_mpp = get_slide_mpp_(slide, default_mpp=default_slide_mpp)
    slide_extent_um = (
        float(slide.dimensions[0]) * slide_mpp,
        float(slide.dimensions[1]) * slide_mpp,
    )
    for supertile, supertile_coords_um, supertile_size_um in _supertiles(
        slide_path,
        slide,
        tile_size_um=tile_size_um,
        tile_size_px=tile_size_px,
        max_supertile_size_slide_px=max_supertile_size_slide_px,
        max_workers=max_workers,
        brightness_cutoff=brightness_cutoff,
        default_slide_mpp=default_slide_mpp,
    ):
        assert supertile.size[0] == supertile.size[1], "supertile needs to be square"
        assert supertile.size[0] % tile_size_px == 0, (
            "supertile needs to perfectly divide into tiles"
        )
        no_tiles = supertile.size[0] // tile_size_px
        assert round(supertile_size_um / no_tiles - tile_size_um) == 0

        for y in range(0, no_tiles):
            y_um = supertile_coords_um.y + y * tile_size_um
            if y_um >= slide_extent_um[1]:
                break  # fully-padded rows below the slide
            for x in range(0, no_tiles):
                x_um = supertile_coords_um.x + x * tile_size_um
                if x_um >= slide_extent_um[0]:
                    break  # fully-padded columns right of the slide
                tile = supertile.crop(
                    (
                        x * tile_size_px,
                        y * tile_size_px,
                        (x + 1) * tile_size_px,
                        (y + 1) * tile_size_px,
                    )
                )
                yield _Tile(
                    image=tile,
                    coordinates=_XYCoords(
                        x=Microns(x_um),
                        y=Microns(y_um),
                    ),
                    size=tile_size_um,
                )


def _tiles_with_tissue(
    slide_path: Path,
    slide,
    *,
    tile_size_um: Microns,
    tile_size_px: TilePixels,
    max_supertile_size_slide_px: SlidePixels,
    max_workers: int,
    brightness_cutoff: int | None,
    canny_cutoff: float | None,
    default_slide_mpp: SlideMPP | None,
) -> Iterator[_Tile[Microns]]:
    for tile in _tiles(
        slide_path,
        slide,
        tile_size_um=tile_size_um,
        tile_size_px=tile_size_px,
        max_supertile_size_slide_px=max_supertile_size_slide_px,
        max_workers=max_workers,
        brightness_cutoff=brightness_cutoff,
        default_slide_mpp=default_slide_mpp,
    ):
        if canny_cutoff is None or _has_enough_texture(tile.image, cutoff=canny_cutoff):
            yield tile


def _tiles_from_cache_file(cache_file_path: Path) -> Iterator[_Tile]:
    """Replay tiles from a cache zip (reference tiling.py:380-406)."""
    with ZipFile(cache_file_path, "r") as zip_fp:
        tiler_params: _TilerParams = json.loads(
            zip_fp.read("tiler_params.json").decode()
        )
        cache_tiles_ext = tiler_params.get("tile_ext", "jpg")
        for name in zip_fp.namelist():
            match = re.match(
                rf"tile_\((\d+\.\d+), (\d+\.\d+)\).{cache_tiles_ext}", name
            )
            if match is None:
                continue
            x_um_str, y_um_str = match.groups()
            x_um, y_um = Microns(float(x_um_str)), Microns(float(y_um_str))
            with zip_fp.open(name, "r") as tile_fp:
                img = Image.open(tile_fp)
                img.load()
                yield _Tile(
                    image=img,
                    coordinates=_XYCoords(x_um, y_um),
                    size=tiler_params["tile_size_um"],
                )


def tiles_with_cache(
    slide_path: Path,
    *,
    cache_dir: Path | None,
    cache_tiles_ext: ImageExtension,
    tile_size_um: Microns,
    tile_size_px: TilePixels,
    max_supertile_size_slide_px: SlidePixels,
    max_workers: int,
    brightness_cutoff: int | None,
    canny_cutoff: float | None,
    default_slide_mpp: SlideMPP | None,
) -> Iterator[_Tile[Microns]]:
    """Iterate over tissue tiles, using / filling the zip cache
    (reference tiling.py:68-168)."""
    if cache_dir is None:
        yield from _tiles_with_tissue(
            slide_path,
            open_slide(slide_path),
            tile_size_um=tile_size_um,
            tile_size_px=tile_size_px,
            max_supertile_size_slide_px=max_supertile_size_slide_px,
            max_workers=max_workers,
            brightness_cutoff=brightness_cutoff,
            canny_cutoff=canny_cutoff,
            default_slide_mpp=default_slide_mpp,
        )
        return

    tiler_params: _TilerParams = {
        "slide_path": str(slide_path),
        "tile_size_um": tile_size_um,
        "tile_size_px": tile_size_px,
        "max_supertile_size_slide_px": max_supertile_size_slide_px,
        "brightness_cutoff": brightness_cutoff,
        "code_sha256": _CODE_HASH,
        "tile_ext": cache_tiles_ext,
    }
    tiler_params_hash = hashlib.sha256(
        json.dumps(tiler_params, sort_keys=True).encode()
    ).hexdigest()
    cache_file_path = (
        cache_dir / slide_path.with_suffix(f".{tiler_params_hash}.zip").name
    )
    if cache_file_path.exists():
        yield from _tiles_from_cache_file(cache_file_path)
    else:
        # atomic cache write: temp file renamed at the end
        with (
            NamedTemporaryFile(
                dir=cache_file_path.parent, delete=False
            ) as tmp_cache_file,
            ZipFile(tmp_cache_file.name, "w") as zip,
        ):
            try:
                with zip.open("tiler_params.json", "w") as params_fp:
                    params_fp.write(json.dumps(tiler_params).encode())

                for tile in _tiles_with_tissue(
                    slide_path,
                    open_slide(slide_path),
                    tile_size_um=tile_size_um,
                    tile_size_px=tile_size_px,
                    max_supertile_size_slide_px=max_supertile_size_slide_px,
                    max_workers=max_workers,
                    brightness_cutoff=brightness_cutoff,
                    canny_cutoff=canny_cutoff,
                    default_slide_mpp=default_slide_mpp,
                ):
                    with zip.open(
                        f"tile_({float(tile.coordinates.x)}, "
                        f"{float(tile.coordinates.y)}).{cache_tiles_ext}",
                        "w",
                    ) as tile_zip_fp:
                        tile.image.save(
                            tile_zip_fp,
                            format=EXTENSION_TO_FORMAT[cache_tiles_ext],
                            **(
                                dict(icc_profile=None)
                                if cache_tiles_ext == "png"
                                else {}
                            ),
                        )
                    yield tile
            except Exception as e:
                _logger.exception(f"error while processing {slide_path}")
                Path(tmp_cache_file.name).unlink(missing_ok=True)
                raise e

            Path(tmp_cache_file.name).rename(cache_file_path)
