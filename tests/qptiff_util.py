"""Synthetic Akoya/PerkinElmer QPTIFF fixtures.

Layout follows Akoya's published QPTIFF structure: every directory carries
a ``<PerkinElmer-QPI-ImageDescription>`` document whose ``<ImageType>``
classifies it (FullResolution / ReducedResolution / Thumbnail / Overview /
Label).  Brightfield exports store one RGB directory per level; multiplexed
immunofluorescence exports store one same-sized grayscale directory per
band at each level — the contract native/qptiff.cpp implements.
"""

import numpy as np

from scn_util import _TiffBuilder, _downsample2


def qpi_xml(image_type: str, name: str | None = None) -> str:
    band = f"<Name>{name}</Name>" if name else ""
    return (
        "<?xml version=\"1.0\" encoding=\"utf-8\"?>"
        "<PerkinElmer-QPI-ImageDescription>"
        "<DescriptionVersion>2</DescriptionVersion>"
        "<AcquisitionSoftware>VectraScan</AcquisitionSoftware>"
        f"<ImageType>{image_type}</ImageType>{band}"
        "</PerkinElmer-QPI-ImageDescription>"
    )


def write_qptiff_brightfield(
    path, arr: np.ndarray, *, mpp: float = 0.5
) -> None:
    """Brightfield RGB QPTIFF: full-res, thumbnail, one reduced level,
    overview + label auxiliaries."""
    res = 10000.0 / mpp  # px per cm
    b = _TiffBuilder()
    b.add_dir(
        arr, description=qpi_xml("FullResolution"), resolution_px_per_cm=res
    )
    # the thumbnail is a resampled capture with the SAME aspect as the
    # pyramid — only the ImageType marker can exclude it
    thumb = arr[:: arr.shape[0] // 16 or 1, :: arr.shape[1] // 16 or 1][
        :16, :16
    ]
    b.add_dir(np.ascontiguousarray(thumb), description=qpi_xml("Thumbnail"))
    b.add_dir(
        _downsample2(arr),
        description=qpi_xml("ReducedResolution"),
        resolution_px_per_cm=res / 2,
    )
    b.add_dir(
        np.full((20, 40, 3), 190, np.uint8), description=qpi_xml("Overview")
    )
    b.add_dir(
        np.full((24, 24, 3), 120, np.uint8), description=qpi_xml("Label")
    )
    b.write(path)


def write_qptiff_multiplexed(path, h: int = 64, w: int = 64) -> None:
    """Multiplexed IF QPTIFF: three grayscale FullResolution bands followed
    by a thumbnail — the layout the backend must refuse loudly."""
    rng = np.random.default_rng(7)
    b = _TiffBuilder()
    for band in ("DAPI", "FITC", "CY3"):
        b.add_dir(
            rng.integers(0, 255, (h, w), dtype=np.uint8).astype(np.uint8),
            description=qpi_xml("FullResolution", name=band),
        )
    b.add_dir(
        np.full((16, 16, 3), 10, np.uint8), description=qpi_xml("Thumbnail")
    )
    b.write(path)
