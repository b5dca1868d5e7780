"""Synthetic Ventana BIF fixture.

A (classic) TIFF shaped like a Roche/Ventana iScan export: directory 0 is
the full-resolution image whose ImageDescription carries the `iScan`
scanner XML (ScanRes = µm/px) plus the Ventana "level=0" marker, followed
by pyramid levels with "level=N" descriptions and named auxiliary images
(Thumbnail / Label) that readers must exclude — the contract
native/bif.cpp implements.
"""

import numpy as np

from scn_util import _TiffBuilder, _downsample2


def iscan_xml(
    mpp: float = 0.46,
    magnification: int = 20,
    n_aois: int = 1,
    overlap: float = 0.0,
) -> str:
    aois = "".join(
        f'<AOIScanned AreaIndex="{i}" OverlapX="{overlap}" OverlapY="{overlap}"/>'
        for i in range(n_aois)
    )
    return (
        f'<iScan ScanRes="{mpp}" Magnification="{magnification}" '
        f'UnitNumber="1" BuildVersion="3.1.0">'
        f"<SlideStitchInfo>{aois}</SlideStitchInfo></iScan>"
    )


def write_bif(
    path,
    arr: np.ndarray,
    *,
    mpp: float = 0.46,
    n_aois: int = 1,
    overlap: float = 0.0,
) -> None:
    b = _TiffBuilder()
    xml = iscan_xml(mpp=mpp, n_aois=n_aois, overlap=overlap)
    b.add_dir(arr, description=xml + " level=0 mag=20")
    b.add_dir(_downsample2(arr), description="level=1 mag=10")
    b.add_dir(
        np.full((32, 32, 3), 200, np.uint8), description="Thumbnail"
    )
    b.add_dir(
        np.full((24, 24, 3), 180, np.uint8), description="Label Image"
    )
    b.write(path)
