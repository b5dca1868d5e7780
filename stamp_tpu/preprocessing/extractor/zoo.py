"""Extractor factories for the foundation-model zoo.

One factory per ``ExtractorName`` (reference preprocessing/__init__.py:137-241
dispatch).  Most models are instances of the shared ``ImageViT`` with
per-model configs and weight-file hints; CTransPath/CHIEF use the Swin
backbone (models/swin.py), PLIP/KEEP the CLIP tower (models/clip_vision.py),
CONCH the CoCa tower (models/coca.py), MUSK the BEiT3 tower
(models/beit3.py), TICON the contextualizer (extractor/ticon.py).
"""

from __future__ import annotations

from stamp_tpu.preprocessing.config import ExtractorName
from stamp_tpu.preprocessing.extractor import Extractor, make_vit_extractor


def uni() -> Extractor:
    """MahmoodLab UNI (reference extractor/uni.py:24-37)."""
    return make_vit_extractor(
        identifier="uni",
        arch="uni",
        weight_files=["*uni*pytorch_model.bin", "uni.bin", "*UNI*.bin"],
    )


def uni2() -> Extractor:
    """MahmoodLab UNI2-h (reference extractor/uni2.py:20-46)."""
    return make_vit_extractor(
        identifier="uni2",
        arch="uni2",
        weight_files=["*uni2*pytorch_model.bin", "*UNI2*.bin", "*uni2*.safetensors"],
    )


def virchow() -> Extractor:
    """Paige Virchow, CLS token only (reference extractor/virchow.py)."""
    return make_vit_extractor(
        identifier="virchow",
        arch="virchow",
        weight_files=["*virchow*.safetensors", "*Virchow*.bin"],
        pool="token",
    )


def virchow2() -> Extractor:
    """Paige Virchow2, CLS token only (reference extractor/virchow2.py:29-30)."""
    return make_vit_extractor(
        identifier="virchow2",
        arch="virchow2",
        weight_files=["*virchow2*.safetensors", "*Virchow2*.bin"],
        pool="token",
    )


def virchow_full() -> Extractor:
    """Virchow CLS ⧺ mean(patch tokens), 2560-d — required by PRISM
    (reference extractor/virchow_full.py)."""
    return make_vit_extractor(
        identifier="virchow-full",
        arch="virchow",
        weight_files=["*virchow*.safetensors", "*Virchow*.bin"],
        pool="token_avg_concat",
    )


def h_optimus_0() -> Extractor:
    """Bioptimus H-Optimus-0 (reference extractor/h_optimus_0.py)."""
    return make_vit_extractor(
        identifier="h-optimus-0",
        arch="h_optimus",
        weight_files=["*h-optimus-0*.safetensors", "*h_optimus_0*.bin"],
    )


def h_optimus_1() -> Extractor:
    """Bioptimus H-Optimus-1 (reference extractor/h_optimus_1.py)."""
    return make_vit_extractor(
        identifier="h-optimus-1",
        arch="h_optimus",
        weight_files=["*h-optimus-1*.safetensors", "*h_optimus_1*.bin"],
    )


def gigapath() -> Extractor:
    """Prov-GigaPath tile encoder (reference extractor/gigapath.py)."""
    return make_vit_extractor(
        identifier="gigapath",
        arch="gigapath",
        weight_files=["*gigapath*.bin", "*prov-gigapath*.safetensors"],
    )


def dino_bloom() -> Extractor:
    """DinoBloom-S (dinov2-small, hematology; reference extractor/dinobloom.py)."""
    return make_vit_extractor(
        identifier="dino-bloom",
        arch="dino_vits14",
        weight_files=["*dinobloom*.pth", "*DinoBloom*.pth"],
    )


def red_dino() -> Extractor:
    """RedDino-large — dinov2 ViT-L/14, CLS only (reference extractor/
    reddino.py:40-45)."""
    return make_vit_extractor(
        identifier="red-dino",
        arch="dino_vitl14",
        weight_files=["*reddino*.pth", "*RedDino*.safetensors"],
    )


def mstar() -> Extractor:
    """mSTAR ViT-L (reference extractor/mstar.py)."""
    return make_vit_extractor(
        identifier="mstar",
        arch="uni",  # ViT-L/16 like UNI
        weight_files=["*mSTAR*.bin", "*mstar*.safetensors"],
    )


def ctranspath() -> Extractor:
    """CTransPath Swin-T with conv stem (reference extractor/ctranspath.py)."""
    from stamp_tpu.preprocessing.extractor.swin import make_ctranspath_extractor

    return make_ctranspath_extractor(identifier="ctranspath")


def chief_ctranspath() -> Extractor:
    """CHIEF-finetuned CTransPath (reference extractor/chief_ctranspath.py)."""
    from stamp_tpu.preprocessing.extractor.swin import make_ctranspath_extractor

    return make_ctranspath_extractor(
        identifier="chief-ctranspath", weight_hint="chief"
    )


def conch() -> Extractor:
    """CONCH CoCa vision branch, unprojected pooled embedding
    (reference extractor/conch.py:23-41)."""
    from stamp_tpu.preprocessing.extractor.coca_beit3 import make_conch_extractor

    return make_conch_extractor("conch", "conch")


def conch1_5() -> Extractor:
    """CONCH v1.5 — TITAN's tile encoder (reference extractor/conch1_5.py)."""
    from stamp_tpu.preprocessing.extractor.coca_beit3 import make_conch_extractor

    return make_conch_extractor("conch1_5", "conch1_5")


def musk() -> Extractor:
    """MUSK BEiT3-L vision path, two-scale (reference extractor/musk.py)."""
    from stamp_tpu.preprocessing.extractor.coca_beit3 import make_musk_extractor

    return make_musk_extractor("musk")


def plip() -> Extractor:
    """PLIP CLIP ViT-B/32 image features (reference extractor/plip.py)."""
    from stamp_tpu.preprocessing.extractor.clip_like import make_plip_extractor

    return make_plip_extractor(identifier="plip")


def keep() -> Extractor:
    """KEEP ViT-L + projection head (reference extractor/keep.py)."""
    from stamp_tpu.preprocessing.extractor.clip_like import make_keep_extractor

    return make_keep_extractor(identifier="keep")


def ticon() -> Extractor:
    """H-Optimus-1 → TICON contextualizer (reference extractor/ticon.py)."""
    from stamp_tpu.preprocessing.extractor.ticon import make_ticon_extractor

    return make_ticon_extractor(identifier="ticon")


def resolve_extractor(name: "ExtractorName | Extractor") -> Extractor:
    """ExtractorName → Extractor (reference preprocessing/__init__.py:137-241)."""
    if isinstance(name, Extractor):
        return name

    from stamp_tpu.preprocessing.extractor.empty import empty

    factories = {
        ExtractorName.CTRANSPATH: ctranspath,
        ExtractorName.CHIEF_CTRANSPATH: chief_ctranspath,
        ExtractorName.CONCH: conch,
        ExtractorName.CONCH1_5: conch1_5,
        ExtractorName.UNI: uni,
        ExtractorName.UNI2: uni2,
        ExtractorName.DINO_BLOOM: dino_bloom,
        ExtractorName.RED_DINO: red_dino,
        ExtractorName.VIRCHOW: virchow,
        ExtractorName.VIRCHOW_FULL: virchow_full,
        ExtractorName.VIRCHOW2: virchow2,
        ExtractorName.H_OPTIMUS_0: h_optimus_0,
        ExtractorName.H_OPTIMUS_1: h_optimus_1,
        ExtractorName.GIGAPATH: gigapath,
        ExtractorName.MUSK: musk,
        ExtractorName.MSTAR: mstar,
        ExtractorName.PLIP: plip,
        ExtractorName.KEEP: keep,
        ExtractorName.TICON: ticon,
        ExtractorName.EMPTY: empty,
    }
    return factories[ExtractorName(name)]()
