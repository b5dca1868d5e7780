"""Slide/patient encoder tests with synthetic tile features of the right
extractor (coverage mirroring reference tests/test_encoders.py)."""

import h5py
import numpy as np
import pandas as pd
import pytest

import stamp_tpu
from stamp_tpu.encoding.encoder import _resolve_extractor_name
from stamp_tpu.io.h5 import detect_feature_type


def _write_tile_h5(path, n_tiles, dim, extractor):
    rng = np.random.default_rng(abs(hash(path.name)) % 2**32)
    coords = (
        np.stack(
            np.meshgrid(np.arange(8), np.arange((n_tiles + 7) // 8), indexing="ij"),
            axis=-1,
        ).reshape(-1, 2)[:n_tiles]
        * 256.0
    )
    with h5py.File(path, "w") as h5:
        h5["feats"] = rng.normal(size=(n_tiles, dim)).astype(np.float32)
        h5["coords"] = coords.astype(np.float32)
        h5.attrs["stamp_version"] = stamp_tpu.__version__
        h5.attrs["extractor"] = extractor
        h5.attrs["unit"] = "um"
        h5.attrs["tile_size_um"] = 256.0
        h5.attrs["tile_size_px"] = 224
        h5.attrs["feat_type"] = "tile"
    return coords


def test_resolve_extractor_name():
    assert _resolve_extractor_name("ctranspath") == "ctranspath"
    assert _resolve_extractor_name("ctranspath-24c6b159") == "ctranspath"
    assert _resolve_extractor_name("chief-ctranspath") == "chief-ctranspath"
    assert _resolve_extractor_name("chief-ctranspath-deadbeef") == "chief-ctranspath"


def test_chief_encoder_slides(tmp_path, monkeypatch):
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.encoding.encoder.chief import CHIEF

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(3):
        _write_tile_h5(feat_dir / f"slide{i}.h5", 30 + i, 768, "chief-ctranspath")

    enc = CHIEF()
    enc.encode_slides_(
        output_dir=tmp_path / "out", feat_dir=feat_dir, generate_hash=False
    )

    out_dir = tmp_path / "out" / "chief-slide"
    outs = sorted(out_dir.glob("*.h5"))
    assert len(outs) == 3
    with h5py.File(outs[0]) as h5:
        feats = np.asarray(h5["feats"])
        assert feats.shape == (768,)
        assert h5.attrs["encoder"] == "chief"
        assert h5.attrs["feat_type"] == "slide"
    assert detect_feature_type(out_dir) == "slide"

    # skip-if-exists idempotency
    enc.encode_slides_(
        output_dir=tmp_path / "out", feat_dir=feat_dir, generate_hash=False
    )


def test_chief_encoder_rejects_wrong_extractor(tmp_path, monkeypatch):
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.encoding.encoder.chief import CHIEF

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    _write_tile_h5(feat_dir / "slide0.h5", 20, 768, "uni2")

    enc = CHIEF()
    enc.encode_slides_(
        output_dir=tmp_path / "out", feat_dir=feat_dir, generate_hash=False
    )
    assert len(list((tmp_path / "out").rglob("*.h5"))) == 0  # rejected


def test_chief_encoder_patients(tmp_path, monkeypatch):
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.encoding.encoder.chief import CHIEF

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(4):
        _write_tile_h5(feat_dir / f"slide{i}.h5", 25, 768, "chief-ctranspath")

    slide_table = tmp_path / "slide.csv"
    pd.DataFrame(
        {
            "PATIENT": ["p1", "p1", "p2", "p2"],
            "FILENAME": [f"slide{i}.h5" for i in range(4)],
        }
    ).to_csv(slide_table, index=False)

    enc = CHIEF()
    enc.encode_patients_(
        output_dir=tmp_path / "out",
        feat_dir=feat_dir,
        slide_table_path=slide_table,
        patient_label="PATIENT",
        filename_label="FILENAME",
        generate_hash=False,
    )
    outs = sorted((tmp_path / "out" / "chief-pat").glob("*.h5"))
    assert [p.stem for p in outs] == ["p1", "p2"]
    assert detect_feature_type(tmp_path / "out" / "chief-pat") == "patient"


def test_eagle_encoder(tmp_path, monkeypatch):
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.encoding.encoder.eagle import Eagle

    ctp_dir = tmp_path / "ctp"
    vir_dir = tmp_path / "vir"
    ctp_dir.mkdir()
    vir_dir.mkdir()
    for i in range(2):
        coords = _write_tile_h5(ctp_dir / f"s{i}.h5", 40, 768, "ctranspath")
        # virchow2 feats with permuted coords → exercises the alignment fix
        rng = np.random.default_rng(i)
        perm = rng.permutation(40)
        with h5py.File(vir_dir / f"s{i}.h5", "w") as h5:
            h5["feats"] = rng.normal(size=(40, 1280)).astype(np.float32)
            h5["coords"] = coords[perm].astype(np.float32)
            h5.attrs["stamp_version"] = stamp_tpu.__version__
            h5.attrs["extractor"] = "virchow2"
            h5.attrs["unit"] = "um"
            h5.attrs["tile_size_um"] = 256.0
            h5.attrs["tile_size_px"] = 224
            h5.attrs["feat_type"] = "tile"

    enc = Eagle()
    enc.encode_slides_(
        output_dir=tmp_path / "out",
        feat_dir=ctp_dir,
        agg_feat_dir=vir_dir,
        generate_hash=False,
    )
    outs = sorted((tmp_path / "out" / "eagle-slide").glob("*.h5"))
    assert len(outs) == 2
    with h5py.File(outs[0]) as h5:
        assert np.asarray(h5["feats"]).shape == (1280,)  # virchow2 dim
        assert h5.attrs["encoder"] == "eagle"


def test_encoders_without_weights_raise_with_guidance(monkeypatch):
    """Without pre-seeded weights (and without STAMP_RANDOM_WEIGHTS) the
    architecture-port encoders must fail fast with a named error."""
    monkeypatch.delenv("STAMP_RANDOM_WEIGHTS", raising=False)
    monkeypatch.setenv("STAMP_WEIGHTS_DIR", "/nonexistent")
    monkeypatch.setenv("XDG_CACHE_HOME", "/nonexistent")
    monkeypatch.setenv("HF_HOME", "/nonexistent")
    from stamp_tpu.encoding.init import _resolve

    for name in ("titan", "gigapath", "prism", "madeleine"):
        with pytest.raises(FileNotFoundError, match="STAMP_RANDOM_WEIGHTS"):
            _resolve(name)


# --- the five architecture-port encoders (smoke, random weights) -------------


@pytest.mark.parametrize(
    "encoder_name,extractor,dim,out_dim",
    [
        ("titan", "conch1_5", 768, 768),
        ("gigapath", "gigapath", 1536, 768),
        ("prism", "virchow-full", 2560, 1280),
        ("cobra", "virchow2", 2560, 2560),
        ("madeleine", "conch", 512, 512),
    ],
)
def test_slide_encoder_smoke(tmp_path, monkeypatch, encoder_name, extractor, dim, out_dim):
    """Every encoder name resolves, encodes slides of varying tile counts,
    and writes the h5 contract (mirrors reference tests/test_encoders.py)."""
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.encoding.init import init_slide_encoder_

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(2):
        _write_tile_h5(feat_dir / f"slide{i}.h5", 20 + 7 * i, dim, extractor)

    init_slide_encoder_(
        encoder=encoder_name,
        output_dir=tmp_path / "out",
        feat_dir=feat_dir,
        generate_hash=False,
    )
    out_dir = tmp_path / "out" / f"{encoder_name}-slide"
    outs = sorted(out_dir.glob("*.h5"))
    assert len(outs) == 2
    with h5py.File(outs[0]) as h5:
        feats = np.asarray(h5["feats"])
        assert feats.shape == (out_dim,)
        assert np.isfinite(feats).all()
        assert h5.attrs["encoder"] == encoder_name
        assert h5.attrs["feat_type"] == "slide"


@pytest.mark.parametrize(
    "encoder_name,extractor,dim,out_dim",
    [
        ("titan", "conch1_5", 768, 768),
        ("gigapath", "gigapath", 1536, 768),
        ("cobra", "uni", 1024, 1024),
    ],
)
def test_slide_encoder_patients_smoke(
    tmp_path, monkeypatch, encoder_name, extractor, dim, out_dim
):
    """Patient encoding works for the coordinate-aware encoders (virtual
    slide, reference titan.py:93-160) and the concat encoders."""
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.encoding.init import init_patient_encoder_

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(4):
        _write_tile_h5(feat_dir / f"slide{i}.h5", 15 + 3 * i, dim, extractor)
    slide_table = tmp_path / "slide.csv"
    pd.DataFrame(
        {
            "PATIENT": ["p1", "p1", "p2", "p2"],
            "FILENAME": [f"slide{i}.h5" for i in range(4)],
        }
    ).to_csv(slide_table, index=False)

    init_patient_encoder_(
        encoder=encoder_name,
        output_dir=tmp_path / "out",
        feat_dir=feat_dir,
        slide_table_path=slide_table,
        patient_label="PATIENT",
        filename_label="FILENAME",
        generate_hash=False,
    )
    outs = sorted((tmp_path / "out" / f"{encoder_name}-pat").glob("*.h5"))
    assert [p.stem for p in outs] == ["p1", "p2"]
    with h5py.File(outs[0]) as h5:
        assert np.asarray(h5["feats"]).shape == (out_dim,)
        assert h5.attrs["feat_type"] == "patient"


def test_dilated_attention_masks_padding():
    """Padded keys must not leak into real positions' attention."""
    import jax.numpy as jnp

    from stamp_tpu.ops.dilated_attention import (
        dilated_attention,
        dilated_attention_reference,
    )

    rng = np.random.default_rng(0)
    H, L, D = 4, 37, 16  # L deliberately not a multiple of anything
    q = jnp.asarray(rng.normal(size=(H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(H, L, D)).astype(np.float32))

    out = dilated_attention(
        q, k, v, segment_lengths=(16, 64), dilation_rates=(1, 2)
    )
    # reference oracle per config (heads 0-1 -> w=16 r=1, heads 2-3 -> w=64→
    # clamped single segment, r=2)
    ref0 = dilated_attention_reference(q[:2], k[:2], v[:2], w=16, r=1)
    ref1 = dilated_attention_reference(q[2:], k[2:], v[2:], w=64, r=2)
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(ref0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[2:]), np.asarray(ref1), atol=1e-5)


def test_encoder_propagates_int8_source_precision(tmp_path, monkeypatch):
    """Embeddings pooled from int8-extracted tiles must carry the int8
    provenance into their own attrs (source_precision)."""
    monkeypatch.setenv("STAMP_RANDOM_WEIGHTS", "1")
    from stamp_tpu.encoding.encoder.chief import CHIEF

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    _write_tile_h5(feat_dir / "s0.h5", 16, 768, "chief-ctranspath")
    with h5py.File(feat_dir / "s0.h5", "a") as h5:
        h5.attrs["precision"] = "int8"
    _write_tile_h5(feat_dir / "s1.h5", 16, 768, "chief-ctranspath")  # default bf16

    enc = CHIEF()
    enc.encode_slides_(
        output_dir=tmp_path / "out", feat_dir=feat_dir, generate_hash=False
    )
    with h5py.File(tmp_path / "out" / "chief-slide" / "s0.h5") as h5:
        assert h5.attrs["source_precision"] == "int8"
    with h5py.File(tmp_path / "out" / "chief-slide" / "s1.h5") as h5:
        assert "source_precision" not in h5.attrs
