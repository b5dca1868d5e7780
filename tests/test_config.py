"""Config round-trip + drop-in compatibility with the reference's YAML schema."""

from pathlib import Path

import pytest
import yaml
from pydantic import ValidationError

import stamp_tpu
from stamp_tpu.utils.config import StampConfig

FACTORY = Path(stamp_tpu.__file__).with_name("config.yaml")


def test_factory_config_validates():
    cfg = StampConfig.model_validate(yaml.safe_load(FACTORY.read_text()))
    assert cfg.preprocessing is not None
    assert cfg.advanced_config is not None
    assert cfg.advanced_config.bag_size == 512


def test_config_roundtrip():
    cfg = StampConfig.model_validate(yaml.safe_load(FACTORY.read_text()))
    dumped = cfg.model_dump(mode="json", exclude_none=True)
    cfg2 = StampConfig.model_validate(dumped)
    assert cfg2.advanced_config.model_params.vit.dim_model == 512


def test_reference_config_schema_accepted():
    """A config written for the reference STAMP must validate unchanged."""
    reference_cfg = Path("/root/reference/src/stamp/config.yaml")
    if not reference_cfg.exists():
        pytest.skip("reference not mounted")
    cfg = StampConfig.model_validate(yaml.safe_load(reference_cfg.read_text()))
    assert cfg.crossval is not None


def test_extra_keys_forbidden():
    with pytest.raises(ValidationError):
        StampConfig.model_validate({"nonexistent_section": {}})
    with pytest.raises(ValidationError):
        StampConfig.model_validate(
            {"advanced_config": {"model_params": {}, "bogus_field": 1}}
        )


def test_checkpoint_version_gate(tmp_path):
    """Reject checkpoints built with stamp <2.5.0 or newer than installed
    (reference models/__init__.py:92-105)."""
    import numpy as np

    from stamp_tpu.modeling.checkpoint import load_checkpoint, save_checkpoint
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.models.vision_transformer import VisionTransformer

    def make(version):
        model = LitTileClassifier(
            model_class=VisionTransformer,
            ground_truth_label="gt",
            categories=["a", "b"],
            category_weights=np.array([0.5, 0.5], np.float32),
            dim_input=4,
            model_name="vit",
            dim_model=8,
            dim_feedforward=8,
            n_heads=2,
            n_layers=1,
        )
        hp = model.checkpoint_hparams()
        hp["stamp_version"] = version
        path = tmp_path / f"ckpt-{version}.ckpt"
        save_checkpoint(path, hyper_parameters=hp, variables={"params": {}})
        return path

    # current version loads
    load_checkpoint(make("2.5.0"))

    with pytest.raises(ValueError, match="incompatible"):
        load_checkpoint(make("2.4.0"))

    with pytest.raises(ValueError, match="newer"):
        load_checkpoint(make("99.0.0"))
