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
