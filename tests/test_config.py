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


def test_checkpoint_rejects_pickle(tmp_path):
    """The npz checkpoint loader must refuse pickle files outright."""
    import pickle

    import pytest

    from stamp_tpu.modeling.checkpoint import load_checkpoint

    evil = tmp_path / "model.ckpt"
    with open(evil, "wb") as fp:
        pickle.dump({"format": "stamp-tpu-ckpt-v1"}, fp)
    # match on the message body, not just "pickle" (which would also match
    # the tmp_path directory name embedded in the error)
    with pytest.raises(ValueError, match="refusing to load"):
        load_checkpoint(evil)


def test_checkpoint_roundtrip_npz(tmp_path):
    import numpy as np

    from stamp_tpu.modeling.checkpoint import load_checkpoint, save_checkpoint

    variables = {
        "params": {
            "dense": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "bias": np.zeros(3, np.float16),
        },
        "alibi_stats": {"mean": np.asarray(2.5)},
    }
    import stamp_tpu

    save_checkpoint(
        tmp_path / "m.ckpt",
        hyper_parameters={
            "stamp_version": stamp_tpu.__version__,
            "categories": ["a", "b"],
            "train_pred_median": np.float32(0.25),
        },
        variables=variables,
    )
    payload = load_checkpoint(tmp_path / "m.ckpt")
    assert payload["hyper_parameters"]["categories"] == ["a", "b"]
    assert payload["hyper_parameters"]["train_pred_median"] == 0.25
    np.testing.assert_array_equal(
        payload["variables"]["params"]["dense"]["kernel"],
        variables["params"]["dense"]["kernel"],
    )
    assert payload["variables"]["params"]["bias"].dtype == np.float16
    assert float(payload["variables"]["alibi_stats"]["mean"]) == 2.5
