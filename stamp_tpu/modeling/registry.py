"""Model registry: (feature_type, task) × model_name → task wrapper + flax module.

Parity with reference src/stamp/modeling/registry.py:18-75.
"""

from enum import StrEnum

from stamp_tpu.types import Task


class ModelName(StrEnum):
    """Enum for available model names."""

    VIT = "vit"
    MLP = "mlp"
    TRANS_MIL = "trans_mil"
    LINEAR = "linear"
    BARSPOON = "barspoon"


def load_model_class(task: Task, feature_type: str, model_name: ModelName):
    """Returns (TaskModelClass, FlaxModuleClass); lazy imports keep CLI fast."""
    from stamp_tpu.modeling import tasks

    registry = {
        ("tile", "classification"): tasks.LitTileClassifier,
        ("tile", "regression"): tasks.LitTileRegressor,
        ("tile", "survival"): tasks.LitTileSurvival,
        ("slide", "classification"): tasks.LitSlideClassifier,
        ("slide", "regression"): tasks.LitSlideRegressor,
        ("slide", "survival"): tasks.LitSlideSurvival,
        ("patient", "classification"): tasks.LitPatientClassifier,
        ("patient", "regression"): tasks.LitPatientRegressor,
        ("patient", "survival"): tasks.LitPatientSurvival,
    }
    LitModelClass = registry[(feature_type, task)]

    match model_name:
        case ModelName.VIT:
            from stamp_tpu.models.vision_transformer import (
                VisionTransformer as ModelClass,
            )
        case ModelName.TRANS_MIL:
            from stamp_tpu.models.trans_mil import TransMIL as ModelClass
        case ModelName.MLP:
            from stamp_tpu.models.mlp import MLP as ModelClass
        case ModelName.BARSPOON:
            from stamp_tpu.models.barspoon import EncDecTransformer as ModelClass

            LitModelClass = tasks.LitEncDecTransformer
        case ModelName.LINEAR:
            from stamp_tpu.models.mlp import Linear as ModelClass
        case _:
            raise ValueError(f"Unknown model name: {model_name}")

    return LitModelClass, ModelClass
