"""Root config tree (parity with reference utils/config.py)."""

from pydantic import BaseModel, ConfigDict

from stamp_tpu.encoding.config import PatientEncodingConfig, SlideEncodingConfig
from stamp_tpu.heatmaps.config import HeatmapConfig
from stamp_tpu.modeling.config import (
    AdvancedConfig,
    CrossvalConfig,
    DeploymentConfig,
    TrainConfig,
)
from stamp_tpu.preprocessing.config import PreprocessingConfig
from stamp_tpu.statistics import StatsConfig


class StampConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")

    preprocessing: PreprocessingConfig | None = None

    training: TrainConfig | None = None
    crossval: CrossvalConfig | None = None
    deployment: DeploymentConfig | None = None

    statistics: StatsConfig | None = None

    heatmaps: HeatmapConfig | None = None

    slide_encoding: SlideEncodingConfig | None = None

    patient_encoding: PatientEncodingConfig | None = None

    advanced_config: AdvancedConfig | None = None
