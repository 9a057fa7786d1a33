"""Training: configs, pjit train/eval steps, checkpointing, metrics logging."""

from avsum_tpu.train.config import (
    AudioFeatConfig,
    Config,
    DataConfig,
    ModelConfig,
    SummaryConfig,
    TrainConfig,
    VisualFeatConfig,
    load_config,
)

__all__ = [
    "Config",
    "DataConfig",
    "AudioFeatConfig",
    "VisualFeatConfig",
    "ModelConfig",
    "TrainConfig",
    "SummaryConfig",
    "load_config",
]
