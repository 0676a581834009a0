from .config import (
    EvaluateConfig,
    PriorTrainConfig,
    MeshConfig,
    PrepareDataConfig,
    SeparateConfig,
    StftConfig,
    UPitTrainConfig,
    VaeTrainConfig,
    load_config,
    save_config,
)
from .profiling import (
    MetricsLogger,
    StepTimer,
    device_memory_stats,
    trace,
    train_step_mfu,
)

__all__ = [
    "EvaluateConfig",
    "PriorTrainConfig",
    "MeshConfig",
    "PrepareDataConfig",
    "SeparateConfig",
    "StftConfig",
    "UPitTrainConfig",
    "VaeTrainConfig",
    "load_config",
    "save_config",
    "MetricsLogger",
    "StepTimer",
    "device_memory_stats",
    "trace",
]
