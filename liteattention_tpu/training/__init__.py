"""Training harness: trainer, checkpointing, data, metrics."""

from liteattention_tpu.training.trainer import (
    TrainConfig,
    Trainer,
    TrainState,
)
from liteattention_tpu.training.data import FaultTolerantSampler

__all__ = ["TrainConfig", "Trainer", "TrainState", "FaultTolerantSampler"]
