"""Loss library: fused (optionally tensor-parallel) cross entropy."""

from liteattention_tpu.losses.cross_entropy import (
    cross_entropy_loss,
    parallel_cross_entropy_loss,
)

__all__ = ["cross_entropy_loss", "parallel_cross_entropy_loss"]
