"""Model library: Wan-style video DiT (flagship) + transformer families."""

from liteattention_tpu.models.wan import (
    WanConfig,
    WanModel,
    init_skip_states,
)

__all__ = ["WanConfig", "WanModel", "init_skip_states"]
