"""Multi-chip parallelism: mesh-native sequence-parallel LiteAttention."""

from liteattention_tpu.parallel.seq_parallel import (
    make_seq_parallel_attention,
    seq_parallel_spec,
)

__all__ = ["make_seq_parallel_attention", "seq_parallel_spec"]
