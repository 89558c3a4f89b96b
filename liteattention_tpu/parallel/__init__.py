"""Multi-chip parallelism: mesh-native sequence-parallel LiteAttention,
ring attention, tensor-parallel layers."""

from liteattention_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_apply_local,
)
from liteattention_tpu.parallel.ring_attention import (
    ring_attention_local,
    ring_self_attention,
    ulysses_attention_local,
    ulysses_self_attention,
)
from liteattention_tpu.parallel.seq_parallel import (
    make_seq_parallel_attention,
    seq_parallel_spec,
)

__all__ = [
    "make_seq_parallel_attention",
    "seq_parallel_spec",
    "ring_attention_local",
    "ring_self_attention",
    "pipeline_apply",
    "pipeline_apply_local",
    "ulysses_attention_local",
    "ulysses_self_attention",
]
