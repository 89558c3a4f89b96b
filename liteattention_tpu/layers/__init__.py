"""Layer library: rotary embeddings, patch embedding."""

from liteattention_tpu.layers.rotary import (
    RotaryEmbedding,
    apply_rotary_emb,
    rotary_freqs,
)

__all__ = ["RotaryEmbedding", "apply_rotary_emb", "rotary_freqs"]
