"""LiteAttention-TPU: temporal-sparse flash attention for video diffusion.

A TPU-native (JAX / Pallas / shard_map) rebuild of moonmath-ai/LiteAttention:
a drop-in attention engine for video-diffusion DiT inference that exploits
temporal coherence of attention sparsity across denoising timesteps. Per
(batch, head, q-tile) a persistent skip mask marks K-tiles whose
contribution fell below a threshold; marked tiles are eliminated entirely
on subsequent steps -- no HBM load, no QK^T, no softmax, no PV
(reference README.md:12-27).
"""

__version__ = "0.1.0"

from liteattention_tpu import ops
from liteattention_tpu.flash_attn_interface import (
    flash_attn_combine,
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_qkvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_varlen_qkvpacked_func,
    flash_attn_with_kvcache,
    flash_mla_with_kvcache,
)
from liteattention_tpu.flash_blocksparse import (
    FlashBlocksparseAttention,
    convert_blockmask,
    flash_blocksparse_attn_func,
)
from liteattention_tpu.lite_attention import (
    LiteAttention,
    SeqParallelLiteAttention,
    lite_attention_init,
    lite_attention_step,
)

__all__ = [
    "ops",
    "LiteAttention",
    "SeqParallelLiteAttention",
    "lite_attention_init",
    "lite_attention_step",
    "flash_attn_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_kvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_qkvpacked_func",
    "flash_attn_varlen_kvpacked_func",
    "flash_attn_with_kvcache",
    "flash_mla_with_kvcache",
    "flash_attn_combine",
    "flash_blocksparse_attn_func",
    "FlashBlocksparseAttention",
    "convert_blockmask",
]
