"""Core attention ops: Pallas kernels, mask state, oracle, combine."""

from liteattention_tpu.ops.attention_ref import attention_ref, skip_votes_ref
from liteattention_tpu.ops.combine import (
    combine_attention,
    combine_attention_psum,
)
from liteattention_tpu.ops.flash_fwd import (
    flash_attention,
    flash_attention_decode,
    flash_attention_masked,
)
from liteattention_tpu.ops.flash_bwd import flash_attention_bwd
from liteattention_tpu.ops.kv_compact import compact_kv, kv_union_map
from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
from liteattention_tpu.ops.mla import mla_decode
from liteattention_tpu.ops.paged_attention import paged_attention
from liteattention_tpu.ops.mask import (
    SkipMaskState,
    compact_mask,
    compact_mask_fine,
    compact_mask_gather,
    init_mask,
    must_do_mask,
    sparsity,
    update_mask,
)
from liteattention_tpu.ops.schedule_pack import (
    pack_schedule,
    unpack_schedule,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes

__all__ = [
    "pack_schedule",
    "unpack_schedule",
    "compact_kv",
    "kv_union_map",
    "attention_ref",
    "flash_attention_masked",
    "flash_attention_decode",
    "flash_attention_bwd",
    "paged_attention",
    "mla_decode",
    "skip_votes_ref",
    "combine_attention",
    "combine_attention_psum",
    "flash_attention",
    "lite_flash_attention",
    "SkipMaskState",
    "compact_mask",
    "compact_mask_fine",
    "compact_mask_gather",
    "init_mask",
    "must_do_mask",
    "sparsity",
    "update_mask",
    "BlockSizes",
    "get_block_sizes",
]
