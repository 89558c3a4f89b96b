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
  * the skip-mask (vote) granularity is decoupled from the compute tile:
    the lite kernel votes at 128x128 sub-tiles regardless of
    (block_q, block_k), so the compute tile is chosen purely for speed
    (reference-granularity sparsity at 512-tile cost; VERDICT round-1
    item 1).
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
    kind: str = "dense",
) -> BlockSizes:
    """Pick (block_q, block_k) for a head dim / element size.

    The public analog of ``LiteAttention.get_MN``
    (hopper/lite_attention.py:88-111); callers use it to size skip masks
    consistently with the kernels.

    Measured on-chip (v5e, 73.7k tokens, h=8, d=128, bf16; round-2
    ``tools/perf_sweep.py``, same-process ratios):

      dense tile        ms      MFU
      (256,  512)     368.6    0.31
      (512,  512)     340.0    0.33
      (768,  512)     278.5    0.41
      (512,  768)     245.7    0.46
      (1024, 512)     268.2    0.42
      (512, 1024)     193.1    0.59
      (1024,1024)     188.5    0.60
      stock pallas flash_attention: default 0.09, tuned-1024 0.57.

    The DENSE default is (512, 1024): within 3% of the best measured
    point with half the VMEM footprint of (1024, 1024), and it beats the
    tuned stock kernel. The LITE (gather-schedule) default is also
    (512, 1024): with the round-2 fused/run-DMA gather kernel, block_k
    only sets how many fine tiles are gathered per pipeline step
    (scheduling granularity stays 128), and the measured curve at
    (512, 1024) dominates (512, 512) at every sparsity (e.g. q-clustered
    73k tokens: 274 vs 298 ms at 0%, 203 vs 212 ms at 42%). For the
    SUPER-TILE fallback path block_k is also the elimination
    granularity; callers that use it should pass an override.
    """
    if override is not None:
        return BlockSizes(*override)
    if kind == "lite":
        if head_dim <= 128:
            return BlockSizes(512, 1024)
        return BlockSizes(256, 1024)
    if head_dim <= 128:
        return BlockSizes(512, 1024)
    return BlockSizes(256, 1024)


__all__ = ["BlockSizes", "get_block_sizes"]
