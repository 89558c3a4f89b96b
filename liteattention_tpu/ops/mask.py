"""Skip-mask state operations for the LiteAttention TPU engine.

The reference (moonmath-ai/LiteAttention) stores skip state as compressed
*range lists* per (phase, batch, head, q-tile): int32 rows
``[len, start_0, end_0, ...]`` walked in decreasing k-tile order by a CUDA
CTA (reference: hopper/lite_attention.py:113-153,
hopper/_internal/cpp/mainloop_fwd_sm90_tma_gmma_ws.hpp:47-192).

On TPU the idiomatic representation is a **dense boolean tile map**
``do_mask[B, H, Qt, Kt]`` (True = compute the tile), because:

* the mask is tiny (one byte per 256x256-element attention tile),
* XLA ops (AND/OR/where) update it in a single fused elementwise kernel,
* a *compaction* step turns each (b, h, q-tile) row into a packed list of
  surviving k-tile indices + a count, which the Pallas kernel walks with a
  dynamic-bound loop and manual DMA -- the TPU analog of the reference's
  producer skip-range TMA loop (mainloop_fwd_sm90_tma_gmma_ws.hpp:1173-1209).

The double buffer of the reference disappears: the kernel emits per-tile
skip *votes* and :func:`update_mask` folds them into the next step's mask
functionally (SURVEY.md section 7, translation decision 1/3).

Invariants preserved from the reference:

* **Monotone shrinkage** -- a tile outside the mask is never re-tested
  (reference mainloop:1804-1827 only walks read-list ranges).
* **First-tile anchor** -- the first *visited* tile of each row always
  survives (reference softmax.h:153 forces the first vote false).
* **Must-do immunity** -- tiles in must-do ranges can never be newly
  skipped (reference SkipListWriter::record_transition, mainloop:152-169).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SkipMaskState(NamedTuple):
    """Functional skip-mask state carried across denoising timesteps.

    Replaces the reference's mutable ``LiteAttention._skip_list`` double
    buffer + ``_phase`` flip (hopper/lite_attention.py:37-39, 202-212).

    Attributes:
      do_mask: bool[B, H, Qt, Kt]. True = the k-tile is computed for this
        (batch, head, q-tile) row.
      step: int32 scalar; number of attention calls folded into the mask.
    """

    do_mask: jax.Array
    step: jax.Array

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        return self.do_mask.shape


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def init_mask(
    batch: int,
    heads: int,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_k: int,
    must_skip_ranges: Optional[Sequence[Tuple[int, int]]] = None,
) -> SkipMaskState:
    """Build the initial (full) skip-mask state.

    Mirrors ``LiteAttention.init_skip_list`` (hopper/lite_attention.py:113-153):
    the initial mask covers every k-tile, minus optional *must-skip* holes.

    ``must_skip_ranges`` are half-open ``[lo, hi)`` **sequence-index** ranges
    to pre-skip. Rounding is conservative: only k-tiles *fully contained* in
    a range are skipped (the reference rounds range ends inward the same
    way, lite_attention.py:130-134). Note the reference mutates the caller's
    list in place (a known bug per SURVEY.md section 2.1); we do not.
    """
    qtiles = cdiv(seqlen_q, block_q)
    ktiles = cdiv(seqlen_k, block_k)
    mask = np.ones((batch, heads, qtiles, ktiles), dtype=bool)
    if must_skip_ranges:
        tile_lo = np.arange(ktiles) * block_k
        tile_hi = np.minimum(tile_lo + block_k, seqlen_k)
        for lo, hi in must_skip_ranges:
            covered = (tile_lo >= lo) & (tile_hi <= hi)
            mask[:, :, :, covered] = False
        # First-tile anchor: never let a row go fully empty.
        empty_rows = ~mask.any(axis=-1)
        if empty_rows.any():
            mask[empty_rows, 0] = True
    return SkipMaskState(
        do_mask=jnp.asarray(mask), step=jnp.zeros((), jnp.int32)
    )


def must_do_mask(
    must_do_ranges: Sequence[Tuple[int, int]],
    seqlen_k: int,
    block_k: int,
) -> jax.Array:
    """Expand must-do sequence ranges to a per-k-tile protection mask.

    TPU analog of ``LiteAttention._expand_must_do_list``
    (hopper/lite_attention.py:214-242). Rounding is liberal: any k-tile
    *overlapping* a must-do range is protected (reference rounds starts up
    / ends down on the do-range representation, which is the same
    conservatism expressed on range lists).

    Returns bool[Kt]; broadcastable against ``do_mask[B, H, Qt, Kt]``.
    """
    ktiles = cdiv(seqlen_k, block_k)
    mask = np.zeros((ktiles,), dtype=bool)
    tile_lo = np.arange(ktiles) * block_k
    tile_hi = np.minimum(tile_lo + block_k, seqlen_k)
    for lo, hi in must_do_ranges:
        mask |= (tile_hi > lo) & (tile_lo < hi)
    return jnp.asarray(mask)


def update_mask(
    state: SkipMaskState,
    votes: jax.Array,
    must_do: Optional[jax.Array] = None,
) -> SkipMaskState:
    """Fold the kernel's skip votes into the next step's mask.

    ``votes`` is int32/bool[B, H, Qt, Kt]: nonzero = "this tile contributed
    below threshold this step; skip it next step". Only positions where
    ``do_mask`` is currently True carry meaningful votes (unvisited tiles
    are never re-tested), so the update ANDs with the old mask -- this is
    the monotone-shrinkage invariant (reference mainloop:1804-1827).

    ``must_do`` (bool, broadcastable to the mask) vetoes new skips, exactly
    like ``SkipListWriter::record_transition`` consulting the must-do
    reader (reference mainloop:152-169). It does not resurrect tiles that
    are already skipped.
    """
    keep = jnp.logical_not(votes.astype(bool))
    if must_do is not None:
        keep = jnp.logical_or(keep, must_do)
    new_do = jnp.logical_and(state.do_mask, keep)
    # First-live-tile anchor: a row may never go fully empty (the
    # reference guarantees this in-kernel by forcing the first visited
    # tile's vote false, softmax.h:153 + mainloop:88-92; with sub-tile
    # vote granularity the equivalent global invariant is enforced here:
    # if every surviving tile of a row voted skip, retain the row's first
    # surviving tile).
    empty = jnp.logical_not(jnp.any(new_do, axis=-1, keepdims=True))
    first_live = jnp.logical_and(
        state.do_mask,
        jnp.cumsum(state.do_mask.astype(jnp.int32), axis=-1) == 1,
    )
    new_do = jnp.logical_or(new_do, jnp.logical_and(empty, first_live))
    return SkipMaskState(do_mask=new_do, step=state.step + 1)


@jax.jit
def compact_mask(do_mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Compact each (b, h, q-tile) row into surviving k-tile indices.

    Returns:
      kv_idx: int32[B, H, Qt, Kt] -- for each row, the surviving k-tile
        indices in **increasing** order in positions [0, count); tail
        positions repeat the last surviving index so downstream consumers
        can over-read harmlessly. (The reference walks ranges in
        *decreasing* order, mainloop:1177-1180; visit order only affects
        which tile is the never-skipped anchor -- parity is statistical,
        SURVEY.md section 7 hard-part 3.)
      count: int32[B, H, Qt] -- number of surviving tiles, always >= 1
        (first-tile anchor; reference always loads the first range even
        when the list is empty, mainloop:88-92).
    """
    kt = do_mask.shape[-1]
    keep = do_mask.astype(jnp.int32)
    count = jnp.maximum(keep.sum(axis=-1), 1)
    # Stable sort: surviving tiles (key 0) first, in index order.
    order = jnp.argsort(1 - keep, axis=-1, stable=True).astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, do_mask.shape, do_mask.ndim - 1)
    last = jnp.take_along_axis(
        order, (count - 1)[..., None].astype(jnp.int32), axis=-1
    )
    kv_idx = jnp.where(pos < count[..., None], order, last)
    return kv_idx, count.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("qsubs", "ksubs"))
def compact_mask_fine(
    do_mask: jax.Array, qsubs: int, ksubs: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Hierarchical compaction of a FINE-granularity mask.

    The round-2 sub-tile design (VERDICT item 1): the mask lives at the
    reference's ~128x128 granularity (cf. tile_size.h:10-48) while the
    kernel computes at a larger (block_q, block_k) tile; one compute tile
    covers ``qsubs x ksubs`` fine tiles. A compute super-tile is
    scheduled iff ANY of its fine tiles survives; within a visited
    super-tile, dead fine tiles are masked out of the scores and each
    fine tile gets its own skip vote.

    Args:
      do_mask: bool[B, H, Qtf, Ktf] fine mask.
      qsubs, ksubs: fine tiles per compute tile along q / k
        (``block_q // 128``, ``block_k // 128``). ``qsubs * ksubs`` must
        be <= 32 (the sub-mask rides one int32 per scheduled tile).

    Returns:
      kv_idx: int32[B, H, Qt, Kt] compacted surviving SUPER-tile indices
        (same contract as :func:`compact_mask`).
      count: int32[B, H, Qt] surviving super-tile counts (>= 1).
      kv_bits: int32[B, H, Qt, Kt] sub-tile liveness bitmaps aligned with
        ``kv_idx``: bit (qs * ksubs + ks) of ``kv_bits[..., j]`` is the
        liveness of fine tile (qs, ks) inside super-tile ``kv_idx[..., j]``.
    """
    assert qsubs * ksubs <= 32, "sub-mask must fit an int32 per tile"
    b, h, qtf, ktf = do_mask.shape
    qt, kt = cdiv(qtf, qsubs), cdiv(ktf, ksubs)
    pad = ((0, 0), (0, 0), (0, qt * qsubs - qtf), (0, kt * ksubs - ktf))
    fine = jnp.pad(do_mask, pad)  # padded fine tiles are dead
    fine = fine.reshape(b, h, qt, qsubs, kt, ksubs)
    superm = jnp.any(fine, axis=(3, 5))
    kv_idx, count = compact_mask(superm)
    weights = (
        1 << (
            jnp.arange(qsubs, dtype=jnp.int32)[:, None] * ksubs
            + jnp.arange(ksubs, dtype=jnp.int32)[None, :]
        )
    )
    bits = jnp.sum(
        fine.astype(jnp.int32) * weights[None, None, None, :, None, :],
        axis=(3, 5),
    )
    kv_bits = jnp.take_along_axis(bits, kv_idx, axis=-1)
    return kv_idx, count, kv_bits


@functools.partial(jax.jit, static_argnames=("qsubs",))
def compact_mask_gather(
    do_mask: jax.Array, qsubs: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """FINE-granularity compaction for the GATHER schedule.

    Unlike :func:`compact_mask_fine` (which schedules compute
    super-tiles and loses elimination whenever any covered fine tile
    survives), the gather schedule lists the surviving FINE k-tiles
    themselves; the kernel fetches ``block_k // 128`` of them per
    pipeline step from wherever they live. Eliminated compute is then
    proportional to fine sparsity with no clustering requirement -- the
    TPU analog of the reference's 128-granular producer walk
    (mainloop_fwd_sm90_tma_gmma_ws.hpp:1173-1209 at tile_size.h
    granularity).

    Args:
      do_mask: bool[B, H, Qtf, Ktf] fine mask.
      qsubs: fine q-tiles per compute q-tile (``block_q // 128``).

    Returns:
      fidx: int32[B, H, Qt, Ktf] surviving fine k-tile indices in
        increasing order (tail repeats the last; one row per compute
        q-tile = the union over its ``qsubs`` fine rows).
      count: int32[B, H, Qt] number of surviving fine tiles (>= 1).
      qbits: int32[B, H, Qt, Ktf] aligned with ``fidx``: bit qs is the
        liveness of fine tile (qs, fidx[j]).
    """
    assert qsubs <= 32
    b, h, qtf, ktf = do_mask.shape
    qt = cdiv(qtf, qsubs)
    fine = jnp.pad(do_mask, ((0, 0), (0, 0), (0, qt * qsubs - qtf), (0, 0)))
    fine = fine.reshape(b, h, qt, qsubs, ktf)
    live_k = jnp.any(fine, axis=3)  # [B, H, Qt, Ktf]
    fidx, count = compact_mask(live_k)
    weights = 1 << jnp.arange(qsubs, dtype=jnp.int32)
    bits = jnp.sum(
        fine.astype(jnp.int32) * weights[None, None, None, :, None],
        axis=3,
    )
    qbits = jnp.take_along_axis(bits, fidx, axis=-1)
    return fidx, count, qbits


def sparsity(do_mask: jax.Array) -> jax.Array:
    """Fraction of attention tiles skipped, in [0, 1].

    Equals ``1 - LiteAttention.calc_percentage(read_list)`` of the
    reference (hopper/lite_attention.py:61-85) computed on the dense map.
    """
    return 1.0 - jnp.mean(do_mask.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Range-list interop (reference wire format).
#
# The reference exposes skip state as int32 rows [len, s0, e0, s1, e1, ...]
# of decreasing inclusive do-ranges (hopper/lite_attention.py:124-153).
# These converters exist for parity tests and for users migrating
# reference-side tooling; the engine itself never materializes range lists.
# ---------------------------------------------------------------------------


def mask_to_range_list(do_mask: np.ndarray) -> np.ndarray:
    """Dense bool mask -> reference-format range-list tensor.

    Input bool[B, H, Qt, Kt]; output int32[B, H, Qt, Kt + 1] rows
    ``[len, start_0, end_0, ...]`` with start >= end, ranges listed in
    decreasing k-tile order, both ends inclusive -- the exact layout the
    reference kernel's SkipListReader consumes (mainloop:47-115).
    """
    do_mask = np.asarray(do_mask, dtype=bool)
    b, h, qt, kt = do_mask.shape
    # Row width: 1 length slot + 2 slots per run. A Kt-tile row has at most
    # ceil(Kt/2) runs, so odd Kt needs one slot more than the reference's
    # fixed Kt+1 (the reference can overflow there; we size exactly).
    width = 1 + 2 * ((kt + 1) // 2)
    out = np.zeros((b, h, qt, width), dtype=np.int32)
    flat = do_mask.reshape(-1, kt)
    oflat = out.reshape(-1, width)
    for r in range(flat.shape[0]):
        row = flat[r]
        # Find maximal runs of True, emit in decreasing order.
        padded = np.diff(np.concatenate([[0], row.astype(np.int8), [0]]))
        starts = np.nonzero(padded == 1)[0]
        ends = np.nonzero(padded == -1)[0] - 1  # inclusive
        vals = []
        for s, e in zip(starts[::-1], ends[::-1]):
            vals.extend([int(e), int(s)])  # start(high) then end(low)
        oflat[r, 0] = len(vals)
        oflat[r, 1 : 1 + len(vals)] = vals
    return out


def range_list_to_mask(range_list: np.ndarray, ktiles: int) -> np.ndarray:
    """Reference-format range list -> dense bool mask (inverse converter)."""
    range_list = np.asarray(range_list)
    b, h, qt, _ = range_list.shape
    out = np.zeros((b, h, qt, ktiles), dtype=bool)
    flat = range_list.reshape(-1, range_list.shape[-1])
    oflat = out.reshape(-1, ktiles)
    for r in range(flat.shape[0]):
        n = int(flat[r, 0])
        for i in range(1, n, 2):
            hi, lo = int(flat[r, i]), int(flat[r, i + 1])
            oflat[r, lo : hi + 1] = True
    return out


__all__ = [
    "SkipMaskState",
    "cdiv",
    "init_mask",
    "must_do_mask",
    "update_mask",
    "compact_mask",
    "compact_mask_fine",
    "compact_mask_gather",
    "sparsity",
    "mask_to_range_list",
    "range_list_to_mask",
]
