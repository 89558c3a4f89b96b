"""Temporal-sparse flash-attention forward kernel (Pallas/TPU).

The LiteAttention engine kernel: TPU-native rebuild of the reference's
skipable FA3 forward (``CollectiveMainloopFwdSm90`` with
``Is_skipable=true``; reference: hopper/_internal/cpp/
mainloop_fwd_sm90_tma_gmma_ws.hpp:1040-2100, softmax.h:139-222,
flash_fwd_kernel_sm90.h). Design mapping (SURVEY.md section 7):

* The reference's SkipListReader walking compressed do-ranges with a TMA
  producer warp becomes a **dynamic-bound ``fori_loop`` over a compacted
  schedule row** ``[count, idx_0, idx_1, ...]`` (one row per (b, h,
  q-tile), DMA'd HBM->SMEM at step start -- structurally the same wire
  format as the reference's ``[len, ranges...]`` rows,
  lite_attention.py:124), with hand-rolled double-buffered HBM->VMEM DMA
  of exactly the surviving K/V tiles. A skipped tile costs zero HBM
  traffic and zero FLOPs -- the same elimination guarantee as the
  producer skip loop at mainloop:1173-1209.
* **Sub-tile vote granularity (round 2).** The reference's skip mask
  lives at its compute-tile granularity (~128x176, tile_size.h:10-48);
  on TPU the fast compute tile is much larger (512x512), which would
  cost ~12x sparsity resolution. The round-2 design decouples them: the
  mask lives at FINE (128x128) granularity, the kernel walks 512-wide
  SUPER-tiles (scheduled iff any covered fine tile survives), masks dead
  fine sub-blocks out of the scores via a per-step sub-mask bitmap
  (one int32 riding the schedule row), and emits one vote per fine
  sub-tile. Reference-granularity sparsity at large-tile compute cost.
* The fused skip detection of ``Softmax::max_get_scale_detect_qk_skip``
  (softmax.h:139-222) becomes per-fine-tile votes computed from the same
  fp32 online-softmax state the kernel already holds: fine tile
  (qs, ks) votes "skippable" iff **no valid q-row in its 128-row group**
  satisfies ``(local_max_ks - running_max_prev) * scale * log2(e) >
  thr``. Every sub-tile of the first visited super-tile votes 0
  (softmax.h:153; the global per-row anchor is enforced in
  :func:`liteattention_tpu.ops.mask.update_mask`). The 4-warp AND
  (mainloop:1721-1725) is the AND over the row group here.
* The reference's SkipListWriter (single saving thread recording range
  transitions, mainloop:121-192) becomes a dense int32 vote row written
  once per (b, h, q-tile); :func:`liteattention_tpu.ops.mask.update_mask`
  folds it into the next step's mask with must-do vetoes and monotone
  shrinkage -- elimination still takes effect *next* timestep, the
  reference's forward-propagation semantics (mainloop:1804-1827).
* ``Is_skipable`` forcing the non-persistent SingleTileScheduler
  (flash_fwd_launch_template.h:170) maps to grid ``(B, Qt, H)``: each
  grid step owns exactly one (batch, q-tile, head) row and its mask row.
  H is innermost so per-(b, q-tile) output blocks (lse, votes) stay
  VMEM-resident across heads.

Visit order is **increasing** k-tile index (the reference iterates
high->low, mainloop:1177-1180); parity of the evolved masks is
statistical, not bitwise (SURVEY.md section 7, hard part 3).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
MIN_LANES = 128
VOTE_TILE = 128  # fine (vote/mask) granularity in sequence elements
# Gather-ring depth: how many (gsize*128, 2D) K|V tile groups are in
# flight. Measured insensitive at 4 on the evolved 49% point (s=0 tax
# 1.02-1.06x across runs) -- the ring is not the residual bottleneck.
RING_SLOTS = 4


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pow2(n: int) -> int:
    """Next power of two >= n.

    Mosaic pads SMEM allocations to power-of-two sublane counts but DMA
    descriptors keep the declared shape; a whole-buffer HBM->SMEM copy
    into a non-power-of-two scratch (e.g. (6, 128) int32) compiles and
    then HARD-FAULTS the chip at runtime (root-caused on v5e with a
    6-row micro-repro; 2/4/8/16 rows are fine). All schedule scratch is
    therefore allocated at power-of-two rows and the DMA lands in a
    leading slice.
    """
    p = 1
    while p < n:
        p *= 2
    return p


def _patch_pipeline_for_interpret() -> None:
    """Let ``emit_pipeline`` trace on non-TPU backends.

    ``_make_tiling`` probes the TPU generation at *trace* time, which
    raises on the CPU backend even under ``interpret=True``. Interpret
    mode ignores the tiling hint, so any modern generation works.
    """
    from jax._src.pallas.mosaic import pipeline as _mp

    if getattr(_mp._get_tpu_generation, "_lite_patched", False):
        return
    _orig = _mp._get_tpu_generation

    def _get_tpu_generation_or_default():
        try:
            return _orig()
        except ValueError:
            return 5

    _get_tpu_generation_or_default._lite_patched = True
    _mp._get_tpu_generation = _get_tpu_generation_or_default


_patch_pipeline_for_interpret()


def _lite_kernel(
    # inputs
    thr_ref,  # SMEM (1, 1) float32
    sched_hbm,  # HBM [B, H, Qt, R(+R), 128] int32 schedule (+bits) rows
    q_ref,  # VMEM (1, 1, block_q, D)
    k_hbm,  # ANY  [B, Hk, Sk_pad, D]
    v_hbm,  # ANY  [B, Hk, Sk_pad, D]
    # outputs
    o_ref,  # VMEM (1, 1, block_q, D)
    lse_ref,  # VMEM (1, block_q, H)    layout [B, Sq, H]
    votes_ref,  # VMEM (1, 1, qsubs, ktf8, H) int32
    # scratch
    sched_smem,  # SMEM (R or 2R, 128) int32
    sched_sem,
    step_smem,  # SMEM (1,) int32 inner-step counter
    votes_scr,  # VMEM (ktf8, MIN_LANES) int32; lane l < qsubs = qsub l
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    group: int,
    num_heads: int,
    block_q: int,
    block_k: int,
    seqlen_q: int,
    seqlen_k: int,
    qsubs: int,
    ksubs: int,
    sched_rows: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    h = pl.program_id(2)
    hk = h // group
    thr = thr_ref[0, 0]
    ktf8 = votes_scr.shape[0]
    fine = qsubs * ksubs > 1
    vq = block_q // qsubs  # q rows per fine tile
    vk = block_k // ksubs  # k cols per fine tile

    # Fetch this row's schedule [count, idx_0, ...] (+ sub-mask bitmaps
    # in the second row group when fine) into scalar memory. Rows are
    # stored as full (R, 128) tiles so the HBM slice stays tile-aligned;
    # the scratch is power-of-two rows (see _pow2) so the copy targets a
    # leading slice.
    smem_rows = sched_hbm.shape[3]
    row_dma = pltpu.make_async_copy(
        sched_hbm.at[b, h, qi],
        sched_smem.at[pl.ds(0, smem_rows)],
        sched_sem,
    )
    row_dma.start()

    def sched_at(i):
        return sched_smem[i // 128, i % 128]

    def bits_at(i):
        return sched_smem[sched_rows + i // 128, i % 128]

    # Unvisited tiles stay skipped under the monotone mask update.
    votes_scr[...] = jnp.ones_like(votes_scr)
    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    step_smem[0] = 0

    row_dma.wait()
    count = sched_at(0)

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    q = q_ref[0, 0]
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        + qi * block_q
        < seqlen_q
    )

    def inner(k_blk, v_blk):
        # Inner pipeline body: one surviving k-super-tile. Multi-buffered
        # HBM->VMEM copies are managed by emit_pipeline (the Mosaic-grade
        # replacement of the reference's TMA producer warp).
        j = step_smem[0]
        tile = sched_at(1 + j)
        # Scores in log2 space (scale folded with log2(e)): exp2 on the
        # VPU skips exp's per-element multiply, and the skip criterion
        # becomes a direct subtraction -- exactly the reference's
        # softmax_scale_log2 representation (softmax.h:131,194).
        s = jax.lax.dot_general(
            q,
            k_blk[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        s = s * (scale * LOG2E)
        # Column-group decomposition: all fine-granularity work (sub-mask
        # application, per-fine-tile local maxes, the split PV matmul)
        # runs on per-128-column slices -- the sub-mask costs one
        # (block_q, 1) shift + one masked slice per group instead of
        # full-tile bit arithmetic (the VPU is the bottleneck at these
        # tile sizes). Coarse mode is the single-group special case.
        if fine:
            bits = bits_at(1 + j)
            rsub = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                // vq
            )
        cols = []
        for ks in range(ksubs):
            c = s[:, ks * vk : (ks + 1) * vk] if ksubs > 1 else s
            if fine:
                # Liveness of fine tile (rsub, ks) as a per-row vector.
                live_col = (
                    jax.lax.shift_right_logical(
                        jnp.broadcast_to(bits, (block_q, 1)),
                        rsub * ksubs + ks,
                    )
                    & 1
                ) == 1
                c = jnp.where(live_col, c, DEFAULT_MASK_VALUE)
            if seqlen_k % block_k != 0:
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, vk), 1)
                    + tile * block_k
                    + ks * vk
                )
                c = jnp.where(col < seqlen_k, c, DEFAULT_MASK_VALUE)
            cols.append(c)

        m_prev = m_scr[...]

        # --- QK-Skip detection (softmax.h:194 semantics, fp32) at fine
        # granularity: per-128-col local max vs the per-row running max;
        # AND over each 128-row group. local_max/m_prev are in log2
        # units; thr is log2-space by definition.
        lm_list = [
            jnp.max(c, axis=1, keepdims=True) for c in cols
        ]  # each (block_q, 1)
        local_max = lm_list[0]
        for lm in lm_list[1:]:
            local_max = jnp.maximum(local_max, lm)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, MIN_LANES), 1)
        vote_rows = []
        for ks in range(ksubs):
            do_qk = jnp.logical_and(
                (lm_list[ks] - m_prev[:, :1]) > thr, row_valid
            )  # (block_q, 1)
            # Lane l of this row = vote of q-row-group l (l < qsubs).
            row = jnp.zeros((1, MIN_LANES), jnp.int32)
            for qs in range(qsubs):
                any_do = jnp.any(do_qk[qs * vq : (qs + 1) * vq])
                # First-tile anchor (softmax.h:153): on the FIRST visited
                # super-tile, the first LIVE fine tile of each row group
                # is forced to survive. (At finite thr the computed vote
                # is already 0 for every j==0 live tile since
                # m_prev = -inf; the forcing matters at thr = +inf.)
                if fine:
                    mask_qs = jax.lax.shift_right_logical(
                        bits, qs * ksubs
                    ) & ((1 << ksubs) - 1)
                    first_qs = mask_qs & (-mask_qs)  # lowest set bit
                    is_anchor = (
                        jax.lax.shift_right_logical(first_qs, ks) & 1
                    ) == 1
                else:
                    is_anchor = True
                vote = jnp.where(
                    jnp.logical_and(j == 0, is_anchor),
                    jnp.int32(0),
                    jnp.logical_not(any_do).astype(jnp.int32),
                )
                row = jnp.where(lane == qs, vote, row)
            vote_rows.append(row)
        vote_blk = (
            jnp.concatenate(vote_rows, axis=0)
            if ksubs > 1
            else vote_rows[0]
        )
        votes_scr[pl.ds(tile * ksubs, ksubs), :] = vote_blk

        # --- online softmax update (log2 space), per column group ---
        m_next = jnp.maximum(m_prev, local_max)
        m_red = m_next[:, :1]
        alpha = jnp.exp2(m_prev[:, :1] - m_red)
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha
        l_curr = None
        for ks in range(ksubs):
            p = jnp.exp2(cols[ks] - m_red)
            ps = jnp.sum(p, axis=1, keepdims=True)
            l_curr = ps if l_curr is None else l_curr + ps
            acc_scr[...] += jax.lax.dot(
                p.astype(v_blk.dtype),
                v_blk[ks * vk : (ks + 1) * vk] if ksubs > 1 else v_blk[...],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        l_scr[...] = alpha * l_scr[...] + l_curr
        step_smem[0] = j + 1

    d_p = q_ref.shape[-1]
    pipe = pltpu.emit_pipeline(
        inner,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((block_k, d_p), lambda j: (sched_at(1 + j), 0)),
            pl.BlockSpec((block_k, d_p), lambda j: (sched_at(1 + j), 0)),
        ],
    )
    pipe(k_hbm.at[b, hk], v_hbm.at[b, hk])

    l = l_scr[:, :1]
    m_col = m_scr[:, :1]  # log2 units
    # Rows whose max never left the mask sentinel saw no real score:
    # zero output, -inf lse (reference store_zero semantics).
    empty = m_col <= DEFAULT_MASK_VALUE * 0.5
    l_inv = jnp.where(
        jnp.logical_or(empty, l == 0.0), 0.0, 1.0 / jnp.maximum(l, 1e-37)
    )
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)

    # Scatter this head's lse / votes columns into the per-(b, q-tile)
    # blocks that stay resident while the H grid dimension advances.
    lse = jnp.where(
        jnp.logical_or(empty, l == 0.0),
        -jnp.inf,
        m_col * LN2 + jnp.log(jnp.maximum(l, 1e-37)),
    )
    head_col = jax.lax.broadcasted_iota(jnp.int32, (block_q, num_heads), 1)
    lse_ref[0] = jnp.where(head_col == h, lse, lse_ref[0])
    ktf = votes_scr.shape[0]
    vote_head = jax.lax.broadcasted_iota(jnp.int32, (ktf, num_heads), 1)
    vote_lane = jax.lax.broadcasted_iota(
        jnp.int32, (ktf, MIN_LANES), 1
    )
    for qs in range(qsubs):
        # Extract lane qs (the qsub-row-group's votes) exactly.
        col = jnp.sum(
            jnp.where(vote_lane == qs, votes_scr[...], 0),
            axis=1,
            keepdims=True,
        )
        votes_ref[0, 0, qs] = jnp.where(
            vote_head == h, col, votes_ref[0, 0, qs]
        )


def _lite_gather_kernel(
    # inputs
    thr_ref,  # SMEM (1, 1) float32
    sched_hbm,  # HBM [B, H, Qt, 3R, 128] int32 (fidx + qbits + runflag rows)
    q_ref,  # VMEM (1, 1, block_q, D)
    kv_hbm,  # ANY  [B, Hk, Skp, 2D] (flat, K|V interleaved on lanes)
    # outputs (votes_ref only when emit_votes)
    # o_ref,  # VMEM (1, 1, block_q, D)
    # lse_ref,  # VMEM (1, block_q, H)
    # votes_ref,  # VMEM (1, 1, 1, steps8, 128) int32 packed per-step rows
    # scratch (votes_scr only when emit_votes)
    # sched_smem,  # SMEM (pow2(3R), 128) int32
    # sched_sem,
    # kvbuf,  # VMEM (NSLOT, gsize*128, 2D) ring of gathered K|V tiles
    # dma_sems,  # DMA sems (NSLOT,): one per ring slot
    # votes_scr,  # VMEM (steps8, MIN_LANES) int32: packed per-step vote
    #             # rows, row j lane qs*gsize+g = vote of schedule entry
    #             # j*gsize+g for q-row-group qs
    # m_scr, l_scr, acc_scr
    *refs,
    scale: float,
    group: int,
    num_heads: int,
    block_q: int,
    seqlen_q: int,
    seqlen_k: int,
    qsubs: int,
    gsize: int,
    sched_rows: int,
    emit_votes: bool,
    cross_prime: bool = True,
):
    """GATHER-schedule sparse forward: the schedule lists surviving FINE
    (128-wide) k-tiles; each step gathers ``gsize`` of them from
    anywhere in the sequence via hand-rolled double-buffered DMAs and
    shares one online-softmax state update. Fine-granularity elimination
    (the reference's producer-walk granularity, mainloop:1173-1209) at
    wide-tile VPU *and MXU* economics: the gathered tiles land
    contiguously in one (gsize*128, D) buffer, so each step runs ONE
    wide QK^T matmul and ONE wide PV matmul -- the same MXU shapes as
    the dense kernel at (block_q, gsize*128) tiles. Only the
    fine-granularity bookkeeping (sub-mask, per-128-column local maxes,
    votes) runs on per-tile slices.

    Scalar-core DMA-issue cost is the tail risk of a gather design, so
    it is attacked three ways:

    * **K|V interleave:** K and V ride ONE HBM array (lane-concatenated)
      so each fetched tile costs a single DMA, not two.
    * **Run-length DMA:** evolved video skip masks are strongly banded,
      so a step's ``gsize`` scheduled tiles are usually CONSECUTIVE.
      The host precomputes a per-step run flag; a run step issues ONE
      contiguous (gsize*128, 2D) copy (dense-kernel DMA economics --
      the TPU analog of the reference walking a do-RANGE,
      mainloop:1177-1209); only genuinely scattered steps pay per-tile
      gather copies. Both paths signal the same byte count on the slot
      semaphore.
    * **4-deep ring buffer:** 3 steps of DMA lookahead instead of
      classic double buffering, hiding issue latency behind compute.

    (DMAs are hand-rolled rather than ``emit_pipeline``: 128-row pipeline
    blocks faulted Mosaic on v5e -- see CLAUDE.md wedge log.)

    ``emit_votes=False`` (round 3) drops the entire per-step vote chain
    (threshold compare + MXU one-hot reduction + packed-row store) from
    the compiled kernel: the vote matmul alone is a third full-width MXU
    pass per step (same M*K*N as QK^T), i.e. ~+50% MXU work -- the bulk
    of the round-2 flat tax. The engine re-votes every ``vote_stride``
    denoising steps instead of every step (temporal coherence makes the
    mask near-stationary between adjacent timesteps; deviation from the
    reference's every-step voting, hopper/lite_attention.py:244-291, is
    documented in PARITY.md).
    """
    if emit_votes:
        (o_ref, lse_ref, votes_ref, sched_smem, sched_sem, kvbuf,
         dma_sems, votes_scr, m_scr, l_scr, acc_scr) = refs
    else:
        (o_ref, lse_ref, sched_smem, sched_sem, kvbuf,
         dma_sems, m_scr, l_scr, acc_scr) = refs
    b = pl.program_id(0)
    qi = pl.program_id(1)
    h = pl.program_id(2)
    hk = h // group
    thr = thr_ref[0, 0]
    vq = block_q // qsubs

    # Cross-row schedule prefetch (round 3): the per-row critical path
    # used to start with a synchronous HBM->SMEM schedule fetch. The
    # schedule for head h+1 is now DMA'd into the OTHER half of a
    # double-buffered SMEM scratch while head h computes; only h == 0
    # of each (b, q-tile) waits on its own fetch. The chain runs
    # strictly along the innermost grid dim (h, "arbitrary" semantics =
    # never split across cores), so it is safe under any megacore
    # partitioning of the outer parallel dims. Measured: banded-49%
    # novote 94.2 -> 91.3 ms; evolved-49% unchanged (its bottleneck is
    # elsewhere -- see the residual-gap note below).
    #
    # Residual-gap accounting (round 3, 73k tokens, 49.3% evolved
    # masks): novote step 91.2 ms vs naive ideal dense*live = 83.0.
    # But the DENSE kernel itself on a literally halved KV runs 85.9 ms
    # vs linear 82.0 (-4.8%: shorter per-q-tile reduction pipelines
    # less efficiently), so the achievable bound at this live fraction
    # is ~87 ms and the gather kernel's true overhead is ~4.7%, already
    # near the dense kernel family's own short-reduction behavior.
    # Measured non-bottlenecks: ring depth, schedule-fetch latency
    # (this prefetch), DMA contiguity (banded == evolved after the
    # prefetch), schedule-union waste (0.5096 density vs 0.5069 live).
    def sched_row_copy(hh, buf):
        return pltpu.make_async_copy(
            sched_hbm.at[b, hh, qi],
            sched_smem.at[buf, pl.ds(0, sched_hbm.shape[3])],
            sched_sem.at[buf],
        )

    par = jax.lax.rem(h, 2)

    @pl.when(h == 0)
    def _own():
        sched_row_copy(0, 0).start()

    @pl.when(h + 1 < num_heads)
    def _next():
        sched_row_copy(h + 1, jax.lax.rem(h + 1, 2)).start()

    def sched_at_buf(buf, i):
        return sched_smem[buf, i // 128, i % 128]

    def sched_at(i):
        return sched_at_buf(par, i)

    def qbits_at(i):
        return sched_smem[par, sched_rows + i // 128, i % 128]

    def flags_at_buf(buf, step):
        # bit 0: contiguous run; bit 1: fully-live step (see host).
        i = 1 + step
        return sched_smem[buf, 2 * sched_rows + i // 128, i % 128]

    def flags_at(step):
        return flags_at_buf(par, step)

    if emit_votes:
        votes_scr[...] = jnp.ones_like(votes_scr)
    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # Cross-cell KV pre-prime (round 4): only h == 0 waits its own
    # schedule copy -- for h > 0 the PREVIOUS grid cell (head h-1, same
    # core: h is the innermost "arbitrary" dim) already waited it
    # before reading the schedule to pre-issue this cell's first ring
    # DMAs (see _preprime_next below). Every started schedule copy is
    # still waited exactly once.
    if cross_prime:
        @pl.when(h == 0)
        def _wait_own():
            sched_row_copy(h, par).wait()
    else:
        sched_row_copy(h, par).wait()

    count = sched_at(0)
    num_steps = pl.cdiv(count, gsize)

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    q = q_ref[0, 0]
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        + qi * block_q
        < seqlen_q
    )
    rsub = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) // vq
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, MIN_LANES), 1)
    lane_all = jax.lax.broadcasted_iota(
        jnp.int32, (1, gsize * VOTE_TILE), 1
    )
    if emit_votes:
        # Per-fine-tile vote machinery (hoisted; loop-invariant).
        # Votes ride ONE packed (1, 128) row per step: lane qs*gsize+g =
        # vote of fine tile (qs, schedule position j*gsize+g); the
        # per-tile "any" reduction is the two-stage max in votes_from.
        assert qsubs * gsize <= MIN_LANES
        g0lane = (lane % gsize) == 0 if gsize > 1 else lane >= 0
        lane_in_g = lane < gsize

    # Scattered steps: one dynamic-offset copy per gathered fine tile,
    # all of a slot's copies sharing the slot semaphore -- the pattern
    # of the official paged-attention kernel
    # (jax.experimental.pallas.ops.tpu.paged_attention
    # MultiPageAsyncCopyDescriptor), with K|V fetched as one tile. Run
    # steps: one contiguous (gsize*128, 2D) copy, signalling the same
    # byte count on the same semaphore.
    def kv_copy(step, g, slot, buf=None, kvh=None):
        idx = sched_at_buf(par if buf is None else buf,
                           1 + step * gsize + g)
        return pltpu.make_async_copy(
            kv_hbm.at[b, hk if kvh is None else kvh,
                      pl.ds(idx * VOTE_TILE, VOTE_TILE)],
            kvbuf.at[slot, pl.ds(g * VOTE_TILE, VOTE_TILE)],
            dma_sems.at[slot],
        )

    def kv_run_copy(step, slot, buf=None, kvh=None, g0=0, blk=None):
        # Contiguous copy of ``blk`` tiles starting at schedule entry
        # g0 of the step (the whole step by default).
        blk = gsize if blk is None else blk
        idx0 = sched_at_buf(
            par if buf is None else buf, 1 + step * gsize + g0
        )
        return pltpu.make_async_copy(
            kv_hbm.at[b, hk if kvh is None else kvh,
                      pl.ds(idx0 * VOTE_TILE, blk * VOTE_TILE)],
            kvbuf.at[slot, pl.ds(g0 * VOTE_TILE, blk * VOTE_TILE)],
            dma_sems.at[slot],
        )

    def start_step(step, slot, buf=None, kvh=None):
        fl = flags_at_buf(par if buf is None else buf, step)

        @pl.when((fl & 1) == 1)
        def _run():
            kv_run_copy(step, slot, buf, kvh).start()

        @pl.when((fl & 1) == 0)
        def _scatter():
            # Sub-run buddy decomposition (round 5): a non-run step
            # still usually contains CONSECUTIVE stretches (evolved
            # masks are clumpy); the host flags, per power-of-two
            # sub-block, whether its entries are internally
            # consecutive (bits from _subrun_bits), and each flagged
            # sub-block moves as ONE wide copy. Worst case falls back
            # to per-tile copies; every path signals the same
            # gsize*128-row byte count on the slot semaphore.
            def emit(blk, g0, base):
                # Flag bit for this sub-block: base bit of its level
                # plus its group index (see _subrun_bits).
                if blk == 1:
                    kv_copy(step, g0, slot, buf, kvh).start()
                    return
                bit = base + g0 // blk

                @pl.when(((fl >> bit) & 1) == 1)
                def _sub():
                    kv_run_copy(step, slot, buf, kvh, g0, blk).start()

                @pl.when(((fl >> bit) & 1) == 0)
                def _split():
                    emit(blk // 2, g0, base + gsize // blk)
                    emit(blk // 2, g0 + blk // 2, base + gsize // blk)

            if gsize >= 4:
                half = gsize // 2
                emit(half, 0, 2)
                emit(half, half, 2)
            else:
                for g in range(gsize):
                    kv_copy(step, g, slot, buf, kvh).start()

    def wait_step(step, slot):
        # Either path signalled exactly gsize * 128 * 2D elements on
        # the slot semaphore; waiting on a descriptor of the same byte
        # count consumes that amount (DMA semaphores count bytes). The
        # wait descriptor uses a FIXED in-bounds source slice [0, gW):
        # a tail scatter step's idx0 can point at the last fine tile
        # (phantom duplicate entries), where idx0*128 + gW would run
        # past the end of kv_hbm -- .wait() never dereferences the
        # address today, but an always-valid range removes that
        # implicit contract (ADVICE r2).
        gw = gsize * VOTE_TILE
        pltpu.make_async_copy(
            kv_hbm.at[b, hk, pl.ds(0, gw)],
            kvbuf.at[slot],
            dma_sems.at[slot],
        ).wait()

    # Ring prime: only the FIRST cell of each core-local h-chain primes
    # itself; cells with h > 0 had their first nslot-1 step DMAs
    # pre-issued by the previous cell's _preprime_next (below), so
    # their compute starts with the transfers already in flight instead
    # of paying the issue+HBM latency of a cold ring every grid cell.
    nslot = kvbuf.shape[0]
    for i in range(nslot - 1):
        prime_now = (
            jnp.logical_and(h == 0, i < num_steps)
            if cross_prime
            else i < num_steps
        )

        @pl.when(prime_now)
        def _prime(i=i):
            start_step(i, i % nslot)

    def body(j, _):
        slot = jax.lax.rem(j, nslot)

        @pl.when(j + nslot - 1 < num_steps)
        def _prefetch():
            start_step(j + nslot - 1, jax.lax.rem(j + nslot - 1, nslot))

        wait_step(j, slot)
        # ONE wide QK^T over the packed gathered tiles (dense-kernel MXU
        # shape); fine-tile masking/votes then run on 128-column slices.
        # The QK matmul is computed INSIDE each pl.when branch so no
        # (block_q, gsize*128) tile crosses a region boundary (crossing
        # forces a VMEM materialization that costs more than the
        # duplicated matmul code).
        d_pk = q_ref.shape[-1]

        def qk_all():
            return (
                jax.lax.dot_general(
                    q,
                    kvbuf[slot][:, :d_pk],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                * (scale * LOG2E)
            )

        def votes_from(diff):
            # Fold per-(row, col) headroom ``s - m_prev`` into the
            # packed per-step vote row via a TWO-STAGE max (round 3):
            # first reduce the 128-row q-groups (a sublane reduction --
            # near-free on the VPU), THEN the 128-lane tile groups on
            # the tiny (qsubs, gW) remnant. Reduction order matters:
            # both the round-2 MXU one-hot matmul (a third full-width
            # MXU pass per step) and a direct full-width lane-tree
            # (~0.5 us/step) pay full price on the (block_q, gW) array;
            # this costs ~one elementwise pass (measured: vote overhead
            # 35 ms -> single-digit ms at 73k s=0). A round-4 attempt
            # to share per-128-lane segment maxes between the vote and
            # the running max (lane-segment reduce FIRST) re-measured
            # as a 2x kernel slowdown on chip -- the full-width
            # lane-group reduction is the expensive shape regardless of
            # what reuses it. Round 5 re-derivations, both MEASURED
            # SLOWER or unlowerable -- do not re-dig: (a) compare-first
            # + boolean reduction: Mosaic cannot lower i1 shape-casts /
            # vreg bitcasts (chip-only compile failure; interpret
            # passes); (b) 0/1 f32 indicator reduced by a tiny
            # (qsubs, block_q) selector MATMUL: +2.3 ms/call vote tax
            # vs this form at 73k (tiny-M matmuls underutilize the MXU
            # and the indicator select is a full pass anyway).
            rg = jnp.max(
                diff.reshape(qsubs, vq, gsize * VOTE_TILE), axis=1
            )  # (qsubs, gW)
            rgm = jnp.max(
                rg.reshape(qsubs, gsize, VOTE_TILE), axis=2
            )  # (qsubs, gsize)
            rgm = jnp.pad(
                rgm,
                ((0, 0), (0, MIN_LANES - gsize)),
                constant_values=-jnp.inf,
            )
            vote_row = jnp.zeros((1, MIN_LANES), jnp.int32)
            for qs in range(qsubs):
                any_qs = rgm[qs : qs + 1] > thr  # (1, 128), lane g
                vote_qs = jnp.where(
                    jnp.logical_and(lane_in_g, jnp.logical_not(any_qs)),
                    jnp.int32(1),
                    jnp.int32(0),
                )
                vote_row = vote_row | (
                    pltpu.roll(vote_qs, qs * gsize, 1)
                    if qs
                    else vote_qs
                )
            # Anchor: the globally-first surviving fine tile votes 0
            # (softmax.h:153); per-row-group anchoring is completed by
            # update_mask's first-live guard.
            vote_row = jnp.where(
                jnp.logical_and(j == 0, g0lane), jnp.int32(0), vote_row
            )
            votes_scr[pl.ds(j, 1), :] = vote_row

        def emit(s_masked, m_prev):
            # Shared online-softmax update: ONE wide max, ONE exp2
            # pass, ONE row-sum, ONE wide PV matmul per step.
            # --- per-fine-tile vote (softmax.h:194 semantics) ---
            # do(row, tile) = any score in the tile above m_prev + thr,
            # computed directly on the score tile so the vote chain
            # overlaps the softmax-update chain (voting on
            # p > 2^thr * alpha is mathematically identical but
            # serializes behind exp2 -- measured ~0.3 us/step slower).
            # Masked/phantom columns sit at DEFAULT_MASK_VALUE and can
            # never exceed the threshold of a row that has m_prev
            # > -inf; first-visit rows (m_prev = -inf) vote "do"
            # everywhere, and dead tiles' votes are never read by the
            # host decode.
            if emit_votes:
                # The padded-row select only exists when q rows can be
                # padding; at block-aligned seqlen_q it would be a pure
                # extra full-width VPU pass on the vote hot path.
                diff = s_masked - m_prev[:, :1]
                if seqlen_q % block_q != 0:
                    diff = jnp.where(row_valid, diff, -jnp.inf)
                votes_from(diff)
            local_max = jnp.max(s_masked, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, local_max)
            m_red = m_next[:, :1]
            alpha = jnp.exp2(m_prev[:, :1] - m_red)
            m_scr[...] = m_next
            p = jnp.exp2(s_masked - m_red)
            l_curr = jnp.sum(p, axis=1, keepdims=True)
            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
                p.astype(kvbuf.dtype),
                kvbuf[slot][:, d_pk:],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            l_scr[...] = alpha * l_scr[...] + l_curr

        @pl.when((flags_at(j) & 2) == 2)
        def _full():
            # Fully-live step (the common case on evolved video masks):
            # every entry valid, every q-row group live, no padded
            # tile -- consume the raw score tile, no sub-masking.
            emit(qk_all(), m_scr[...])

        @pl.when((flags_at(j) & 2) == 0)
        def _masked():
            # Partially-live step. Round-5 rework: the old form sliced
            # the score tile per 128-column group, masked each slice,
            # and re-concatenated -- ~3 extra full-width VPU passes per
            # step that made low-coherence masks (thr=-6-class) pay
            # ~17% over equal-sparsity coherent ones (the ACTUAL
            # scattered-step cost; the DMA-descriptor theory measured
            # out at ~1.85 descriptors/step). Now the per-entry qbits/
            # fidx scalars are painted onto ONE (1, gW) lane row
            # (trivial width-128 selects), and the whole tile is
            # masked by a single broadcast shift-and + select.
            s_all = qk_all()
            lane_g = lane_all // VOTE_TILE  # (1, gW) group index
            qb_row = jnp.zeros((1, gsize * VOTE_TILE), jnp.int32)
            for g in range(gsize):
                pos = j * gsize + g
                # Dead/phantom entries paint qbits 0 -> every q-row
                # group masked, subsuming the valid_entry check.
                qb = jnp.where(pos < count, qbits_at(1 + pos), 0)
                qb_row = jnp.where(lane_g == g, qb, qb_row)
            live = (
                jax.lax.shift_right_logical(
                    jnp.broadcast_to(qb_row, (block_q, gsize * VOTE_TILE)),
                    rsub,
                )
                & 1
            ) == 1
            if seqlen_k % VOTE_TILE != 0:
                col_row = jnp.zeros((1, gsize * VOTE_TILE), jnp.int32)
                for g in range(gsize):
                    fi = sched_at(1 + j * gsize + g)
                    col_row = jnp.where(lane_g == g, fi, col_row)
                col_row = (
                    col_row * VOTE_TILE + lane_all % VOTE_TILE
                )
                live = jnp.logical_and(live, col_row < seqlen_k)
            emit(
                jnp.where(live, s_all, DEFAULT_MASK_VALUE),
                m_scr[...],
            )

        return 0

    jax.lax.fori_loop(0, num_steps, body, 0)

    # Cross-cell KV pre-prime (round 4): all of this cell's kvbuf slots
    # are free after the loop's last wait, and head h+1's schedule copy
    # (started at cell entry) has long landed -- wait it here (the one
    # wait for that copy; see _wait_own) and pre-issue the next cell's
    # first ring DMAs so they overlap this cell's epilogue and the next
    # cell's prologue. The h-chain runs strictly sequentially on one
    # core ("arbitrary" innermost dim), exactly like the round-3
    # schedule prefetch this extends.
    if cross_prime:
        @pl.when(h + 1 < num_heads)
        def _preprime_next():
            par2 = jax.lax.rem(h + 1, 2)
            sched_row_copy(h + 1, par2).wait()
            steps2 = pl.cdiv(sched_at_buf(par2, 0), gsize)
            kvh2 = (h + 1) // group
            for i in range(nslot - 1):
                @pl.when(i < steps2)
                def _pp(i=i):
                    start_step(i, i % nslot, par2, kvh2)

    l = l_scr[:, :1]
    m_col = m_scr[:, :1]
    empty = m_col <= DEFAULT_MASK_VALUE * 0.5
    l_inv = jnp.where(
        jnp.logical_or(empty, l == 0.0), 0.0, 1.0 / jnp.maximum(l, 1e-37)
    )
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    lse = jnp.where(
        jnp.logical_or(empty, l == 0.0),
        -jnp.inf,
        m_col * LN2 + jnp.log(jnp.maximum(l, 1e-37)),
    )
    head_col = jax.lax.broadcasted_iota(jnp.int32, (block_q, num_heads), 1)
    lse_ref[0] = jnp.where(head_col == h, lse, lse_ref[0])
    if emit_votes:
        # Packed vote rows go out verbatim; this head owns its own
        # block (votes_ref block index depends on h), so no cross-head
        # scatter.
        votes_ref[0, 0, 0] = votes_scr[...]


def _lite_gather_kernel_hfold(
    # inputs
    thr_ref,  # SMEM (1, 1) float32
    sched_hbm,  # HBM [B, H, Qt, 3R, 128] int32
    q_ref,  # VMEM (1, hc, block_q, D)
    kv_hbm,  # ANY  [B, Hk, Skp, 2D]
    # outputs: o (1, hc, block_q, D), lse (1, 1, block_q, hc),
    #   votes (1, 1, hc, steps8, 128) when emit_votes
    # scratch: sched_smem (2, pow2(3R), 128), sched_sem (2,),
    #   kvbuf (NSLOT, gsize*128, 2D), dma_sems (NSLOT,),
    #   [votes_scr (steps8, 128)], m_scr, l_scr, acc_scr
    *refs,
    scale: float,
    group: int,
    num_heads: int,
    hc: int,
    block_q: int,
    seqlen_q: int,
    seqlen_k: int,
    qsubs: int,
    gsize: int,
    sched_rows: int,
    emit_votes: bool,
):
    """Head-folded gather kernel (round 5): one grid cell runs ``hc``
    heads of a (b, q-tile) in an in-kernel ``fori_loop``.

    Measured motive (tools/cell_overhead_probe.py, v5e, 73k tokens,
    (1024, 1024) tiles): per-step cost is affine in steps-per-cell with
    a 13.2 us FIXED cost per grid cell (Mosaic cell sequencing +
    ring/schedule ramp + epilogue) -- 7.6 ms total across the 576 cells
    of grid (B, Qt, H), and the entire residual of the lite kernel over
    the linear sparsity ideal (the mask's steps were censused 99.97%
    contiguous single-descriptor runs, so there is no scatter cost to
    cut). Folding H amortizes that fixed cost 8x; the inner loop keeps
    the round-3/4 overlap tricks in their natural form: head h+1's
    schedule row DMAs in while head h computes, and h+1's first ring
    slots are pre-issued from h's drained ring before h's epilogue.

    Compute order per (head, step) is IDENTICAL to the unfolded kernel
    -- outputs are bit-exact against it (test_hfold_matches_unfolded).
    """
    if emit_votes:
        (o_ref, lse_ref, votes_ref, sched_smem, sched_sem, kvbuf,
         dma_sems, votes_scr, m_scr, l_scr, acc_scr) = refs
    else:
        (o_ref, lse_ref, sched_smem, sched_sem, kvbuf,
         dma_sems, m_scr, l_scr, acc_scr) = refs
    b = pl.program_id(0)
    qi = pl.program_id(1)
    ci = pl.program_id(2)
    h0 = ci * hc
    thr = thr_ref[0, 0]
    vq = block_q // qsubs
    nslot = kvbuf.shape[0]

    def sched_row_copy(g, buf):
        return pltpu.make_async_copy(
            sched_hbm.at[b, g, qi],
            sched_smem.at[buf, pl.ds(0, sched_hbm.shape[3])],
            sched_sem.at[buf],
        )

    def sched_at_buf(buf, i):
        return sched_smem[buf, i // 128, i % 128]

    def qbits_at_buf(buf, i):
        return sched_smem[buf, sched_rows + i // 128, i % 128]

    def flags_at_buf(buf, step):
        i = 1 + step
        return sched_smem[buf, 2 * sched_rows + i // 128, i % 128]

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        + qi * block_q
        < seqlen_q
    )
    rsub = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) // vq
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, MIN_LANES), 1)
    lane_all = jax.lax.broadcasted_iota(
        jnp.int32, (1, gsize * VOTE_TILE), 1
    )
    if emit_votes:
        assert qsubs * gsize <= MIN_LANES
        g0lane = (lane % gsize) == 0 if gsize > 1 else lane >= 0
        lane_in_g = lane < gsize
    head_col = jax.lax.broadcasted_iota(jnp.int32, (block_q, hc), 1)

    def kv_copy(step, g, slot, buf, kvh):
        idx = sched_at_buf(buf, 1 + step * gsize + g)
        return pltpu.make_async_copy(
            kv_hbm.at[b, kvh, pl.ds(idx * VOTE_TILE, VOTE_TILE)],
            kvbuf.at[slot, pl.ds(g * VOTE_TILE, VOTE_TILE)],
            dma_sems.at[slot],
        )

    def kv_run_copy(step, slot, buf, kvh, g0=0, blk=None):
        blk = gsize if blk is None else blk
        idx0 = sched_at_buf(buf, 1 + step * gsize + g0)
        return pltpu.make_async_copy(
            kv_hbm.at[b, kvh, pl.ds(idx0 * VOTE_TILE, blk * VOTE_TILE)],
            kvbuf.at[slot, pl.ds(g0 * VOTE_TILE, blk * VOTE_TILE)],
            dma_sems.at[slot],
        )

    def start_step(step, slot, buf, kvh):
        fl = flags_at_buf(buf, step)

        @pl.when((fl & 1) == 1)
        def _run():
            kv_run_copy(step, slot, buf, kvh).start()

        @pl.when((fl & 1) == 0)
        def _scatter():
            def emit_dma(blk, g0, base):
                if blk == 1:
                    kv_copy(step, g0, slot, buf, kvh).start()
                    return
                bit = base + g0 // blk

                @pl.when(((fl >> bit) & 1) == 1)
                def _sub():
                    kv_run_copy(step, slot, buf, kvh, g0, blk).start()

                @pl.when(((fl >> bit) & 1) == 0)
                def _split():
                    emit_dma(blk // 2, g0, base + gsize // blk)
                    emit_dma(blk // 2, g0 + blk // 2, base + gsize // blk)

            if gsize >= 4:
                half = gsize // 2
                emit_dma(half, 0, 2)
                emit_dma(half, half, 2)
            else:
                for g in range(gsize):
                    kv_copy(step, g, slot, buf, kvh).start()

    def wait_step(slot):
        gw = gsize * VOTE_TILE
        pltpu.make_async_copy(
            kv_hbm.at[b, 0, pl.ds(0, gw)],
            kvbuf.at[slot],
            dma_sems.at[slot],
        ).wait()

    # First head's schedule; later heads are prefetched inside the loop.
    sched_row_copy(h0, 0).start()

    def head_body(hl, _):
        g_h = h0 + hl
        par = jax.lax.rem(hl, 2)
        kvh = g_h // group

        @pl.when(hl == 0)
        def _wait_own():
            sched_row_copy(g_h, par).wait()

        @pl.when(hl + 1 < hc)
        def _next_sched():
            sched_row_copy(g_h + 1, jax.lax.rem(hl + 1, 2)).start()

        count = sched_at_buf(par, 0)
        num_steps = pl.cdiv(count, gsize)

        if emit_votes:
            votes_scr[...] = jnp.ones_like(votes_scr)
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        # Only the chain's first head cold-primes its ring; later heads
        # were pre-primed from the previous head's drained ring (below).
        for i in range(nslot - 1):
            @pl.when(jnp.logical_and(hl == 0, i < num_steps))
            def _prime(i=i):
                start_step(i, i % nslot, par, kvh)

        q = q_ref[0, hl]
        d_pk = q_ref.shape[-1]

        def body(j, _):
            slot = jax.lax.rem(j, nslot)

            @pl.when(j + nslot - 1 < num_steps)
            def _prefetch():
                start_step(
                    j + nslot - 1, jax.lax.rem(j + nslot - 1, nslot),
                    par, kvh,
                )

            wait_step(slot)

            def qk_all():
                return (
                    jax.lax.dot_general(
                        q,
                        kvbuf[slot][:, :d_pk],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    * (scale * LOG2E)
                )

            def votes_from(diff):
                # Two-stage max; see the unfolded kernel's reduction-
                # order note (do not reorder).
                rg = jnp.max(
                    diff.reshape(qsubs, vq, gsize * VOTE_TILE), axis=1
                )
                rgm = jnp.max(
                    rg.reshape(qsubs, gsize, VOTE_TILE), axis=2
                )
                rgm = jnp.pad(
                    rgm,
                    ((0, 0), (0, MIN_LANES - gsize)),
                    constant_values=-jnp.inf,
                )
                vote_row = jnp.zeros((1, MIN_LANES), jnp.int32)
                for qs in range(qsubs):
                    any_qs = rgm[qs : qs + 1] > thr
                    vote_qs = jnp.where(
                        jnp.logical_and(
                            lane_in_g, jnp.logical_not(any_qs)
                        ),
                        jnp.int32(1),
                        jnp.int32(0),
                    )
                    vote_row = vote_row | (
                        pltpu.roll(vote_qs, qs * gsize, 1)
                        if qs
                        else vote_qs
                    )
                vote_row = jnp.where(
                    jnp.logical_and(j == 0, g0lane),
                    jnp.int32(0),
                    vote_row,
                )
                votes_scr[pl.ds(j, 1), :] = vote_row

            def emit(s_masked, m_prev):
                if emit_votes:
                    diff = s_masked - m_prev[:, :1]
                    if seqlen_q % block_q != 0:
                        diff = jnp.where(row_valid, diff, -jnp.inf)
                    votes_from(diff)
                local_max = jnp.max(s_masked, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, local_max)
                m_red = m_next[:, :1]
                alpha = jnp.exp2(m_prev[:, :1] - m_red)
                m_scr[...] = m_next
                p = jnp.exp2(s_masked - m_red)
                l_curr = jnp.sum(p, axis=1, keepdims=True)
                acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
                    p.astype(kvbuf.dtype),
                    kvbuf[slot][:, d_pk:],
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                l_scr[...] = alpha * l_scr[...] + l_curr

            @pl.when((flags_at_buf(par, j) & 2) == 2)
            def _full():
                emit(qk_all(), m_scr[...])

            @pl.when((flags_at_buf(par, j) & 2) == 0)
            def _masked():
                s_all = qk_all()
                lane_g = lane_all // VOTE_TILE
                qb_row = jnp.zeros((1, gsize * VOTE_TILE), jnp.int32)
                for g in range(gsize):
                    pos = j * gsize + g
                    qb = jnp.where(
                        pos < count, qbits_at_buf(par, 1 + pos), 0
                    )
                    qb_row = jnp.where(lane_g == g, qb, qb_row)
                live = (
                    jax.lax.shift_right_logical(
                        jnp.broadcast_to(
                            qb_row, (block_q, gsize * VOTE_TILE)
                        ),
                        rsub,
                    )
                    & 1
                ) == 1
                if seqlen_k % VOTE_TILE != 0:
                    col_row = jnp.zeros(
                        (1, gsize * VOTE_TILE), jnp.int32
                    )
                    for g in range(gsize):
                        fi = sched_at_buf(par, 1 + j * gsize + g)
                        col_row = jnp.where(lane_g == g, fi, col_row)
                    col_row = (
                        col_row * VOTE_TILE + lane_all % VOTE_TILE
                    )
                    live = jnp.logical_and(live, col_row < seqlen_k)
                emit(
                    jnp.where(live, s_all, DEFAULT_MASK_VALUE),
                    m_scr[...],
                )

            return 0

        jax.lax.fori_loop(0, num_steps, body, 0)

        # Pre-prime the NEXT head: this head's ring is fully drained
        # (every issued DMA was waited in the loop) and head hl+1's
        # schedule copy has long landed -- wait it (the one wait for
        # that copy) and issue hl+1's first ring slots so they overlap
        # this head's epilogue.
        @pl.when(hl + 1 < hc)
        def _preprime_next():
            par2 = jax.lax.rem(hl + 1, 2)
            sched_row_copy(g_h + 1, par2).wait()
            steps2 = pl.cdiv(sched_at_buf(par2, 0), gsize)
            kvh2 = (g_h + 1) // group
            for i in range(nslot - 1):
                @pl.when(i < steps2)
                def _pp(i=i):
                    start_step(i, i % nslot, par2, kvh2)

        l = l_scr[:, :1]
        m_col = m_scr[:, :1]
        empty = m_col <= DEFAULT_MASK_VALUE * 0.5
        l_inv = jnp.where(
            jnp.logical_or(empty, l == 0.0),
            0.0,
            1.0 / jnp.maximum(l, 1e-37),
        )
        o_ref[0, hl] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = jnp.where(
            jnp.logical_or(empty, l == 0.0),
            -jnp.inf,
            m_col * LN2 + jnp.log(jnp.maximum(l, 1e-37)),
        )
        lse_ref[0, 0] = jnp.where(head_col == hl, lse, lse_ref[0, 0])
        if emit_votes:
            votes_ref[0, 0, hl] = votes_scr[...]
        return 0

    jax.lax.fori_loop(0, hc, head_body, 0)


def _pad_seq(x: jax.Array, block: int) -> jax.Array:
    pad = (-x.shape[2]) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _subrun_levels(gsize: int):
    """Bit layout of the scattered-step buddy decomposition flags.

    Returns ``[(base_bit, blk)]`` per power-of-two sub-block level:
    the flag bit of the sub-block covering step entries
    ``[g0, g0 + blk)`` is ``base_bit + g0 // blk`` and means "these
    ``blk`` schedule entries are consecutive fine indices -> one wide
    DMA". Levels run from ``gsize // 2`` down to 2 (bit 0 already
    covers the full step, singles need no flag). For gsize = 8:
    halves ride bits 2-3, pairs bits 4-7.
    """
    levels = []
    base = 2
    blk = gsize // 2
    while blk >= 2:
        levels.append((base, blk))
        base += gsize // blk
        blk //= 2
    return levels


@functools.partial(
    jax.jit, static_argnames=("gsize", "qsubs", "seqlen_k")
)
def build_gather_schedule(
    fidx: jax.Array,
    count: jax.Array,
    qbits: jax.Array,
    *,
    gsize: int,
    qsubs: int,
    seqlen_k: int,
) -> jax.Array:
    """Pack a compacted gather schedule into the kernel's wire format.

    Produces the ``[B, H, Qt, 3R, 128]`` int32 row blocks the gather
    kernel DMAs to SMEM: ``[count, fidx...]`` + ``[0, qbits...]`` +
    ``[0, runflags...]`` (see ``_lite_gather_kernel``). Split out of the
    attention call (round 4) so the engine can CACHE the packed form
    alongside the compaction: assembly costs ~7 ms at 73k tokens on
    chip and the schedule only changes when the mask does, yet it used
    to be re-traced into EVERY step -- including the no-vote steps of a
    ``vote_stride`` cycle that exist precisely to amortize mask costs.

    Per-STEP flags: step p covers schedule entries
    [p*gsize, (p+1)*gsize).
      bit 0 (run):  the entries are consecutive fine indices -> one
                    contiguous DMA per operand instead of gsize.
      bit 1 (full): every entry is valid (no phantom tail), every
                    q-row group is live, and no entry touches the
                    padded tail tile -> the kernel skips sub-masking
                    entirely and consumes the raw score tile.
      bits 2+ (sub-runs, round 5): per power-of-two sub-block of a
                    NON-run step, "internally consecutive" -> the
                    kernel's buddy decomposition moves that sub-block
                    as one wide DMA (see ``_subrun_levels``); evolved
                    masks are clumpy, so scattered steps usually decay
                    to 2-4 descriptors instead of gsize.
    """
    b, h, qt, ktf = fidx.shape
    sched_rows = -(-(1 + ktf + gsize) // MIN_LANES)
    row_len = sched_rows * MIN_LANES

    def section(head, body):
        return jnp.concatenate(
            [
                head[..., None].astype(jnp.int32),
                body.astype(jnp.int32),
                jnp.zeros(
                    (b, h, qt, row_len - 1 - body.shape[-1]), jnp.int32
                ),
            ],
            axis=-1,
        ).reshape(b, h, qt, sched_rows, MIN_LANES)

    steps = -(-ktf // gsize)
    tail = ((0, 0),) * 3 + ((0, steps * gsize - ktf),)
    fpad = jnp.pad(fidx, tail, mode="edge").reshape(
        b, h, qt, steps, gsize
    )
    runflag = jnp.all(
        fpad == fpad[..., :1] + jnp.arange(gsize, dtype=fidx.dtype),
        axis=-1,
    )
    qbpad = jnp.pad(qbits, tail, mode="edge").reshape(
        b, h, qt, steps, gsize
    )
    full_qb = (1 << qsubs) - 1
    fullflag = jnp.logical_and(
        jnp.all(qbpad == full_qb, axis=-1),
        (jnp.arange(steps, dtype=jnp.int32) + 1) * gsize
        <= count[..., None],
    )
    if seqlen_k % VOTE_TILE != 0:
        fullflag = jnp.logical_and(
            fullflag, jnp.all(fpad != ktf - 1, axis=-1)
        )
    flags = runflag.astype(jnp.int32) + 2 * fullflag.astype(jnp.int32)
    # Sub-run bits: consec[..., i] marks entry i+1 consecutive with i.
    consec = fpad[..., 1:] == fpad[..., :-1] + 1
    for base, blk in _subrun_levels(gsize):
        for gi in range(gsize // blk):
            g0 = gi * blk
            sub = jnp.all(consec[..., g0 : g0 + blk - 1], axis=-1)
            flags = flags + (1 << (base + gi)) * sub.astype(jnp.int32)
    return jnp.concatenate(
        [
            section(count, fidx),
            section(jnp.zeros_like(count), qbits),
            section(jnp.zeros_like(count), flags),
        ],
        axis=3,
    )


def pack_kv(k: jax.Array, v: jax.Array) -> jax.Array:
    """Lane-interleave K|V into the gather kernel's ``[B, Hk, Skp, 2Dp]``
    HBM layout (rows padded to the 128 fine-tile grain, head dim padded
    to a lane multiple).

    Build this ONCE per KV and pass it as
    ``lite_flash_attention(packed_kv=...)``: the concatenation
    materializes the full KV (~2x KV bytes of HBM traffic), which is a
    fixed ~5 ms per call at 73k tokens if rebuilt inside the step --
    the round-4 per-call floor. The engine caches it alongside the
    schedule; a model gets the layout for FREE by concatenating its K
    and V projection weight columns (one matmul then writes the packed
    array directly -- the same trick as qkv-packed projections,
    reference flash_attn_interface.py qkv_packed entry points).
    """
    kp = _pad_seq(k, VOTE_TILE)
    vp = _pad_seq(v, VOTE_TILE)
    d = k.shape[-1]
    d_pad = (-d) % MIN_LANES
    if d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        kp, vp = jnp.pad(kp, pad), jnp.pad(vp, pad)
    return jnp.concatenate([kp, vp], axis=-1)


def _lite_gather_call(
    q, k, v, fidx, count, threshold, qbits,
    *, scale, block_q, gsize, interpret, emit_votes=True,
    packed_schedule=None, cross_prime=True, packed_kv=None,
    seqlen_k=None, kv_map=None, fold_h=None,
):
    """Host side of the gather schedule (see _lite_gather_kernel)."""
    b, h, sq, d = q.shape
    qsubs = block_q // VOTE_TILE
    # Head folding (round 5): run up to ``fold_h`` heads per grid cell
    # to amortize the measured ~13 us fixed cost per Mosaic grid cell
    # (see _lite_gather_kernel_hfold). hc must divide h; fall back to
    # the largest divisor <= fold_h.
    hc = max(1, min(int(fold_h or 1), h))
    while h % hc:
        hc -= 1

    qp = _pad_seq(q, block_q)
    d_pad = (-d) % MIN_LANES
    if d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        qp = jnp.pad(qp, pad)
    d_p = d + d_pad
    sq_p = qp.shape[2]
    qt = sq_p // block_q
    # K and V ride ONE flat [B, Hk, Skp, 2D] array (lane-concatenated):
    # each gathered fine tile is a single 128-row-aligned DMA covering
    # both operands, and the flat (gsize*128, 2D) ring buffer feeds the
    # fused matmuls with no in-kernel reshape. Callers on the hot path
    # pass it pre-built (see pack_kv); rebuilding it here costs a fixed
    # ~5 ms at 73k tokens (2x KV bytes of HBM traffic per call).
    if packed_kv is not None:
        kvp = packed_kv
        assert kvp.shape[0] == b and kvp.shape[3] == 2 * d_p, (
            kvp.shape, (b, 2 * d_p))
        hk = kvp.shape[1]
        sk = seqlen_k if seqlen_k is not None else (
            k.shape[2] if k is not None else kvp.shape[2])
    else:
        hk = k.shape[1]
        sk = k.shape[2]
        kvp = pack_kv(k, v)
    group = h // hk
    ktf = kvp.shape[2] // VOTE_TILE
    assert fidx.shape == (b, h, qt, ktf), (fidx.shape, (b, h, qt, ktf))
    assert count.shape == (b, h, qt)
    assert qbits.shape == (b, h, qt, ktf)

    # Schedule: [count, fidx...] + [0, qbits...] + [0, runflags...];
    # width covers the worst-case over-read (up to gsize - 1 phantom
    # entries past count). A caller holding a cached packed schedule
    # (the engine between vote steps) passes it verbatim.
    sched_rows = -(-(1 + ktf + gsize) // MIN_LANES)
    steps = -(-ktf // gsize)
    # Vote rows are packed one per STEP (lane qs*gsize+g).
    steps8 = max(8, -(-steps // 8) * 8)
    if packed_schedule is None:
        schedule = build_gather_schedule(
            fidx, count, qbits, gsize=gsize, qsubs=qsubs, seqlen_k=sk
        )
    else:
        schedule = packed_schedule
    assert schedule.shape == (b, h, qt, 3 * sched_rows, MIN_LANES), (
        schedule.shape, (b, h, qt, 3 * sched_rows, MIN_LANES))

    thr = jnp.reshape(threshold.astype(jnp.float32), (1, 1))
    if hc > 1:
        kernel = functools.partial(
            _lite_gather_kernel_hfold,
            scale=scale,
            group=group,
            num_heads=h,
            hc=hc,
            block_q=block_q,
            seqlen_q=sq,
            seqlen_k=sk,
            qsubs=qsubs,
            gsize=gsize,
            sched_rows=sched_rows,
            emit_votes=emit_votes,
        )
        grid = (b, qt, h // hc)
        out_specs = [
            pl.BlockSpec(
                (1, hc, block_q, d_p), lambda bi, qi, ci: (bi, ci, qi, 0)
            ),
            # lse rides [B, H/hc, Sq_p, hc] so the block's minor dim
            # equals an array dim (the last-two-dims rule); the host
            # transposes back to [B, H, Sq] below.
            pl.BlockSpec(
                (1, 1, block_q, hc), lambda bi, qi, ci: (bi, ci, qi, 0)
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, h, sq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b, h // hc, sq_p, hc), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _lite_gather_kernel,
            scale=scale,
            group=group,
            num_heads=h,
            block_q=block_q,
            seqlen_q=sq,
            seqlen_k=sk,
            qsubs=qsubs,
            gsize=gsize,
            sched_rows=sched_rows,
            emit_votes=emit_votes,
            cross_prime=cross_prime,
        )
        grid = (b, qt, h)
        out_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d_p), lambda bi, qi, hi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec((1, block_q, h), lambda bi, qi, hi: (bi, qi, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, h, sq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b, sq_p, h), jnp.float32),
        ]
    # Ring depth adapts to slot footprint: 4-deep at the default
    # (<= 512 KB slots), 2-deep (classic double buffer) for wide
    # block_k tiles whose 4-deep ring blew the scoped-VMEM budget
    # (round-4: (1024, 2048) failed to allocate). Depth was measured
    # insensitive at the default geometry (round 2).
    slot_bytes = gsize * VOTE_TILE * 2 * d_p * kvp.dtype.itemsize
    nslots = RING_SLOTS if slot_bytes <= (512 << 10) else 2
    scratch = [
        pltpu.SMEM((2, _pow2(3 * sched_rows), MIN_LANES), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((nslots, gsize * VOTE_TILE, 2 * d_p), kvp.dtype),
        pltpu.SemaphoreType.DMA((nslots,)),
    ]
    if emit_votes:
        if hc > 1:
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, hc, steps8, MIN_LANES),
                    lambda bi, qi, ci: (bi, qi, ci, 0, 0),
                )
            )
        else:
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, steps8, MIN_LANES),
                    lambda bi, qi, hi: (bi, qi, hi, 0, 0),
                )
            )
        out_shape.append(
            jax.ShapeDtypeStruct((b, qt, h, steps8, MIN_LANES), jnp.int32)
        )
        scratch.append(pltpu.VMEM((steps8, MIN_LANES), jnp.int32))
    scratch += [
        pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
        pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
        pltpu.VMEM((block_q, d_p), jnp.float32),
    ]
    if hc > 1:
        q_spec = pl.BlockSpec(
            (1, hc, block_q, d_p), lambda bi, qi, ci: (bi, ci, qi, 0)
        )
        semantics = ("parallel", "parallel", "parallel")
    else:
        q_spec = pl.BlockSpec(
            (1, 1, block_q, d_p), lambda bi, qi, hi: (bi, hi, qi, 0)
        )
        semantics = ("parallel", "parallel", "arbitrary")
    if hc > 1:
        # The folded cell's q/o blocks (hc * block_q rows each, double-
        # buffered by Mosaic) overflow the default 16 MB scoped-VMEM
        # budget by a couple of MB at (1024, 1024) x hc=8; raise the
        # limit (v5e has 128 MB of VMEM).
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    else:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=semantics,
        )
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1), lambda bi, qi, hi: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            q_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )(thr, schedule, qp, kvp)
    out, lse = results[0], results[1]
    out = out[:, :, :sq, :d]
    if hc > 1:
        # [B, H/hc, Sq_p, hc] -> [B, H, Sq]
        lse = jnp.transpose(lse, (0, 1, 3, 2)).reshape(b, h, sq_p)[
            :, :, :sq
        ]
    else:
        lse = jnp.transpose(lse[:, :sq, :], (0, 2, 1))
    if not emit_votes:
        return out, lse, None
    votes = results[2]
    # Kernel votes are packed rows in SCHEDULE order: row j, lane
    # qs*gsize+g of (b, qt, h) is the vote of fine k-tile
    # fidx[b, h, qt, j*gsize+g] for q-row-group qs. The schedule lists
    # survivors in INCREASING index order, but phantom tail entries
    # REPEAT the last live index, so several schedule positions can
    # alias one fine tile: the decode must OR the "do" votes of every
    # aliased position, not gather one of them. A cumsum-rank decode
    # built on qbits was tried in round 2 and silently collapsed masks
    # (qbits is SCHEDULE-aligned, not fine-indexed; caught by
    # tests/test_lite_fine.py::test_gather_votes_match_oracle) -- do
    # not "simplify" back to it. Dead tiles vote the neutral 1 (the
    # monotone update keeps them skipped).
    #
    # The scatter is expressed as a one-hot MATMUL, not jnp scatter-min:
    # fine_do[f] = sum_j onehot(fidx[j] == f) * do[j] > 0. An XLA
    # scatter over the minor dim lowers to a serial loop and cost 26 ms
    # at 73k tokens on v5e; the einsum runs in ~2 ms (MXU) with exact
    # parity -- same pathology and fix as the diagonal-extraction
    # einsum-with-identity gotcha (round 3).
    raw = votes[:, :, :, :steps, : qsubs * gsize].reshape(
        b, qt, h, steps, qsubs, gsize
    )
    sched_votes = jnp.transpose(raw, (0, 2, 1, 4, 3, 5)).reshape(
        b, h, qt, qsubs, steps * gsize
    )[..., :ktf]
    pos = jnp.arange(ktf, dtype=jnp.int32)
    valid = pos[None, None, None] < count[..., None]  # [B, H, Qt, Ktf]
    do = jnp.logical_and(
        sched_votes == 0, valid[:, :, :, None, :]
    ).astype(jnp.bfloat16)
    # onehot[j, f] = (fidx[j] == f); bf16 is exact here (0/1 entries,
    # f32 MXU accumulation, and the result is only tested > 0).
    # Compact-KV schedules (round 5) carry COMPACT positions in fidx;
    # the decode then compares against kv_map (fine tile -> compact
    # position) instead of the raw fine iota -- same einsum, and tiles
    # dead in the union (kv_map == -1) never match a schedule entry,
    # so they keep the neutral vote 1.
    if kv_map is not None:
        if kv_map.shape[1] != h:
            kv_map = jnp.repeat(kv_map, group, axis=1)
        cmp = kv_map[:, :, None, None, :]  # [B, H, 1, 1, Ktf]
    else:
        cmp = pos[None, :]
    onehot = (fidx[..., :, None] == cmp).astype(jnp.bfloat16)
    fine_do = jnp.einsum("bhqsj,bhqjf->bhqsf", do, onehot)
    fine_votes = jnp.where(fine_do > 0, 0, 1).astype(jnp.int32)
    votes = fine_votes.reshape(b, h, qt * qsubs, ktf)
    return out, lse, votes


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "block_sizes", "fine_schedule", "interpret", "emit_votes",
        "cross_prime", "seqlen_k", "fold_h",
    ),
)
def lite_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_idx: jax.Array,
    count: jax.Array,
    threshold: jax.Array,
    kv_bits: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    fine_schedule: bool = False,
    interpret: Optional[bool] = None,
    emit_votes: bool = True,
    packed_schedule: Optional[jax.Array] = None,
    cross_prime: bool = True,
    packed_kv: Optional[jax.Array] = None,
    seqlen_k: Optional[int] = None,
    kv_map: Optional[jax.Array] = None,
    fold_h: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Sparse flash attention over a compacted skip mask, emitting votes.

    Three schedule modes share this entry:

    * **Coarse** (``kv_bits=None``): the mask is at compute-tile
      granularity (round-1 behavior; the reference's own granularity
      model). Votes come back ``[B, H, Qt, Kt]``.
    * **Fine super-tile** (``kv_bits`` from
      :func:`liteattention_tpu.ops.mask.compact_mask_fine`): the mask is
      at 128x128 fine granularity; scheduled super-tiles carry a
      liveness bitmap, dead fine tiles are masked from the scores, and
      votes come back ``[B, H, Qt * qsubs, Kt * ksubs]`` (fine).
      Elimination happens at super-tile granularity (needs clustered
      sparsity to convert into runtime).
    * **Gather** (``fine_schedule=True``; inputs from
      :func:`liteattention_tpu.ops.mask.compact_mask_gather`): the
      schedule lists surviving FINE k-tiles directly and each pipeline
      step gathers ``block_k // 128`` of them from anywhere -- runtime
      scales with fine sparsity itself, no clustering needed. This is
      the round-2 default engine path (VERDICT item 1).

    Args:
      q, k, v: ``[B, H, S, D]`` (bf16/f32). GQA supported when Hk divides H.
      kv_idx: int32 ``[B, H, Qt, Kt]`` compacted surviving k-tile indices
        (super-tile granularity).
      count: int32 ``[B, H, Qt]`` surviving counts (>= 1).
      threshold: fp32 scalar (traced -- changing the per-timestep
        calibrated threshold does not recompile; reference
        ``set_threshold``, hopper/lite_attention.py:306-313).
      kv_bits: optional int32 ``[B, H, Qt, Kt]`` fine-tile liveness
        bitmaps aligned with ``kv_idx``.
      scale: softmax scale (default 1/sqrt(D)).
      emit_votes: gather path only. When False the entire vote chain
        (threshold compare + MXU one-hot reduction + packed-row store +
        host decode) is compiled out and ``votes`` returns None -- the
        engine's ``vote_stride`` amortization (PARITY.md round-3
        deviation note).
      packed_schedule: gather path only. Optional pre-packed wire-format
        schedule from :func:`build_gather_schedule` (must have been
        built from the SAME (kv_idx, count, kv_bits) and geometry).
        Skips the ~7 ms/step assembly; the engine caches it between
        vote steps.
      packed_kv: gather path only. Optional pre-interleaved K|V HBM
        array from :func:`pack_kv` (``[B, Hk, Skp, 2Dp]``). Skips the
        in-call interleave -- a fixed ~5 ms of HBM traffic per call at
        73k tokens. When given, ``k``/``v`` may be ``None`` (pass
        ``seqlen_k`` for the unpadded key length; defaults to the
        packed row count).
      seqlen_k: unpadded key length when ``k`` is None (packed_kv path).
      kv_map: gather path only. int32 ``[B, Hk, Ktf]`` fine-tile ->
        compact-position map from
        :func:`liteattention_tpu.ops.kv_compact.kv_union_map` when the
        schedule was packed with ``pack_schedule(kv_map=...)`` and
        ``packed_kv`` was relayouted with
        :func:`~liteattention_tpu.ops.kv_compact.compact_kv`. Only the
        vote decode consumes it (the kernel is index-space agnostic).
      fold_h: gather path only (round 5, experimental). Run up to this
        many heads per grid cell via the in-kernel head loop
        (``_lite_gather_kernel_hfold``; bit-exact vs the default).
        Measured NEUTRAL on v5e at the bench point once the dispatch
        bias was fixed -- kept for A/B and for hardware where
        per-grid-cell overhead is larger. Default None = unfolded.

    Returns:
      out ``[B, H, Sq, D]``, lse fp32 ``[B, H, Sq]``,
      votes int32 at the mask's granularity (1 = skippable next step;
      positions outside the current mask are 1 and are neutralized by
      the monotone update in
      :func:`liteattention_tpu.ops.mask.update_mask`).
    """
    if interpret is None:
        interpret = _default_interpret()
    b, h, sq, d = q.shape
    if k is not None:
        hk = k.shape[1]
        sk = k.shape[2]
    else:
        assert packed_kv is not None and fine_schedule, (
            "k/v may only be omitted on the gather path with packed_kv")
        hk = packed_kv.shape[1]
        sk = seqlen_k if seqlen_k is not None else packed_kv.shape[2]
    assert h % hk == 0
    group = h // hk
    if scale is None:
        scale = 1.0 / (d**0.5)
    bs = block_sizes or get_block_sizes(d, q.dtype.itemsize, kind="lite")
    block_q, block_k = bs.block_q, bs.block_k
    block_q = min(block_q, max(128, -(-sq // 128) * 128))
    block_k = min(block_k, max(128, -(-sk // 128) * 128))
    if fine_schedule:
        assert kv_bits is not None, (
            "fine_schedule needs (fidx, count, qbits) from "
            "compact_mask_gather"
        )
        return _lite_gather_call(
            q, k, v, kv_idx, count, threshold, kv_bits,
            scale=scale, block_q=block_q, gsize=block_k // VOTE_TILE,
            interpret=interpret, emit_votes=emit_votes,
            packed_schedule=packed_schedule, cross_prime=cross_prime,
            packed_kv=packed_kv, seqlen_k=sk, kv_map=kv_map,
            fold_h=fold_h,
        )
    assert packed_kv is None, "packed_kv is a gather-path argument"
    assert kv_map is None, "kv_map is a gather-path argument"
    if kv_bits is None:
        qsubs = ksubs = 1
    else:
        qsubs = max(1, block_q // VOTE_TILE)
        ksubs = max(1, block_k // VOTE_TILE)

    qp = _pad_seq(q, block_q)
    kp = _pad_seq(k, block_k)
    vp = _pad_seq(v, block_k)
    # The hand-rolled K/V DMAs slice [tile*block_k, block_k) x [0, D): the
    # minor dim must be a 128-lane multiple, so small head dims are
    # zero-padded (zeros are exact no-ops through QK^T and PV). The
    # flagship head_dim=128 pays nothing.
    d_pad = (-d) % MIN_LANES
    if d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        qp, kp, vp = jnp.pad(qp, pad), jnp.pad(kp, pad), jnp.pad(vp, pad)
    d_p = d + d_pad
    sq_p, sk_p = qp.shape[2], kp.shape[2]
    qt, kt = sq_p // block_q, sk_p // block_k
    assert kv_idx.shape == (b, h, qt, kt), (kv_idx.shape, (b, h, qt, kt))
    assert count.shape == (b, h, qt)
    ktf = kt * ksubs
    ktf8 = max(8, -(-ktf // 8) * 8)

    # Schedule rows: [count, idx_0, ..., idx_{Kt-1}] per (b, h, q-tile),
    # stored as (R, 128) int32 tiles per row so the per-step HBM->SMEM DMA
    # slices whole tiles. Fine mode appends a second R-row group holding
    # the sub-mask bitmaps at the same flat positions (1 + j).
    sched_rows = -(-(1 + kt) // MIN_LANES)
    row_len = sched_rows * MIN_LANES
    sections = [
        jnp.concatenate(
            [
                count[..., None].astype(jnp.int32),
                kv_idx.astype(jnp.int32),
                jnp.zeros((b, h, qt, row_len - 1 - kt), jnp.int32),
            ],
            axis=-1,
        ).reshape(b, h, qt, sched_rows, MIN_LANES)
    ]
    if kv_bits is not None:
        assert kv_bits.shape == (b, h, qt, kt)
        sections.append(
            jnp.concatenate(
                [
                    jnp.zeros((b, h, qt, 1), jnp.int32),
                    kv_bits.astype(jnp.int32),
                    jnp.zeros((b, h, qt, row_len - 1 - kt), jnp.int32),
                ],
                axis=-1,
            ).reshape(b, h, qt, sched_rows, MIN_LANES)
        )
    schedule = (
        jnp.concatenate(sections, axis=3)
        if len(sections) > 1
        else sections[0]
    )
    smem_rows = sched_rows * len(sections)

    thr = jnp.reshape(threshold.astype(jnp.float32), (1, 1))
    kernel = functools.partial(
        _lite_kernel,
        scale=scale,
        group=group,
        num_heads=h,
        block_q=block_q,
        block_k=block_k,
        seqlen_q=sq,
        seqlen_k=sk,
        qsubs=qsubs,
        ksubs=ksubs,
        sched_rows=sched_rows,
    )
    grid = (b, qt, h)
    out, lse, votes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1), lambda bi, qi, hi: (0, 0), memory_space=pltpu.SMEM
            ),
            # Schedule rows must stay in HBM: the per-step row DMA slices
            # single sublanes, which VMEM tiling cannot express.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, 1, block_q, d_p), lambda bi, qi, hi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d_p), lambda bi, qi, hi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec((1, block_q, h), lambda bi, qi, hi: (bi, qi, 0)),
            pl.BlockSpec(
                (1, 1, qsubs, ktf8, h),
                lambda bi, qi, hi: (bi, qi, 0, 0, 0),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b, sq_p, h), jnp.float32),
            jax.ShapeDtypeStruct((b, qt, qsubs, ktf8, h), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((_pow2(smem_rows), MIN_LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((ktf8, MIN_LANES), jnp.int32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(thr, schedule, qp, kp, vp)
    out = out[:, :, :sq, :d]
    lse = jnp.transpose(lse[:, :sq, :], (0, 2, 1))
    # votes [B, Qt, qsubs, ktf8, H] -> [B, H, Qt*qsubs, Ktf] (fine) or
    # [B, H, Qt, Kt] (coarse; qsubs == ksubs == 1).
    votes = jnp.transpose(votes[:, :, :, :ktf, :], (0, 4, 1, 2, 3))
    votes = votes.reshape(b, h, qt * qsubs, ktf)
    return out, lse, votes


__all__ = [
    "lite_flash_attention",
    "build_gather_schedule",
    "LOG2E",
    "VOTE_TILE",
]
