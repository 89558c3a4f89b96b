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
* The fused skip detection of ``Softmax::max_get_scale_detect_qk_skip``
  (softmax.h:139-222) becomes a per-tile vote computed from the same
  fp32 online-softmax state the kernel already holds: a tile votes
  "skippable" iff **no valid q-row** satisfies
  ``(local_max - running_max_prev) * scale * log2(e) > thr``. The first
  visited tile always votes 0 (softmax.h:153). The 4-warp AND
  (mainloop:1721-1725) is inherently a full-tile AND here.
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


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


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
    sched_hbm,  # HBM [B, H, Qt, R, 128] int32 schedule rows
    q_ref,  # VMEM (1, 1, block_q, D)
    k_hbm,  # ANY  [B, Hk, Sk_pad, D]
    v_hbm,  # ANY  [B, Hk, Sk_pad, D]
    # outputs
    o_ref,  # VMEM (1, 1, block_q, D)
    lse_ref,  # VMEM (1, block_q, H)    layout [B, Sq, H]
    votes_ref,  # VMEM (1, 1, kt8, H) int32   layout [B, Qt, Kt8, H]
    # scratch
    sched_smem,  # SMEM (R, 128) int32
    sched_sem,
    step_smem,  # SMEM (1,) int32 inner-step counter
    votes_scr,  # VMEM (kt8, MIN_LANES) int32
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
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    h = pl.program_id(2)
    hk = h // group
    thr = thr_ref[0, 0]
    kt8 = votes_scr.shape[0]

    # Fetch this row's schedule [count, idx_0, ...] into scalar memory.
    # The row is stored as full (R, 128) tiles so the HBM slice stays
    # tile-aligned (Mosaic rejects sub-8 sublane slices).
    row_dma = pltpu.make_async_copy(
        sched_hbm.at[b, h, qi], sched_smem, sched_sem
    )
    row_dma.start()

    def sched_at(i):
        return sched_smem[i // 128, i % 128]

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
        # Inner pipeline body: one surviving k-tile. Multi-buffered
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
        if seqlen_k % block_k != 0:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + tile * block_k
            )
            s = jnp.where(col < seqlen_k, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        local_max = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]

        # --- QK-Skip detection (softmax.h:194 semantics, fp32) ---
        # local_max/m_prev are in log2 units; thr is log2-space by
        # definition, so the comparison is direct.
        do_qk = (local_max - m_prev[:, :1]) > thr
        any_do = jnp.any(jnp.logical_and(do_qk, row_valid))
        vote = jnp.where(
            j == 0, jnp.int32(0), jnp.logical_not(any_do).astype(jnp.int32)
        )
        votes_scr[pl.ds(tile, 1), :] = jnp.full(
            (1, votes_scr.shape[1]), vote, jnp.int32
        )

        # --- online softmax update (log2 space) ---
        m_next = jnp.maximum(m_prev, local_max)
        alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp2(s - m_next[:, :1])
        l_curr = jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = alpha * l_scr[...] + l_curr
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v_blk.dtype),
            v_blk[...],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
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
    vote_col = jax.lax.broadcasted_iota(jnp.int32, (kt8, num_heads), 1)
    votes_ref[0, 0] = jnp.where(
        vote_col == h, votes_scr[:, :1], votes_ref[0, 0]
    )


def _pad_seq(x: jax.Array, block: int) -> jax.Array:
    pad = (-x.shape[2]) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_sizes", "interpret"),
)
def lite_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_idx: jax.Array,
    count: jax.Array,
    threshold: jax.Array,
    scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sparse flash attention over a compacted skip mask, emitting votes.

    Args:
      q, k, v: ``[B, H, S, D]`` (bf16/f32). GQA supported when Hk divides H.
      kv_idx: int32 ``[B, H, Qt, Kt]`` compacted surviving k-tile indices
        (from :func:`liteattention_tpu.ops.mask.compact_mask`).
      count: int32 ``[B, H, Qt]`` surviving counts (>= 1).
      threshold: fp32 scalar (traced -- changing the per-timestep
        calibrated threshold does not recompile; reference
        ``set_threshold``, hopper/lite_attention.py:306-313).
      scale: softmax scale (default 1/sqrt(D)).

    Returns:
      out ``[B, H, Sq, D]``, lse fp32 ``[B, H, Sq]``,
      votes int32 ``[B, H, Qt, Kt]`` (1 = skippable next step; positions
      outside the current mask are 1 and are neutralized by the monotone
      update in :func:`liteattention_tpu.ops.mask.update_mask`).
    """
    if interpret is None:
        interpret = _default_interpret()
    b, h, sq, d = q.shape
    hk = k.shape[1]
    assert h % hk == 0
    group = h // hk
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / (d**0.5)
    bs = block_sizes or get_block_sizes(d, q.dtype.itemsize)
    block_q, block_k = bs.block_q, bs.block_k
    block_q = min(block_q, max(128, -(-sq // 128) * 128))
    block_k = min(block_k, max(128, -(-sk // 128) * 128))

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
    kt8 = max(8, -(-kt // 8) * 8)

    # Schedule rows: [count, idx_0, ..., idx_{Kt-1}] per (b, h, q-tile),
    # stored as (R, 128) int32 tiles per row so the per-step HBM->SMEM DMA
    # slices whole tiles.
    sched_rows = -(-(1 + kt) // MIN_LANES)
    row_len = sched_rows * MIN_LANES
    schedule = jnp.concatenate(
        [
            count[..., None].astype(jnp.int32),
            kv_idx.astype(jnp.int32),
            jnp.zeros((b, h, qt, row_len - 1 - kt), jnp.int32),
        ],
        axis=-1,
    ).reshape(b, h, qt, sched_rows, MIN_LANES)

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
                (1, 1, kt8, h), lambda bi, qi, hi: (bi, qi, 0, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b, sq_p, h), jnp.float32),
            jax.ShapeDtypeStruct((b, qt, kt8, h), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((sched_rows, MIN_LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((kt8, MIN_LANES), jnp.int32),
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
    votes = jnp.transpose(votes[:, :, :kt, :], (0, 3, 1, 2))
    return out, lse, votes


__all__ = ["lite_flash_attention", "LOG2E"]
