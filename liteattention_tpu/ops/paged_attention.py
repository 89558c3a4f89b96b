"""Paged-KV decode attention (Pallas/TPU).

TPU-native counterpart of the reference's paged-KV machinery
(reference hopper/_internal/cpp/paged_kv.h + the ``page_table`` path of
``flash_attn_with_kvcache``, flash_api.cpp:410-466): the KV cache lives
in non-contiguous fixed-size pages; each sequence owns an arbitrary list
of pages.

Design (cf. the public JAX paged-attention pattern): pages ARE blocks.
``k_pages`` has shape ``[Hk, num_pages, page_size, D]``, so one page is
exactly one BlockSpec block, and the per-sequence page walk is an inner
``emit_pipeline`` over ``ceil(len/page_size)`` steps whose index map
reads the page table from scalar memory -- multi-buffered page gathers
without hand-rolled semaphores. The reference's TMA page loads
(paged_kv.h) map onto the same pipeline.

Decode-only (one query token per sequence); prefill goes through
:func:`liteattention_tpu.ops.flash_fwd.flash_attention_masked`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634
MIN_LANES = 128


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _paged_kernel(
    # scalar prefetch
    lengths_ref,  # SMEM [B] int32
    page_tbl_ref,  # SMEM [B, P] int32
    # inputs
    q_ref,  # VMEM (1, 1, group, D)
    k_pages,  # ANY [Hk, num_pages, page_size, D]
    v_pages,  # ANY [Hk, num_pages, page_size, D]
    # outputs
    o_ref,  # VMEM (1, 1, group, D)
    lse_ref,  # VMEM (1, 1, group, MIN_LANES) fp32
    # scratch
    step_smem,  # SMEM (1,) int32
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    page_size: int,
    group: int,
    seqlen_q: int,
    causal: bool,
):
    b = pl.program_id(0)
    hk = pl.program_id(1)
    length = lengths_ref[b]
    num_blocks = pl.cdiv(length, page_size)

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    step_smem[0] = 0
    # f32 inputs must force full-precision MXU passes (the default
    # silently rounds through bf16 -- found by the on-chip parity smoke).
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    q = q_ref[0, 0]  # (group, D)

    def inner(k_blk, v_blk):
        j = step_smem[0]
        s = jax.lax.dot_general(
            q,
            k_blk[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (group, page_size)
        s = s * (scale * LOG2E)
        col = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            + j * page_size
        )
        if causal and seqlen_q > 1:
            # Bottom-right causal append/prefill: the q rows are laid out
            # (qi, group) interleaved, and q row qi sees cache positions
            # < length - seqlen_q + qi + 1 (FA kvcache alignment).
            qi_row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // group
            bound = length - seqlen_q + qi_row + 1
        else:
            bound = length
        s = jnp.where(col < bound, s, DEFAULT_MASK_VALUE)
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp2(s - m_next[:, :1])
        m_scr[...] = m_next
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v_blk.dtype),
            v_blk[0],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        step_smem[0] = j + 1

    d_p = q_ref.shape[-1]
    pipe = pltpu.emit_pipeline(
        inner,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, page_size, d_p),
                lambda j: (page_tbl_ref[b, j], 0, 0),
            ),
            pl.BlockSpec(
                (1, page_size, d_p),
                lambda j: (page_tbl_ref[b, j], 0, 0),
            ),
        ],
    )
    pipe(k_pages.at[hk], v_pages.at[hk])

    l = l_scr[:, :1]
    m_col = m_scr[:, :1]
    empty = m_col <= DEFAULT_MASK_VALUE * 0.5
    l_inv = jnp.where(
        jnp.logical_or(empty, l == 0.0), 0.0, 1.0 / jnp.maximum(l, 1e-37)
    )
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    # Natural-log LSE (m is in log2 units), -inf for empty rows --
    # the reference returns softmax_lse from the paged path too
    # (hopper/_internal/flash_attn_interface.py flash_attn_with_kvcache).
    lse = jnp.where(
        jnp.logical_or(empty, l == 0.0),
        -jnp.inf,
        m_col * 0.6931471805599453 + jnp.log(jnp.maximum(l, 1e-37)),
    )
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[-2:])


@functools.partial(
    jax.jit, static_argnames=("scale", "causal", "return_lse", "interpret")
)
def paged_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    scale: Optional[float] = None,
    causal: bool = True,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Decode / append / prefill attention over a paged KV cache.

    Args:
      q: ``[B, Hq, D]`` (single-token decode) or ``[B, Sq, Hq, D]``
        (append/prefill -- the reference's paged prefill path,
        flash_api.cpp:410-466; new tokens must already live in pages).
      k_pages / v_pages: ``[Hk, num_pages, page_size, D]`` page pools.
      lengths: int32 ``[B]`` live tokens per sequence (INCLUDING any
        just-appended q tokens).
      page_indices: int32 ``[B, pages_per_seq]`` page table (entries
        beyond ``ceil(len/page_size)`` are ignored).
      causal: bottom-right-aligned causality of the q rows against the
        cache (q row i sees positions < lengths - Sq + i + 1). At Sq == 1
        causal and non-causal coincide.

    Returns ``out`` with the rank of ``q`` (plus ``lse`` fp32
    ``[B, Hq, Sq]`` when ``return_lse``).
    """
    if interpret is None:
        interpret = _default_interpret()
    decode_rank = q.ndim == 3
    if decode_rank:
        q = q[:, None]  # [B, 1, Hq, D]
    b, sq, hq, d = q.shape
    hk, num_pages, page_size, _ = k_pages.shape
    assert hq % hk == 0
    group = hq // hk
    rows = sq * group
    assert rows <= 4096, "paged prefill q block too large; chunk the call"
    if scale is None:
        scale = 1.0 / (d**0.5)
    # Pad head_dim for lane-aligned page DMAs (see lite kernel).
    d_pad = (-d) % MIN_LANES
    if d_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, d_pad)))
        k_pages = jnp.pad(
            k_pages, ((0, 0), (0, 0), (0, 0), (0, d_pad))
        )
        v_pages = jnp.pad(
            v_pages, ((0, 0), (0, 0), (0, 0), (0, d_pad))
        )
    d_p = d + d_pad
    # Row layout (qi, group): row // group recovers the q position.
    q4 = jnp.transpose(q, (0, 2, 1, 3)).reshape(b, hk, group, sq, d_p)
    q4 = jnp.transpose(q4, (0, 1, 3, 2, 4)).reshape(b, hk, rows, d_p)
    rows_p = -(-rows // 8) * 8
    if rows_p != rows:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, rows_p - rows), (0, 0)))

    kernel = functools.partial(
        _paged_kernel,
        scale=scale,
        page_size=page_size,
        group=group,
        seqlen_q=sq,
        causal=causal,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows_p, d_p), lambda bi, hi, lens, tbl: (bi, hi, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, rows_p, d_p), lambda bi, hi, lens, tbl: (bi, hi, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, rows_p, MIN_LANES),
                lambda bi, hi, lens, tbl: (bi, hi, 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
            pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
            pltpu.VMEM((rows_p, d_p), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, rows_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b, hk, rows_p, MIN_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_indices.astype(jnp.int32), q4,
      k_pages, v_pages)
    out = out[:, :, :rows, :d].reshape(b, hk, sq, group, d)
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(b, sq, hq, d)
    if decode_rank:
        out = out[:, 0]
    if not return_lse:
        return out
    lse = lse[:, :, :rows, 0].reshape(b, hk, sq, group)
    lse = jnp.transpose(lse, (0, 1, 3, 2)).reshape(b, hq, sq)
    return out, lse


def _paged_folded_kernel(
    # scalar prefetch
    lengths_ref,  # SMEM [B] int32
    page_tbl_ref,  # SMEM [B, P] int32 (used by the index maps)
    # inputs: qbd, [qrs when int8-MMA], pages_per_step k page refs,
    # then as many v refs
    qbd_ref,  # VMEM (1, 1, 128, L) block-diagonal packed q
    *refs,
    scale: float,
    page_size: int,
    pages_per_seq: int,
    rows_per_head: int,
    seqlen_q: int,
    causal: bool,
    pages_per_step: int,
    int8_mma: bool = False,
):
    """Head-folded paged decode step (see flash_fwd._decode_folded_kernel
    for the block-diagonal trick; reference paged_kv.h + pack_gqa.h).

    Pages are streamed in the NATIVE pool layout [num_pages, page_size,
    Hk*D]: one page is one full-lane contiguous block (512 KB at
    hk=8/d=128 vs the 64 KB per-head slabs of the per-head walk), and
    one wide matmul pair covers every head in the slab.

    ``pages_per_step`` pages arrive per grid step as parallel block
    streams (each its own double-buffered DMA): small pages (int8 pools
    halve the page to 256 KB at page_size=256/hk=8) under-fill a single
    stream's pipeline, so batching pages per step amortizes the per-step
    fixed cost and keeps more DMAs in flight."""
    n = pages_per_step
    if int8_mma:
        qrs_ref = refs[0]  # VMEM (1, 1, 128, 128) per-row q scales
        refs = refs[1:]
    k_refs = refs[:n]
    v_refs = refs[n : 2 * n]
    o_ref, lse_ref, m_scr, l_scr, acc_scr = refs[2 * n :]
    num_steps = (pages_per_seq + n - 1) // n
    b = pl.program_id(0)
    j = pl.program_id(2)
    length = lengths_ref[b]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    precision = (
        jax.lax.Precision.HIGHEST
        if qbd_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    for t in range(n):
        page_idx = j * n + t

        @pl.when(page_idx * page_size < length)
        def _step(page_idx=page_idx, k_ref=k_refs[t], v_ref=v_refs[t]):
            q = qbd_ref[0, 0]
            k = k_ref[0]
            if int8_mma:
                # int8 x int8 MXU QK (round 5): removes the k dequant
                # cast -- a full-width VPU pass that rivals the matmul
                # on the halved DMA stream (VERDICT weak #6). q rides
                # pre-quantized per-ROW int8 (host side, block-diag
                # zeros stay exact); the int32 product is exact and
                # the row scale folds into the f32 score.
                s = jax.lax.dot_general(
                    q,
                    k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (
                    qrs_ref[0, 0][:, :1] * (scale * LOG2E)
                )
            else:
                if k.dtype == jnp.int8:
                    # int8-quantized pool (kv_quant.quantize_kv_pages):
                    # global per-(head, channel) scales fold into q /
                    # the output on the host; the page DMA moved half
                    # the bytes.
                    k = k.astype(q.dtype)
                s = jax.lax.dot_general(
                    q,
                    k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ) * (scale * LOG2E)
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + page_idx * page_size
            )
            if causal and seqlen_q > 1:
                # Row r of the block-diag layout is (head j_slab, t) with
                # t = g*seqlen_q + qi; bottom-right causality bounds row
                # r at length - seqlen_q + qi + 1.
                qi_row = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    % rows_per_head
                ) % seqlen_q
                bound = length - seqlen_q + qi_row + 1
            else:
                bound = length
            s = jnp.where(col < bound, s, DEFAULT_MASK_VALUE)
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])
            p = jnp.exp2(s - m_next[:, :1])
            m_scr[...] = m_next
            l_scr[...] = alpha * l_scr[...] + jnp.sum(
                p, axis=1, keepdims=True
            )
            v = v_ref[0]
            if v.dtype == jnp.int8:
                # PV stays on the dequant cast: int8-quantizing the
                # softmax weights was tried (round 5) and is UNBOUNDED
                # on diffuse rows (tail mass below the 1/254 step
                # drops; 7% rel-L2 on random inputs) -- only QK rides
                # the int8 MXU.
                v = v.astype(
                    jnp.bfloat16 if int8_mma else q.dtype
                )
            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
                p.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
                precision=precision,
            )

    @pl.when(j == num_steps - 1)
    def _store():
        l = l_scr[:, :1]
        m_col = m_scr[:, :1]
        empty = m_col <= DEFAULT_MASK_VALUE * 0.5
        l_inv = jnp.where(
            jnp.logical_or(empty, l == 0.0),
            0.0,
            1.0 / jnp.maximum(l, 1e-37),
        )
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = jnp.where(
            jnp.logical_or(empty, l == 0.0),
            -jnp.inf,
            m_col * 0.6931471805599453
            + jnp.log(jnp.maximum(l, 1e-37)),
        )
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[-2:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "return_lse", "interpret", "pages_per_step",
        "int8_mma",
    ),
)
def paged_attention_folded(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    scale: Optional[float] = None,
    causal: bool = True,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    pages_per_step: Optional[int] = None,
    int8_mma: bool = False,
):
    """Head-folded paged decode over the NATIVE page-pool layout.

    Args mirror :func:`paged_attention` except the pools stay in the
    vLLM/HF layout ``[num_pages, page_size, Hk, D]`` -- no host
    transpose of the multi-GB pool. Requires ``D % 128 == 0`` and
    ``Hq/Hk * Sq <= 128`` q rows per KV head (single/few-token decode);
    callers fall back to :func:`paged_attention` otherwise.

    int8 pools (``ops/kv_quant.quantize_kv_pages``): scales are GLOBAL
    per-(kv-head, channel) ``[Hk, D]`` -- pages are shared across
    sequences, so no batch axis -- and fold exactly into q (k scales)
    and the extracted output (v scales), as in
    ``flash_fwd._decode_folded``. The page stream moves half the HBM
    bytes.

    ``int8_mma`` (round 5, int8 pools only): run the QK contraction
    int8 x int8 -> int32 on the MXU instead of dequantizing k to bf16
    in-kernel (the dequant casts rival the matmuls on the halved
    stream, capping it at ~48% of HBM peak). q is quantized per-row
    host-side; the row scale folds exactly into the f32 score, adding
    ~1/254 relative rounding on the logits on top of the pool's own
    int8 error (the fp8 descale analog of the reference, SURVEY
    section 2.2). PV keeps the v dequant cast -- int8-quantized
    softmax weights are unbounded-bad on diffuse rows (measured; see
    the kernel comment). Set False for the bit-legacy dequant path.
    """
    if interpret is None:
        interpret = _default_interpret()
    decode_rank = q.ndim == 3
    if decode_rank:
        q = q[:, None]
    b, sq, hq, d = q.shape
    num_pages, page_size, hk, _ = k_pages.shape
    assert hq % hk == 0 and d % MIN_LANES == 0
    group = hq // hk
    rows_per_head = group * sq
    assert rows_per_head <= 128
    if scale is None:
        scale = 1.0 / (d**0.5)
    from liteattention_tpu.ops.flash_fwd import (
        fold_q_blockdiag,
        pick_head_slab,
        unfold_output_diag,
    )

    slab = pick_head_slab(hk, rows_per_head, d)
    nslab = hk // slab
    lanes = slab * d
    rows = slab * rows_per_head

    if k_pages.dtype == jnp.int8:
        assert k_scale is not None and v_scale is not None, (
            "int8 pools need k_scale/v_scale [Hk, D] "
            "(ops/kv_quant.quantize_kv_pages)"
        )
        qf = q.reshape(b, sq, hk, group, d).astype(jnp.float32)
        q = (qf * k_scale[None, None, :, None, :]).astype(q.dtype)
        q = q.reshape(b, sq, hq, d)
    # Block-diagonal Q: q [B, Hq, Sq, D] with Hq-major (hk, group)
    # ordering; row j*rows_per_head + g*sq + qi owns lane block j.
    qh = jnp.transpose(q, (0, 2, 1, 3))  # [B, Hq, Sq, D]
    qbd = fold_q_blockdiag(qh, nslab, slab, rows_per_head, d)
    use_i8mma = int8_mma and k_pages.dtype == jnp.int8
    if use_i8mma:
        # Per-row int8 quantization of the folded q (block-diag zeros
        # quantize exactly); the row scale re-enters the f32 score
        # in-kernel. See the int8_mma docstring note.
        qf32 = qbd.astype(jnp.float32)
        qrs = jnp.maximum(
            jnp.max(jnp.abs(qf32), axis=-1, keepdims=True), 1e-30
        ) / 127.0
        qbd = jnp.round(qf32 / qrs).astype(jnp.int8)
        qrs_in = jnp.broadcast_to(
            qrs, (*qrs.shape[:-1], MIN_LANES)
        ).astype(jnp.float32)

    kf = k_pages.reshape(num_pages, page_size, hk * d)
    vf = v_pages.reshape(num_pages, page_size, hk * d)
    pages_per_seq = page_indices.shape[1]

    if pages_per_step is None:
        # Auto: batch pages until one step's K stream reaches ~2 MB
        # (v5e-swept at page_size=256/hk=8/d=128: bf16 util climbs
        # 0.78 -> 0.82 -> 0.87 at 1/2/4 pages, int8 0.47 -> 0.52 ->
        # 0.56 at 2/4/8; bf16 at 8 pages OOMs scoped VMEM -- 8 pages
        # x 2 arrays x 2 pipeline buffers x 512 KB > the 16 MB
        # budget, so the cap stays at 8 and the 2 MB target keeps
        # bf16 at 4).
        page_bytes = page_size * lanes * k_pages.dtype.itemsize
        pages_per_step = max(
            1, min(8, (2 * 1024 * 1024) // max(page_bytes, 1))
        )
    pages_per_step = max(1, min(pages_per_step, pages_per_seq))
    num_steps = -(-pages_per_seq // pages_per_step)

    def kv_map_t(t):
        def kv_map(bi, ni, j, lens, tbl):
            # Clamp both the table column (padded tail steps) and the
            # dead-tail table entries (documented as ignored) so the
            # prefetched block index stays in the pool; masked-out
            # columns make duplicate fetches harmless.
            col = jnp.minimum(
                j * pages_per_step + t, pages_per_seq - 1
            )
            return (
                jnp.minimum(tbl[bi, col], num_pages - 1),
                0,
                ni,
            )

        return kv_map

    kernel = functools.partial(
        _paged_folded_kernel,
        scale=scale,
        page_size=page_size,
        pages_per_seq=pages_per_seq,
        rows_per_head=rows_per_head,
        seqlen_q=sq,
        causal=causal,
        pages_per_step=pages_per_step,
        int8_mma=use_i8mma,
    )
    page_spec = [
        pl.BlockSpec((1, page_size, lanes), kv_map_t(t))
        for t in range(pages_per_step)
    ]
    qrs_spec = (
        [
            pl.BlockSpec(
                (1, 1, 128, MIN_LANES),
                lambda bi, ni, j, lens, tbl: (bi, ni, 0, 0),
            )
        ]
        if use_i8mma
        else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nslab, num_steps),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 128, lanes),
                lambda bi, ni, j, lens, tbl: (bi, ni, 0, 0),
            ),
            *qrs_spec,
            *page_spec,
            *page_spec,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 128, lanes),
                lambda bi, ni, j, lens, tbl: (bi, ni, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 128, MIN_LANES),
                lambda bi, ni, j, lens, tbl: (bi, ni, 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, MIN_LANES), jnp.float32),
            pltpu.VMEM((128, MIN_LANES), jnp.float32),
            pltpu.VMEM((128, lanes), jnp.float32),
        ],
    )
    out_bd, lse_bd = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nslab, 128, lanes), q.dtype),
            jax.ShapeDtypeStruct((b, nslab, 128, MIN_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_indices.astype(jnp.int32), qbd,
      *([qrs_in] if use_i8mma else []),
      *([kf] * pages_per_step), *([vf] * pages_per_step))

    o = unfold_output_diag(out_bd, slab, rows_per_head, d)
    if v_scale is not None:
        o = o * v_scale.reshape(nslab, slab, d)[None, :, :, None]
    o = o.astype(out_bd.dtype).reshape(b, hq, sq, d)
    out = jnp.transpose(o, (0, 2, 1, 3))  # [B, Sq, Hq, D]
    if decode_rank:
        out = out[:, 0]
    if not return_lse:
        return out
    lse = lse_bd[:, :, :rows, 0].reshape(b, hq, sq)
    return out, lse


__all__ = ["paged_attention", "paged_attention_folded"]
