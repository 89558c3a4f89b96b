"""Absorbed MLA (multi-head latent attention) decode kernel.

DeepSeek-style MLA decodes against a single per-token LATENT vector of
``D`` channels (kv_lora_rank + rope dims, e.g. 512 + 64 = 576): after
weight absorption K is the full latent row and V is its first
``Dv = kv_lora_rank`` channels. The reference benchmarks this shape via
the external ``flash_mla_with_kvcache`` and via
``flash_attn_with_kvcache(headdim_v=512, qv=...)``
(hopper/_internal/benchmarks/benchmark_mla_decode.py:44-113); its CUDA
kernels keep K and V in shared smem to halve the cache traffic.

The TPU design exploits the same structure more directly: K and V are
THE SAME array, so one DMA stream per KV block feeds both matmuls --
the cache is read exactly once, and the V matmul consumes an in-VMEM
lane slice ``kv[:, :Dv]``. All query heads share the single latent head
(MQA over the latent), so the whole q tensor rides one
``(Sq*Hq, D)`` block-row against each KV block: the MXU sees one wide
matmul pair per block, no head loop.

Round 5: the flash_mla 64-token page convention is DMA-descriptor-bound
on TPU (one 72 KB copy per page issued from the scalar core ran at 19%
of HBM peak; 256-token pages reached 52%). The kernel now hand-rolls
its page fetches like the lite gather kernel: ``pages_per_step`` pages
land in one ring slot per macro-step, and a per-step run check on the
scalar-prefetched page table promotes PHYSICALLY-CONSECUTIVE pages
(identity tables, sequential allocators -- the common serving layout)
to ONE wide DMA per macro-step. Scattered tables degrade gracefully to
per-page copies of the same macro-step. The per-step compute is one
wide QK/PV matmul pair over the packed slot, and the dynamic
``fori_loop`` stops at each sequence's real length instead of the
padded page count.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from liteattention_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    MIN_LANES,
    _default_interpret,
)

RING_SLOTS = 4


def _mla_kernel(
    # scalar prefetch
    lengths_ref,  # SMEM [B] int32
    tbl_ref,  # SMEM [B, P] int32
    # inputs
    q_ref,  # VMEM (1, rows_p, D)
    kv_hbm,  # ANY [num_pages * page_size, D] (flat latent pages)
    # outputs
    o_ref,  # VMEM (1, rows_p, Dv)
    lse_ref,  # VMEM (1, rows_p, 128)
    # scratch
    kvbuf,  # VMEM (RING_SLOTS, n*page_size, D)
    dma_sems,  # DMA sems (RING_SLOTS,)
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    dv: int,
    page_size: int,
    pages_per_seq: int,
    num_pages: int,
    hq: int,
    sq: int,
    causal: bool,
    pages_per_step: int,
):
    n = pages_per_step
    b = pl.program_id(0)
    length = lengths_ref[b]
    num_steps = pl.cdiv(pl.cdiv(length, page_size), n)

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def page_at(j, t):
        # Clamped table read: tail entries repeat the last valid page
        # (their logical columns are >= length and masked from the
        # scores; the duplicate fetch is one boundary step's waste).
        col = jnp.minimum(j * n + t, pages_per_seq - 1)
        return jnp.minimum(tbl_ref[b, col], num_pages - 1)

    def start_step(j, slot):
        if n == 1:
            run = jnp.bool_(True)
        else:
            run = jnp.bool_(True)
            p_prev = page_at(j, 0)
            for t in range(1, n):
                p_t = page_at(j, t)
                run = jnp.logical_and(run, p_t == p_prev + 1)
                p_prev = p_t

        @pl.when(run)
        def _run():
            p0 = page_at(j, 0)
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(p0 * page_size, n * page_size)],
                kvbuf.at[slot],
                dma_sems.at[slot],
            ).start()

        @pl.when(jnp.logical_not(run))
        def _scatter():
            for t in range(n):
                p_t = page_at(j, t)
                pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(p_t * page_size, page_size)],
                    kvbuf.at[slot, pl.ds(t * page_size, page_size)],
                    dma_sems.at[slot],
                ).start()

    def wait_step(slot):
        # Both paths signalled n * page_size * D elements on the slot
        # semaphore; wait on a fixed in-bounds descriptor of that size.
        pltpu.make_async_copy(
            kv_hbm.at[pl.ds(0, n * page_size)],
            kvbuf.at[slot],
            dma_sems.at[slot],
        ).wait()

    for i in range(RING_SLOTS - 1):
        @pl.when(i < num_steps)
        def _prime(i=i):
            start_step(i, i % RING_SLOTS)

    qb = q_ref[0]  # (rows_p, D)

    def body(j, _):
        slot = jax.lax.rem(j, RING_SLOTS)

        @pl.when(j + RING_SLOTS - 1 < num_steps)
        def _prefetch():
            start_step(
                j + RING_SLOTS - 1,
                jax.lax.rem(j + RING_SLOTS - 1, RING_SLOTS),
            )

        wait_step(slot)
        kv = kvbuf[slot]  # (n * page_size, D)
        s = jax.lax.dot_general(
            qb,
            kv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * (scale * LOG2E)
        # Logical key positions are contiguous in table order no matter
        # where the pages physically live.
        col = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            + j * n * page_size
        )
        if causal and sq > 1:
            # Row r is (q position qi, head h) with r = qi*hq + h;
            # bottom-right-aligned causality bounds row r's keys at
            # length - sq + qi + 1 (padded tail rows are sliced off
            # by the host, their mask value is irrelevant).
            qi_row = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // hq
            )
            bound = length - sq + jnp.minimum(qi_row, sq - 1) + 1
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
        # V is the first dv lanes of the SAME block -- no second DMA.
        v = kv[:, :dv]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return 0

    jax.lax.fori_loop(0, num_steps, body, 0)

    l = l_scr[:, :1]
    m_col = m_scr[:, :1]
    empty = m_col <= DEFAULT_MASK_VALUE * 0.5
    l_inv = jnp.where(
        jnp.logical_or(empty, l == 0.0),
        0.0,
        1.0 / jnp.maximum(l, 1e-37),
    )
    o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    lse = jnp.where(
        jnp.logical_or(empty, l == 0.0),
        -jnp.inf,
        m_col * 0.6931471805599453
        + jnp.log(jnp.maximum(l, 1e-37)),
    )
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[-2:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "head_dim_v", "scale", "causal", "return_lse", "interpret",
        "pages_per_step",
    ),
)
def mla_decode(
    q: jax.Array,
    kv_cache: jax.Array,
    cache_seqlens: jax.Array,
    head_dim_v: int,
    page_table: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    causal: bool = True,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    pages_per_step: Optional[int] = None,
):
    """Absorbed-MLA decode over a single latent cache.

    Args:
      q: ``[B, Sq, Hq, D]`` (or ``[B, Hq, D]`` single-token) queries in
        the absorbed latent space. All heads share the one latent KV
        head; ``Sq * Hq`` must be <= 128 (single/few-token decode).
      kv_cache: latent cache. Contiguous ``[B, S, D]`` / ``[B, S, 1, D]``,
        or paged ``[num_pages, page_size, D]`` / ``[..., 1, D]`` with
        ``page_table [B, pages_per_seq]``. ``K`` is the full row;
        ``V = kv_cache[..., :head_dim_v]``.
      cache_seqlens: ``[B]`` int32 valid lengths.
      head_dim_v: the value dim (kv_lora_rank), ``% 128 == 0``.
      causal: bottom-right-aligned causality for ``Sq > 1``.
      pages_per_step: pages fetched per ring macro-step (default
        targets a ~512 KB slot). Consecutive pages in the table move as
        ONE wide DMA per macro-step (see module docstring).

    Returns ``out [B, Sq, Hq, head_dim_v]`` (``[B, Hq, dv]`` if q was
    rank-3), plus natural-log LSE ``[B, Hq, Sq]`` if ``return_lse``.

    Reference: benchmark_mla_decode.py (flash_mla_with_kvcache /
    flash_attn_with_kvcache MLA variants).
    """
    if interpret is None:
        interpret = _default_interpret()
    decode_rank = q.ndim == 3
    if decode_rank:
        q = q[:, None]
    b, sq, hq, d = q.shape
    if kv_cache.ndim == 4:
        assert kv_cache.shape[2] == 1, "MLA latent cache has one KV head"
        kv_cache = kv_cache[:, :, 0]
    dv = head_dim_v
    assert dv % MIN_LANES == 0 and dv <= d
    assert kv_cache.shape[-1] >= d
    # Lane-aligned latent layout: the ring DMAs slice raw rows, whose
    # minor dim Mosaic requires 128-aligned (the flash_mla 576 =
    # 512 + 64 shape is not). The kernel's NATIVE cache layout is the
    # next 128 multiple (640 for DeepSeek); a cache already allocated
    # at that width (extra lanes may hold garbage -- q's zero pad
    # nullifies them in QK, and V reads only the first dv lanes) rides
    # free. A tight-576 cache is padded here, which costs one extra
    # pass over the cache per call -- serving stacks should store the
    # padded layout.
    d_pad = -(-kv_cache.shape[-1] // MIN_LANES) * MIN_LANES
    if kv_cache.shape[-1] != d_pad:
        kv_cache = jnp.pad(
            kv_cache,
            ((0, 0),) * (kv_cache.ndim - 1)
            + ((0, d_pad - kv_cache.shape[-1]),),
        )
    rows = sq * hq
    assert rows <= 128, f"Sq*Hq = {rows} > 128 (decode kernel)"
    rows_p = max(8, -(-rows // 8) * 8)
    if scale is None:
        scale = 1.0 / (d**0.5)

    if page_table is None:
        # Contiguous cache: synthesize an identity page table with the
        # largest page that divides S (no host copy of the cache) while
        # keeping >= 8 ring steps per sequence -- two giant macro-steps
        # starve the 4-slot ring across grid cells (measured: the
        # s=4096 contiguous case ran 0.074 ms with 2 steps/cell vs
        # ~0.05 at proper occupancy).
        s = kv_cache.shape[1]
        page_size = next(
            (c for c in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
             if s % c == 0 and s // c >= 8), None,
        ) or next(
            (c for c in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
             if s % c == 0), 8,
        )
        pad = (-s) % page_size
        if pad:
            kv_cache = jnp.pad(kv_cache, ((0, 0), (0, pad), (0, 0)))
            s += pad
        pages_per_seq = s // page_size
        kv_pages = kv_cache.reshape(b * pages_per_seq, page_size, d_pad)
        page_table = (
            jnp.arange(b * pages_per_seq, dtype=jnp.int32)
            .reshape(b, pages_per_seq)
        )
    else:
        kv_pages = kv_cache
        page_size = kv_pages.shape[1]
        pages_per_seq = page_table.shape[1]
    num_pages = kv_pages.shape[0]

    if pages_per_step is None:
        # ~512 KB ring slots: small MLA pages (page_size 64 at D=640 is
        # 80 KB) issued one descriptor each were scalar-core-bound at
        # 19% of HBM peak; consecutive pages now ride one wide copy.
        page_bytes = page_size * d_pad * kv_pages.dtype.itemsize
        pages_per_step = max(1, min(8, (512 * 1024) // max(page_bytes, 1)))
    # num_pages bound: the fixed-size wait descriptor slices
    # [0, pages_per_step * page_size) of the flat pool.
    pages_per_step = max(1, min(pages_per_step, pages_per_seq, num_pages))

    # q rows ordered (qi, head): row r = qi*hq + h; lanes zero-padded
    # to the cache's aligned width (zeros nullify pad/garbage k lanes).
    qr = q.reshape(b, rows, d)
    if rows_p != rows or d_pad != d:
        qr = jnp.pad(
            qr, ((0, 0), (0, rows_p - rows), (0, d_pad - d))
        )

    kernel = functools.partial(
        _mla_kernel,
        scale=scale,
        dv=dv,
        page_size=page_size,
        pages_per_seq=pages_per_seq,
        num_pages=num_pages,
        hq=hq,
        sq=sq,
        causal=causal,
        pages_per_step=pages_per_step,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows_p, d_pad), lambda bi, lens, tbl: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, rows_p, dv), lambda bi, lens, tbl: (bi, 0, 0)
            ),
            pl.BlockSpec(
                (1, rows_p, MIN_LANES), lambda bi, lens, tbl: (bi, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (RING_SLOTS, pages_per_step * page_size, d_pad),
                kv_pages.dtype,
            ),
            pltpu.SemaphoreType.DMA((RING_SLOTS,)),
            pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
            pltpu.VMEM((rows_p, MIN_LANES), jnp.float32),
            pltpu.VMEM((rows_p, dv), jnp.float32),
        ],
    )
    kv_flat = kv_pages.reshape(num_pages * page_size, d_pad)
    out_r, lse_r = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, rows_p, dv), q.dtype),
            jax.ShapeDtypeStruct((b, rows_p, MIN_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cache_seqlens.astype(jnp.int32), page_table.astype(jnp.int32), qr,
      kv_flat)

    out = out_r[:, :rows].reshape(b, sq, hq, dv)
    if decode_rank:
        out = out[:, 0]
    if not return_lse:
        return out
    lse = lse_r[:, :rows, 0].reshape(b, sq, hq)
    lse = jnp.transpose(lse, (0, 2, 1))  # [B, Hq, Sq]
    return out, lse
