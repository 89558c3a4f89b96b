"""Dense flash-attention forward kernel (Pallas/TPU).

TPU-native replacement for the reference's dense FA3 forward path
(``FlashAttnFwdSm90`` + ``CollectiveMainloopFwdSm90`` with
``Is_skipable=false``; reference: hopper/_internal/cpp/flash_fwd_kernel_sm90.h:39-572,
mainloop_fwd_sm90_tma_gmma_ws.hpp). The Hopper design (warp-specialized
TMA producer / WGMMA consumers, named barriers, smem unions) has no TPU
analog: here Mosaic's grid pipeline is the producer (automatic
double-buffered HBM->VMEM DMA driven by BlockSpec index maps), the MXU
runs QK^T/PV, and the VPU runs the online softmax.

Grid: ``(B, H, Qt, Kt)`` with the KV dimension innermost ("arbitrary" --
it is the online-softmax reduction); B/H/Qt are "parallel" so Mosaic may
split them across megacores.

This kernel is the ``vs_baseline`` denominator for the sparse engine in
bench.py and the dense path of the flash_attn_func-parity API.
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
MIN_LANES = 128
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def dropout_keep_mask(seed, bh, row0, col0, shape, dropout_p: float):
    """Counter-based in-kernel attention-dropout mask.

    Reference: FA2's philox dropout applied to P
    (csrc/flash_attn/src/dropout.h, philox.cuh). Philox's essential
    property -- the mask is a pure function of (seed, batch*nheads+h,
    global row, global col), so the backward kernels regenerate the
    identical mask at ANY tile geometry -- is kept; the generator is a
    murmur3-style 32-bit finalizer over the position counter instead
    (no 64-bit counters on the VPU, and dropout needs no cryptographic
    stream). Works identically in interpret mode (plain integer jnp
    ops; ``pltpu.prng_*`` has no CPU lowering in this stack).

    Args: ``seed``/``bh`` traced int32 scalars, ``row0``/``col0`` the
    global offsets of this tile, static ``shape``/``dropout_p``.
    Returns a bool keep-mask of ``shape``.
    """
    u32 = jnp.uint32
    row = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    ).astype(u32)
    col = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
    ).astype(u32)
    key = seed.astype(u32) * u32(0xCC9E2D51) + bh.astype(u32) * u32(
        0x1B873593
    )
    x = row * u32(0x9E3779B9) + col * u32(0x85EBCA6B)
    x = x ^ key
    # murmur3 fmix32 avalanche
    x = x ^ (x >> u32(16))
    x = x * u32(0x85EBCA6B)
    x = x ^ (x >> u32(13))
    x = x * u32(0xC2B2AE35)
    x = x ^ (x >> u32(16))
    # Mosaic has no uint32->f32 cast; x>>8 < 2^24 fits int32 exactly.
    u = (x >> u32(8)).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        2.0**-24
    )
    return u >= jnp.float32(dropout_p)


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    *rest,
    scale: float,
    kt: int,
    num_heads: int,
    block_q: int,
    block_k: int,
    seqlen_k: int,
    causal: bool,
    causal_offset: int = 0,
    has_segments: bool = False,
    has_bound: bool = False,
    bound_causal: bool = False,
    bound_offset: int = 0,
    has_low: bool = False,
    window: "Optional[Tuple[int, int]]" = None,
    attention_chunk: int = 0,
    softcap: float = 0.0,
    has_alibi: bool = False,
    kv_3d: bool = False,  # K/V blocks are (1, block_k, d) views of the
    # cache-layout [B, Sk, Hk*D] array (no host transpose)
    dropout_p: float = 0.0,
    has_qv: bool = False,
):
    rest = list(rest)
    qv_ref = rest.pop(0) if has_qv else None
    qseg_ref = rest.pop(0) if has_segments else None
    kseg_ref = rest.pop(0) if has_segments else None
    bound_ref = rest.pop(0) if has_bound else None
    low_ref = rest.pop(0) if has_low else None
    alibi_ref = rest.pop(0) if has_alibi else None
    dseed_ref = rest.pop(0) if dropout_p > 0.0 else None
    o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    # Grid is (B, Qt, H, Kt): Kt innermost (the online-softmax reduction),
    # H next so the per-(b, q-tile) lse block stays VMEM-resident while
    # all heads write their column.
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    h = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        # Tiles strictly above the (bottom-right-aligned) diagonal
        # contribute nothing: skip all compute (the TPU form of the
        # reference's block-range pruning, hopper/_internal/cpp/block.h).
        should_run = (
            (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
        )
    else:
        should_run = True
    if attention_chunk > 0 and not has_bound:
        # Chunked attention block pruning (reference block.h via
        # mask.h:116-119): a k-tile left of the FIRST row's chunk start,
        # or right of the LAST row's chunk end, is fully dead. With a
        # traced per-batch bound the positions are dynamic -- masked
        # in-tile instead.
        first_start = (
            (qi * block_q + causal_offset) // attention_chunk
        ) * attention_chunk
        last_start = (
            ((qi + 1) * block_q - 1 + causal_offset) // attention_chunk
        ) * attention_chunk
        should_run = jnp.logical_and(
            should_run,
            jnp.logical_and(
                (ki + 1) * block_k - 1 >= first_start,
                ki * block_k < last_start + attention_chunk,
            ),
        )

    # f32 inputs: force full-precision MXU passes (the default would
    # silently round through bf16). bf16 inputs accumulate in f32 anyway.
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    @pl.when(should_run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0] if kv_3d else k_ref[0, 0]
        if k.dtype == jnp.int8:
            # int8-quantized KV (ops/kv_quant): per-channel scales are
            # folded into q / the output by the caller; the DMA moved
            # half the bytes and the cast back is a cheap VPU pass.
            k = k.astype(q.dtype)
        raw = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if has_qv:
            # MLA-style extra query term (reference has_qv path,
            # benchmark_mla_decode.py:45,79): the score is
            # q . k + qv . v with qv living in V's head dim -- K holds
            # only the compact/rope component while V carries the rest
            # of the key content. V is loaded here anyway for PV.
            vq = v_ref[0] if kv_3d else v_ref[0, 0]
            if vq.dtype == jnp.int8:
                vq = vq.astype(q.dtype)
            raw = raw + jax.lax.dot_general(
                qv_ref[0, 0],
                vq,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        # Scores are kept in log2 space (scale folded with log2(e)): the
        # VPU then runs exp2 directly instead of exp's internal
        # multiply-by-log2e per element -- measured 12% end-to-end on
        # v5e. Same trick as the reference's softmax_scale_log2
        # (hopper/_internal/cpp/softmax.h:131).
        if softcap > 0.0:
            # Logit soft-capping (Gemma-2 style) operates on natural
            # logits: s <- cap * tanh(s / cap), then convert.
            s = softcap * jnp.tanh(raw * scale / softcap) * LOG2E
        else:
            s = raw * (scale * LOG2E)
        if has_alibi:
            # ALiBi bias (reference csrc/flash_attn alibi support):
            # -slope * distance; slope per (batch,) q-head.
            row_sl = alibi_ref[0]  # (1, hp)
            slope = jnp.sum(
                jnp.where(
                    jax.lax.broadcasted_iota(
                        jnp.int32, row_sl.shape, 1
                    )
                    == h,
                    row_sl,
                    0.0,
                )
            )
            arow = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            acol = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + ki * block_k
            )
            # Bottom-right-aligned relative position (reference
            # tests/test_flash_attn.py attn_bias_from_alibi_slopes):
            # rel = row + seqlen_k - seqlen_q - col; |rel| when
            # non-causal. causal_offset == seqlen_k - seqlen_q.
            rel = arow + causal_offset - acol
            dist = (rel if causal else jnp.abs(rel)).astype(jnp.float32)
            s = s - slope * LOG2E * dist

        needs_k_mask = seqlen_k % block_k != 0
        if (
            needs_k_mask
            or causal
            or has_segments
            or has_bound
            or has_low
            or window is not None
            or attention_chunk > 0
        ):
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + ki * block_k
            )
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            valid = col < seqlen_k
            if causal:
                # Bottom-right alignment for sq != sk (flash_attn >= 2.1
                # convention): the last query row aligns with the last
                # key column.
                valid = jnp.logical_and(valid, col <= row + causal_offset)
            if has_segments:
                # Packed-varlen masking: tokens attend within their own
                # segment only (the reference's cu_seqlens semantics,
                # hopper/_internal/cpp/seqlen.h / mask.h).
                qs = jnp.transpose(qseg_ref[...])  # (block_q, 1)
                ks = kseg_ref[...]  # (1, block_k)
                valid = jnp.logical_and(valid, qs == ks)
            if has_bound:
                # Per-batch key end (KV cache / right-padded batches):
                # ``bound`` is the TOTAL valid key length; ``bound_offset``
                # is the (static) query length, so the bottom-right-aligned
                # append-causal predicate is
                # col < bound - seqlen_q + row + 1 (FA kvcache alignment).
                bound = bound_ref[0, 0, 0]
                if bound_causal:
                    valid = jnp.logical_and(
                        valid, col < bound - bound_offset + row + 1
                    )
                else:
                    valid = jnp.logical_and(valid, col < bound)
            if has_low:
                # Per-batch key start (reference cache_leftpad): keys
                # before the start index are padding.
                valid = jnp.logical_and(valid, col >= low_ref[0, 0, 0])
            if window is not None:
                # Sliding-window (local) attention, reference
                # window_size=(left, right) semantics around the
                # bottom-right-aligned position: row attends
                # [pos-left, pos+right]; -1 means unbounded. With a
                # per-batch bound the alignment is per batch
                # (pos = row + total - seqlen_q).
                left, right = window
                if has_bound:
                    pos = row + (bound_ref[0, 0, 0] - bound_offset)
                else:
                    pos = row + causal_offset
                if left >= 0:
                    valid = jnp.logical_and(valid, col >= pos - left)
                if right >= 0:
                    valid = jnp.logical_and(valid, col <= pos + right)
            if attention_chunk > 0:
                # Chunked (llama4-style) attention, reference
                # mask.h:116-119: each row attends only keys inside the
                # chunk containing its bottom-right-aligned diagonal
                # position; intersects causal/local limits.
                if has_bound:
                    cpos = row + (bound_ref[0, 0, 0] - bound_offset)
                else:
                    cpos = row + causal_offset
                cstart = (cpos // attention_chunk) * attention_chunk
                valid = jnp.logical_and(
                    valid,
                    jnp.logical_and(
                        col >= cstart, col < cstart + attention_chunk
                    ),
                )
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1], log2 units
        m_next = jnp.maximum(m_prev, m_curr)  # [bq, 128]
        alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])  # [bq, 1]
        p = jnp.exp2(s - m_next[:, :1])
        l_curr = jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = alpha * l_prev + l_curr
        if dropout_p > 0.0:
            # In-kernel attention dropout on the unnormalized P (lse
            # and the l statistic stay dropout-free, FA2 semantics);
            # the 1/(1-p) rescale is folded into the epilogue's l_inv.
            # NB: program_id must be read at kernel top level (bi) --
            # inside this pl.when branch it has no interpret-mode
            # lowering.
            keep = dropout_keep_mask(
                dseed_ref[0, 0, 0],
                bi * num_heads + h,
                qi * block_q,
                ki * block_k,
                (block_q, block_k),
                dropout_p,
            )
            p = jnp.where(keep, p, 0.0)
        v = v_ref[0] if kv_3d else v_ref[0, 0]
        if v.dtype == jnp.int8:
            v = v.astype(q.dtype)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    @pl.when(ki == kt - 1)
    def _store():
        l = l_scr[:, :1]
        m_col = m_scr[:, :1]  # log2 units
        # Fully-masked rows never see a real score: their running max is
        # still at the mask sentinel. Reference semantics: zero output,
        # -inf lse (epilogue store_zero, flash_fwd_kernel_sm90.h:557-567).
        empty = m_col <= DEFAULT_MASK_VALUE * 0.5
        rp = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0
        l_inv = jnp.where(
            jnp.logical_or(empty, l == 0.0), 0.0, rp / jnp.maximum(l, 1e-37)
        )
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = jnp.where(
            jnp.logical_or(empty, l == 0.0),
            -jnp.inf,
            m_col * LN2 + jnp.log(jnp.maximum(l, 1e-37)),
        )
        # lse block is (block_q, H) shared across heads; write column h.
        head_col = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, num_heads), 1
        )
        lse_ref[0] = jnp.where(head_col == h, lse, lse_ref[0])


def _pad_seq(x: jax.Array, block: int) -> jax.Array:
    s = x.shape[2]
    pad = (-s) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _flash_forward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    causal: bool,
    block_sizes: Optional[BlockSizes],
    interpret: bool,
    q_segments: Optional[jax.Array] = None,
    kv_segments: Optional[jax.Array] = None,
    kv_bound: Optional[jax.Array] = None,
    bound_causal: bool = False,
    kv_low: Optional[jax.Array] = None,
    window: Optional[Tuple[int, int]] = None,
    attention_chunk: int = 0,
    softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
    kv_bshd: bool = False,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    qv: Optional[jax.Array] = None,
):
    """Dense flash attention forward.

    Args:
      q, k, v: ``[B, H, S, D]`` (bf16 or f32). MQA/GQA: if K/V have fewer
        heads than Q and divide evenly, they are walked grouped (each KV
        head serves ``Hq/Hk`` consecutive Q heads), matching the
        reference's GQA semantics (hopper/_internal/cpp/pack_gqa.h) without
        materializing repeats. V's head dim may differ from Q/K's
        (MLA/GLA shapes, reference benchmark_mla_decode.py); the output
        takes V's dim.
      qv: optional ``[B, H, Sq, Dv]`` extra query in V's head dim;
        scores become ``q . k + qv . v`` (reference has_qv MLA path).
      scale: softmax scale (default ``1/sqrt(D)``).
      causal: lower-triangular masking.
      return_lse: also return natural-log LSE ``[B, H, Sq]`` fp32.

    Returns ``(out, lse)``.
    """
    b, h, sq, d = q.shape
    dv = v.shape[-1]
    if kv_bshd:
        # K/V stay in the KV-CACHE layout [B, Sk, Hk, D]: no 537-MB/call
        # host transpose (measured 40 GB/s -- it dominated decode). The
        # kernel slices head h's (block_k, d) tile out of a
        # [B, Sk, Hk*D] lane-blocked view instead. Requires d % 128 == 0
        # (lane-aligned head slices); callers fall back otherwise.
        assert d % MIN_LANES == 0 and dv % MIN_LANES == 0, (
            "kv_bshd needs 128-aligned head dims"
        )
        hk = k.shape[2]
        sk = k.shape[1]
    else:
        hk = k.shape[1]
        sk = k.shape[2]
    assert h % hk == 0, f"q heads {h} not divisible by kv heads {hk}"
    group = h // hk
    bs = block_sizes or get_block_sizes(d, q.dtype.itemsize)
    block_q = min(bs.block_q, max(128, -(-sq // 128) * 128))
    block_k = min(bs.block_k, max(128, -(-sk // 128) * 128))

    qp = _pad_seq(q, block_q)
    if kv_bshd:
        pad_k = (-sk) % block_k
        if pad_k:
            kpad = ((0, 0), (0, pad_k), (0, 0), (0, 0))
            k, v = jnp.pad(k, kpad), jnp.pad(v, kpad)
        kp = k.reshape(k.shape[0], k.shape[1], hk * d)
        vp = v.reshape(v.shape[0], v.shape[1], hk * dv)
        sq_p, sk_p = qp.shape[2], kp.shape[1]
    else:
        kp = _pad_seq(k, block_k)
        vp = _pad_seq(v, block_k)
        sq_p, sk_p = qp.shape[2], kp.shape[2]
    qt, kt = sq_p // block_q, sk_p // block_k

    has_segments = q_segments is not None
    has_bound = kv_bound is not None
    extra_inputs = []
    extra_specs = []
    has_qv = qv is not None
    if has_qv:
        assert qv.shape == (b, h, sq, dv), (
            f"qv must be [B, H, Sq, Dv]={b, h, sq, dv}, got {qv.shape}"
        )
        extra_inputs.append(_pad_seq(qv, block_q))
        extra_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, dv), lambda bi, qi, hi, ki: (bi, hi, qi, 0)
            )
        )
    if has_segments:
        assert b == 1, "segment-id (varlen) attention expects packed B=1"
        qs = jnp.pad(
            q_segments, ((0, 0), (0, sq_p - q_segments.shape[1])),
            constant_values=-1,
        ).astype(jnp.int32)
        ks = jnp.pad(
            kv_segments, ((0, 0), (0, sk_p - kv_segments.shape[1])),
            constant_values=-2,
        ).astype(jnp.int32)
        extra_inputs += [qs, ks]
        extra_specs += [
            pl.BlockSpec((1, block_q), lambda bi, qi, hi, ki: (0, qi)),
            pl.BlockSpec((1, block_k), lambda bi, qi, hi, ki: (0, ki)),
        ]
    if has_bound:
        kb = jnp.broadcast_to(
            kv_bound.astype(jnp.int32).reshape(b, 1, 1), (b, 1, sk_p)
        )
        extra_inputs.append(kb)
        extra_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, qi, hi, ki: (bi, 0, ki))
        )
    has_low = kv_low is not None
    if has_low:
        kl = jnp.broadcast_to(
            kv_low.astype(jnp.int32).reshape(b, 1, 1), (b, 1, sk_p)
        )
        extra_inputs.append(kl)
        extra_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, qi, hi, ki: (bi, 0, ki))
        )
    has_alibi = alibi_slopes is not None
    if has_alibi:
        # Accept both reference forms: (nheads,) shared or
        # (batch, nheads) per-batch slopes.
        hp = max(MIN_LANES, -(-h // MIN_LANES) * MIN_LANES)
        sl = alibi_slopes.astype(jnp.float32).reshape(-1, h)
        sl = jnp.broadcast_to(sl[:, None, :], (b, 1, h))
        sl = jnp.pad(sl, ((0, 0), (0, 0), (0, hp - h)))
        extra_inputs.append(sl)
        extra_specs.append(
            pl.BlockSpec((1, 1, hp), lambda bi, qi, hi, ki: (bi, 0, 0))
        )
    if dropout_p > 0.0:
        assert dropout_seed is not None, "dropout_p > 0 needs a seed"
        # Scalar seed rides a (1, 1, 128) broadcast-VMEM block (the SMEM
        # (1, 1) form fails the last-two-dims rule at lowering).
        ds = jnp.broadcast_to(
            jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1, 1),
            (1, 1, MIN_LANES),
        )
        extra_inputs.append(ds)
        extra_specs.append(
            pl.BlockSpec(
                (1, 1, MIN_LANES), lambda bi, qi, hi, ki: (0, 0, 0)
            )
        )

    grid = (b, qt, h, kt)
    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        kt=kt,
        num_heads=h,
        block_q=block_q,
        block_k=block_k,
        seqlen_k=sk,
        causal=causal,
        causal_offset=sk - sq,
        has_segments=has_segments,
        has_bound=has_bound,
        bound_causal=bound_causal,
        bound_offset=sq,
        has_low=has_low,
        window=window,
        attention_chunk=attention_chunk,
        softcap=softcap,
        has_alibi=has_alibi,
        kv_3d=kv_bshd,
        dropout_p=dropout_p,
        has_qv=has_qv,
    )
    if kv_bshd:
        kv_specs = [
            pl.BlockSpec(
                (1, block_k, d),
                lambda bi, qi, hi, ki, g=group: (bi, ki, hi // g),
            ),
            pl.BlockSpec(
                (1, block_k, dv),
                lambda bi, qi, hi, ki, g=group: (bi, ki, hi // g),
            ),
        ]
    else:
        kv_specs = [
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, qi, hi, ki, g=group: (bi, hi // g, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, dv),
                lambda bi, qi, hi, ki, g=group: (bi, hi // g, ki, 0),
            ),
        ]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, qi, hi, ki: (bi, hi, qi, 0)
            ),
            *kv_specs,
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, dv), lambda bi, qi, hi, ki: (bi, hi, qi, 0)
            ),
            pl.BlockSpec(
                (1, block_q, h), lambda bi, qi, hi, ki: (bi, qi, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, dv), q.dtype),
            jax.ShapeDtypeStruct((b, sq_p, h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel",
                "parallel",
                "arbitrary",
                "arbitrary",
            ),
        ),
        interpret=interpret,
    )(qp, kp, vp, *extra_inputs)
    return out[:, :, :sq], jnp.transpose(lse[:, :sq, :], (0, 2, 1))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16)
)
def _flash_core(
    q, k, v, q_segments, kv_segments, kv_bound, kv_low, alibi_slopes,
    dropout_seed,
    scale, causal, bound_causal, window, softcap, block_sizes, interpret,
    dropout_p,
):
    return _flash_forward_impl(
        q, k, v, scale, causal, block_sizes, interpret,
        q_segments=q_segments, kv_segments=kv_segments,
        kv_bound=kv_bound, bound_causal=bound_causal, kv_low=kv_low,
        window=window, softcap=softcap, alibi_slopes=alibi_slopes,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
    )


def _flash_core_fwd(
    q, k, v, q_segments, kv_segments, kv_bound, kv_low, alibi_slopes,
    dropout_seed,
    scale, causal, bound_causal, window, softcap, block_sizes, interpret,
    dropout_p,
):
    out, lse = _flash_forward_impl(
        q, k, v, scale, causal, block_sizes, interpret,
        q_segments=q_segments, kv_segments=kv_segments,
        kv_bound=kv_bound, bound_causal=bound_causal, kv_low=kv_low,
        window=window, softcap=softcap, alibi_slopes=alibi_slopes,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
    )
    return (out, lse), (
        q, k, v, out, lse, q_segments, kv_segments, kv_bound, kv_low,
        alibi_slopes, dropout_seed,
    )


def _flash_core_bwd(
    scale, causal, bound_causal, window, softcap, block_sizes, interpret,
    dropout_p, res, grads,
):
    # lse is an auxiliary output (softmax statistics); its cotangent is
    # ignored, matching the reference autograd layer
    # (hopper/_internal/flash_attn_interface.py FlashAttnFunc.backward).
    from liteattention_tpu.ops.flash_bwd import flash_attention_bwd

    (
        q, k, v, out, lse, q_segments, kv_segments, kv_bound, kv_low,
        alibi, dropout_seed,
    ) = res
    do, _ = grads
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, do, scale, causal,
        block_sizes=block_sizes, interpret=interpret,
        q_segments=q_segments, kv_segments=kv_segments,
        kv_bound=kv_bound, bound_causal=bound_causal, kv_low=kv_low,
        window=window, softcap=softcap, alibi_slopes=alibi,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
    )
    return dq, dk, dv, None, None, None, None, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale",
        "causal",
        "block_sizes",
        "return_lse",
        "interpret",
        "dropout_p",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    causal: bool = False,
    block_sizes: Optional[BlockSizes] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    qv: Optional[jax.Array] = None,
):
    """Dense flash attention forward (differentiable; Pallas bwd kernels
    in :mod:`liteattention_tpu.ops.flash_bwd`). See
    :func:`_flash_forward_impl` for argument docs.

    ``dropout_p``/``dropout_seed``: in-kernel attention dropout on P
    with 1/(1-p) rescale (reference FA2 csrc/flash_attn dropout
    semantics); the backward kernels regenerate the identical
    counter-based mask (:func:`dropout_keep_mask`), so no mask tensor
    is ever materialized. ``dropout_seed`` is a traced int32 scalar --
    vary it per training step without recompiling.

    MLA/GLA shapes (``v`` head dim != ``q``/``k`` head dim, optional
    ``qv`` extra-query term; reference benchmark_mla_decode.py) are
    forward-only: the backward kernels require equal head dims.
    """
    if interpret is None:
        interpret = _default_interpret()
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    if dropout_p > 0.0 and dropout_seed is None:
        dropout_seed = jnp.int32(0)
    if v.shape[-1] != q.shape[-1] or qv is not None:
        assert dropout_p == 0.0, "MLA shapes are inference-only"
        out, lse = _flash_forward_impl(
            q, k, v, scale, causal, block_sizes, interpret, qv=qv,
        )
    else:
        out, lse = _flash_core(
            q, k, v, None, None, None, None, None, dropout_seed,
            scale, causal, False, None, 0.0, block_sizes, interpret,
            dropout_p,
        )
    if return_lse:
        return out, lse
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale",
        "causal",
        "bound_causal",
        "block_sizes",
        "return_lse",
        "interpret",
        "window",
        "attention_chunk",
        "softcap",
        "dropout_p",
    ),
)
def flash_attention_masked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_segments: Optional[jax.Array] = None,
    kv_segments: Optional[jax.Array] = None,
    kv_bound: Optional[jax.Array] = None,
    kv_low: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    bound_causal: bool = False,
    window: Optional[Tuple[int, int]] = None,
    attention_chunk: int = 0,
    softcap: float = 0.0,
    block_sizes: Optional[BlockSizes] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    qv: Optional[jax.Array] = None,
):
    """Flash attention with varlen segments and/or per-batch key bounds.

    Inference-path entry backing ``flash_attn_varlen_func`` (packed
    sequences + segment ids; reference
    hopper/_internal/flash_attn_interface.py flash_attn_varlen_func) and
    ``flash_attn_with_kvcache`` (per-batch ``kv_bound``;
    flash_attn_interface.py flash_attn_with_kvcache). ``kv_bound`` is the
    per-batch TOTAL valid key length; ``bound_causal`` applies
    bottom-right-aligned causality against it (q row i sees cols
    < kv_bound - seqlen_q + i + 1 -- decode append). ``kv_low`` is the
    per-batch first valid key (reference ``cache_leftpad``).
    Differentiable w.r.t. q/k/v (the Pallas backward kernels apply
    identical masking).
    """
    if interpret is None:
        interpret = _default_interpret()
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    if dropout_p > 0.0 and dropout_seed is None:
        dropout_seed = jnp.int32(0)
    if (
        v.shape[-1] != q.shape[-1]
        or qv is not None
        or attention_chunk > 0
    ):
        # MLA shapes and attention_chunk are forward-only (the reference
        # FA3 backward asserts attention_chunk == 0,
        # flash_attn_interface.py:239).
        assert dropout_p == 0.0, "this configuration is inference-only"
        out, lse = _flash_forward_impl(
            q, k, v, scale, causal, block_sizes, interpret,
            q_segments=q_segments, kv_segments=kv_segments,
            kv_bound=kv_bound, bound_causal=bound_causal, kv_low=kv_low,
            window=window, attention_chunk=attention_chunk,
            softcap=softcap, alibi_slopes=alibi_slopes,
            qv=qv,
        )
    else:
        out, lse = _flash_core(
            q, k, v, q_segments, kv_segments, kv_bound, kv_low,
            alibi_slopes, dropout_seed,
            scale, causal, bound_causal, window, softcap, block_sizes,
            interpret, dropout_p,
        )
    if return_lse:
        return out, lse
    return out


def _decode_folded_kernel(
    qbd_ref,  # VMEM (1, 1, 128, L) block-diagonal packed q
    *refs,  # [qrs when int8-MMA], k, v, bound, low, outs, scratch
    scale: float,
    kt: int,
    chunk: int,
    softcap: float,
    int8_mma: bool = False,
):
    """Head-folded decode step: all ``slab`` KV heads of this program are
    reduced by ONE wide matmul pair per cache chunk.

    The bandwidth key (reference decode engineering:
    hopper/_internal/cpp/paged_kv.h, pack_gqa.h): q rows are laid out
    BLOCK-DIAGONALLY over the concatenated head lanes, so
    ``Q_bd @ K_chunk^T`` contracts each row only against its own head's
    128-lane block while the DMA streams the cache CONTIGUOUSLY at full
    lane width [chunk, Hk*D] -- no 128-lane strided slices (the round-2
    per-head walk read 256 B of every 2 KB and sat at 17.5% of HBM
    peak). PV likewise: garbage lanes of each row are sliced off on the
    host.
    """
    if int8_mma:
        qrs_ref = refs[0]  # VMEM (1, 1, 128, 128) per-row q scales
        refs = refs[1:]
    (k_ref, v_ref, bound_ref, low_ref, o_ref, lse_ref,
     m_scr, l_scr, acc_scr) = refs
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    precision = (
        jax.lax.Precision.HIGHEST
        if qbd_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    q = qbd_ref[0, 0]
    k = k_ref[0]
    if int8_mma:
        # int8 x int8 -> int32 MXU QK (round 5): removes the in-kernel
        # k dequant cast -- a full-width VPU pass that rivals the
        # matmul on the halved stream (same rationale as
        # paged_attention's int8_mma). The per-row q scale re-enters
        # the f32 score exactly.
        raw = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * qrs_ref[0, 0][:, :1]
    else:
        if k.dtype == jnp.int8:
            # int8-quantized cache (per-channel scales folded into q /
            # the output on the host -- exact): the DMA moved half the
            # bytes; the cast back to the compute dtype is a VPU pass,
            # ~10x faster than the HBM stream it replaces.
            k = k.astype(q.dtype)
        raw = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    if softcap > 0.0:
        s = softcap * jnp.tanh(raw * scale / softcap) * LOG2E
    else:
        s = raw * (scale * LOG2E)
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (128, chunk), 1) + ci * chunk
    )
    valid = jnp.logical_and(
        col < bound_ref[0, 0, 0], col >= low_ref[0, 0, 0]
    )
    s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])
    p = jnp.exp2(s - m_next[:, :1])
    l_curr = jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = alpha * l_scr[...] + l_curr
    v = v_ref[0]
    if v.dtype == jnp.int8:
        # PV stays on the dequant cast: quantizing the softmax weights
        # was tried (round 5) and is UNBOUNDED on diffuse rows -- tail
        # mass below the 1/254 step silently drops (7% rel-L2 measured
        # on random inputs) -- so only QK rides the int8 MXU.
        v = v.astype(jnp.bfloat16 if int8_mma else q.dtype)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(ci == kt - 1)
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
            m_col * LN2 + jnp.log(jnp.maximum(l, 1e-37)),
        )
        lse_ref[0, 0] = jnp.broadcast_to(lse, (128, MIN_LANES))


def pick_head_slab(hk: int, rows_per_head: int, d: int) -> int:
    """Largest KV-head slab with ``slab * rows_per_head <= 128`` q rows
    AND ``slab * d <= 1024`` lanes, dividing ``hk``. The (*, 1024)
    block geometry is the proven dense/gather family; 4096-lane blocks
    stalled Mosaic (CLAUDE.md round-3 gotcha a). Shared by the folded
    cache decode and the folded paged decode."""
    slab = max(1, min(hk, 128 // rows_per_head, 1024 // d))
    while hk % slab:
        slab -= 1
    return slab


def fold_q_blockdiag(
    q: jax.Array, nslab: int, slab: int, rows_per_head: int, d: int
) -> jax.Array:
    """Block-diagonal Q pack for head-folded decode: ``q`` rows in
    (slab-head)-major order ``[B, nslab*slab*rows_per_head, D]``-like
    ``[B, nslab, slab, rows_per_head, D]`` view -> ``[B, nslab, 128,
    slab*D]`` where row ``j*rows_per_head + t`` owns lane block ``j``
    (zero elsewhere), padded to the 128-row tile."""
    b = q.shape[0]
    rows = slab * rows_per_head
    eye = jnp.eye(slab, dtype=q.dtype)
    qbd = jnp.einsum(
        "bnjtd,jk->bnjtkd",
        q.reshape(b, nslab, slab, rows_per_head, d),
        eye,
    ).reshape(b, nslab, rows, slab * d)
    return jnp.pad(qbd, ((0, 0), (0, 0), (0, 128 - rows), (0, 0)))


def unfold_output_diag(
    out_bd: jax.Array, slab: int, rows_per_head: int, d: int
) -> jax.Array:
    """Inverse of :func:`fold_q_blockdiag` for the kernel output: row
    ``j*rows_per_head + t`` keeps only its own lane block ``j``.
    Einsum-against-identity on purpose: XLA lowers advanced-indexing
    diagonals to a serial-slow TPU gather (~0.85 ms/call measured).
    Returns f32 ``[B, nslab, slab, rows_per_head, D]``."""
    b, nslab = out_bd.shape[:2]
    rows = slab * rows_per_head
    return jnp.einsum(
        "bnjtkd,jk->bnjtd",
        out_bd[:, :, :rows]
        .reshape(b, nslab, slab, rows_per_head, slab, d)
        .astype(jnp.float32),
        jnp.eye(slab, dtype=jnp.float32),
    )


def _decode_folded(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    kv_bound: Optional[jax.Array],
    kv_low: Optional[jax.Array],
    scale: float,
    softcap: float,
    chunk: int,
    interpret: bool,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    int8_mma: bool = False,
):
    """Host side of the head-folded decode (see _decode_folded_kernel).

    q ``[B, H, Sq, D]`` (Sq small), caches in the CACHE layout
    ``[B, S, Hk, D]`` with ``D % 128 == 0``. Picks the largest KV-head
    slab with ``slab * group * Sq <= 128`` q rows, builds the
    block-diagonal Q on host (tiny), and streams the cache at full lane
    width.

    int8 caches (``ops/kv_quant``): ``k_scale``/``v_scale`` are
    per-(batch, kv-head, channel) ``[B, Hk, D]`` dequant scales. They
    fold EXACTLY outside the kernel -- score(r, c) = q_r . (k_i8_c *
    ks) = (q_r * ks) . k_i8_c per channel, so ks multiplies q before
    the block-diagonal pack, and out = P . (v_i8 * vs) = (P . v_i8) *
    vs, so vs multiplies the extracted output lanes -- the TPU-shaped
    analog of the reference's fp8 descale epilogue
    (hopper/_internal/flash_attn_interface.py q_descale/k_descale/
    v_descale). The kernel only casts int8 -> compute dtype after the
    (halved) HBM stream.
    """
    b, h, sq, d = q.shape
    s, hk = k_cache.shape[1], k_cache.shape[2]
    group = h // hk
    if k_cache.dtype == jnp.int8:
        assert k_scale is not None and v_scale is not None, (
            "int8 caches need k_scale/v_scale [B, Hk, D] "
            "(ops/kv_quant.quantize_kv_cache)"
        )
        qf = q.reshape(b, hk, group, sq, d).astype(jnp.float32)
        q = (qf * k_scale[:, :, None, None, :]).astype(q.dtype)
        q = q.reshape(b, h, sq, d)
    rows_per_head = group * sq
    slab = pick_head_slab(hk, rows_per_head, d)
    nslab = hk // slab
    lanes = slab * d
    rows = slab * rows_per_head
    qbd = fold_q_blockdiag(q, nslab, slab, rows_per_head, d)
    use_i8mma = int8_mma and k_cache.dtype == jnp.int8
    if use_i8mma:
        # Per-row int8 q for the int8 x int8 MXU path (block-diag
        # zeros quantize exactly); see _decode_folded_kernel.
        qf32 = qbd.astype(jnp.float32)
        qrs = jnp.maximum(
            jnp.max(jnp.abs(qf32), axis=-1, keepdims=True), 1e-30
        ) / 127.0
        qbd = jnp.round(qf32 / qrs).astype(jnp.int8)
        qrs_in = jnp.broadcast_to(
            qrs, (*qrs.shape[:-1], MIN_LANES)
        ).astype(jnp.float32)

    pad_s = (-s) % chunk
    if pad_s:
        # Caches are normally allocated at tile-friendly lengths; the
        # pad is a one-off copy otherwise.
        kpad = ((0, 0), (0, pad_s), (0, 0), (0, 0))
        k_cache, v_cache = jnp.pad(k_cache, kpad), jnp.pad(v_cache, kpad)
    s_p = s + pad_s
    kt = s_p // chunk
    kf = k_cache.reshape(b, s_p, hk * d)
    vf = v_cache.reshape(b, s_p, hk * d)

    bound = (
        kv_bound.astype(jnp.int32)
        if kv_bound is not None
        else jnp.full((b,), s, jnp.int32)
    )
    low = (
        kv_low.astype(jnp.int32)
        if kv_low is not None
        else jnp.zeros((b,), jnp.int32)
    )
    bound = jnp.broadcast_to(bound.reshape(b, 1, 1), (b, 1, chunk))
    low = jnp.broadcast_to(low.reshape(b, 1, 1), (b, 1, chunk))

    kernel = functools.partial(
        _decode_folded_kernel,
        scale=scale,
        kt=kt,
        chunk=chunk,
        softcap=softcap,
        int8_mma=use_i8mma,
    )
    grid = (b, nslab, kt)
    qrs_spec = (
        [
            pl.BlockSpec(
                (1, 1, 128, MIN_LANES),
                lambda bi, ni, ci: (bi, ni, 0, 0),
            )
        ]
        if use_i8mma
        else []
    )
    out_bd, lse_bd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 128, lanes), lambda bi, ni, ci: (bi, ni, 0, 0)
            ),
            *qrs_spec,
            pl.BlockSpec(
                (1, chunk, lanes), lambda bi, ni, ci: (bi, ci, ni)
            ),
            pl.BlockSpec(
                (1, chunk, lanes), lambda bi, ni, ci: (bi, ci, ni)
            ),
            pl.BlockSpec(
                (1, 1, chunk), lambda bi, ni, ci: (bi, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, chunk), lambda bi, ni, ci: (bi, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 128, lanes), lambda bi, ni, ci: (bi, ni, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, 128, MIN_LANES), lambda bi, ni, ci: (bi, ni, 0, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nslab, 128, lanes), q.dtype),
            jax.ShapeDtypeStruct((b, nslab, 128, MIN_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, MIN_LANES), jnp.float32),
            pltpu.VMEM((128, MIN_LANES), jnp.float32),
            pltpu.VMEM((128, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qbd, *([qrs_in] if use_i8mma else []), kf, vf, bound, low)

    o = unfold_output_diag(out_bd, slab, rows_per_head, d)
    if v_scale is not None:
        # Exact per-channel V dequant: (P . v_i8) * vs (see docstring).
        o = o * v_scale.reshape(b, nslab, slab, 1, d)
    o = o.astype(out_bd.dtype).reshape(b, h, sq, d)
    lse = lse_bd[:, :, :rows, 0].reshape(b, h, sq)
    return o, lse


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale",
        "softcap",
        "block_sizes",
        "interpret",
        "folded",
        "int8_mma",
    ),
)
def flash_attention_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    kv_bound: Optional[jax.Array] = None,
    kv_low: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    softcap: float = 0.0,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    folded: bool = True,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    int8_mma: bool = False,
):
    """Bandwidth-optimal single-token decode against a KV cache.

    ``k_cache``/``v_cache`` may be int8 (``ops/kv_quant``), with
    ``k_scale``/``v_scale`` the per-(batch, kv-head, channel) dequant
    scales ``[B, Hk, D]``: the cache stream then moves HALF the HBM
    bytes -- decode is bandwidth-bound, so this approaches a 2x step
    speedup (or 2x context at equal latency) -- while the scales fold
    exactly into q and the output (see :func:`_decode_folded`).
    int8 requires the folded path. ``int8_mma=True`` (round-5 default
    for int8 caches) additionally runs the QK contraction int8 x int8
    on the MXU, removing the in-kernel k dequant cast at the cost of
    ~1/254 relative rounding on the logits (same error class as the
    cache quantization itself); set False for the exact scale-folding
    dequant path.

    ``q`` is ``[B, H, Sq, D]`` with small Sq (packed GQA rows and/or a
    few query tokens); ``k_cache``/``v_cache`` stay in the CACHE layout
    ``[B, S_max, Hk, D]`` -- no transpose is materialized (the
    [B,H,S,D] relayout of a multi-GB cache ran at ~40 GB/s and
    dominated decode latency). ``kv_bound``/``kv_low`` bound the valid
    cache region per batch (``cache_seqlens`` / ``cache_leftpad``).
    Inference-only (not differentiable). Requires D % 128 == 0;
    callers fall back to :func:`flash_attention_masked` otherwise.

    ``folded=True`` (round 3 default) runs the head-folded
    block-diagonal kernel: the cache streams CONTIGUOUSLY at full lane
    width and one wide matmul pair serves a whole slab of KV heads per
    chunk (see :func:`_decode_folded`; the round-2 per-head walk read
    128-lane strided slices and reached only 17.5% of HBM peak on GQA).
    Falls back to the per-head kernel when the q rows of a single KV
    head exceed 128 (very long Sq).

    Returns ``(out, lse)``.
    """
    if interpret is None:
        interpret = _default_interpret()
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    b, h, sq, d = q.shape
    hk = k_cache.shape[2]
    group = h // hk
    if k_cache.dtype == jnp.int8:
        assert folded and group * sq <= 128 and d % 128 == 0, (
            "int8 caches are supported on the folded decode path only"
        )
    if folded and group * sq <= 128:
        chunk = (block_sizes or BlockSizes(128, 1024)).block_k
        # Keep the (chunk, slab*d) stream block within VMEM budget
        # (slab cap mirrors _decode_folded). int8 halves the bytes per
        # row, so the same budget admits a 2x chunk.
        slab = max(1, min(hk, 128 // (group * sq), 1024 // d))
        while hk % slab:
            slab -= 1
        itemsize = jnp.dtype(k_cache.dtype).itemsize
        chunk = max(256, min(chunk, (1 << 21) // (slab * d * itemsize)))
        chunk = min(chunk, max(256, -(-k_cache.shape[1] // 256) * 256))
        return _decode_folded(
            q, k_cache, v_cache, kv_bound, kv_low, scale, softcap,
            chunk, interpret, k_scale=k_scale, v_scale=v_scale,
            int8_mma=int8_mma,
        )
    return _flash_forward_impl(
        q,
        k_cache,
        v_cache,
        scale,
        False,
        block_sizes or BlockSizes(128, 2048),
        interpret,
        kv_bound=kv_bound,
        bound_causal=False,
        kv_low=kv_low,
        softcap=softcap,
        kv_bshd=True,
    )


__all__ = [
    "flash_attention",
    "flash_attention_masked",
    "flash_attention_decode",
    "DEFAULT_MASK_VALUE",
]
