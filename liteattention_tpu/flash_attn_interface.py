"""flash_attn-compatible functional API (L2 parity layer).

TPU-native counterpart of the reference's op-binding layer
(``hopper/_internal/flash_attn_interface.py``): the ``flash_attn_*``
functional surface, taking the reference's ``[batch, seq, heads, dim]``
layout, with the LiteAttention skip extras
(``attn_read_list/attn_must_do_list/attn_write_list/thr``,
flash_attn_interface.py:54-58,547-567).

Deviations, by design (functional JAX vs mutable torch):

* Skip state is passed as a **dense bool tile mask** (``attn_read_list``)
  rather than int32 range lists; converters live in
  :mod:`liteattention_tpu.ops.mask` for wire-format interop.
* The reference writes the next-step list into ``attn_write_list``
  **in place**; here the updated mask is *returned* (``return_skip_mask``)
  -- there is no aliasing in JAX. ``attn_write_list`` is accepted and
  ignored (a migration shim).
* There is no separate autograd Function layer: ``flash_attn_func`` is
  differentiable through its dense path via custom_vjp (the sparse path
  is inference-only, like the reference's shipped fwd-only build,
  hopper/setup.py:47-68).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from liteattention_tpu.ops.combine import combine_attention
from liteattention_tpu.ops.flash_fwd import (
    flash_attention,
    flash_attention_decode,
    flash_attention_masked,
)
from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
from liteattention_tpu.ops.mla import mla_decode
from liteattention_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_folded,
)
from liteattention_tpu.ops.mask import (
    SkipMaskState,
    compact_mask,
    compact_mask_gather,
    update_mask,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes


def _bshd_to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _bhsd_to_bshd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def flash_attn_func(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    qv=None,
    q_descale=None,
    k_descale=None,
    v_descale=None,
    window_size: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,
    softcap: float = 0.0,
    num_splits: int = 1,
    pack_gqa=None,
    deterministic: bool = False,
    sm_margin: int = 0,
    attn_read_list: Optional[jax.Array] = None,
    attn_must_do_list: Optional[jax.Array] = None,
    attn_write_list=None,  # accepted for signature parity; see module doc
    thr: float = -3.0,
    return_softmax_lse: bool = False,
    return_skip_mask: bool = False,
    alibi_slopes: Optional[jax.Array] = None,
    block_sizes: Optional[BlockSizes] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    """Attention forward, dense or skip-masked.

    Parity target: ``flash_attn_func`` (reference
    hopper/_internal/flash_attn_interface.py:466-567; schema defaults
    ``thr=-3.0`` per flash_api.cpp:1758-1762).

    Args:
      q, k, v: ``[batch, seqlen, heads, head_dim]``. GQA/MQA via fewer
        KV heads.
      attn_read_list: optional dense bool skip mask ``[B, H, Qt, Kt]``;
        when given the sparse kernel runs (``is_skipable`` path,
        flash_api.cpp:915-963) and skip votes are folded into the
        returned mask.
      thr: skip threshold (log2 space).
      return_skip_mask: also return the evolved mask (the reference's
        write-list, returned instead of mutated).

    Returns:
      ``out`` plus optionally ``lse`` (fp32 ``[B, H, S]``) and the evolved
      mask, in that order.
    """
    # Positional-parity arguments (reference
    # flash_attn_interface.py:466-567). fp8 descales are unsupported;
    # scheduling hints (num_splits, pack_gqa, sm_margin) are Mosaic's
    # job on TPU; kernels are always deterministic. attention_chunk
    # (llama4-style chunked attention, reference mask.h:116-119) is
    # forward-only, like the reference (FA3 backward asserts it == 0).
    assert q_descale is None and k_descale is None and v_descale is None, (
        "fp8 descales are not supported (bf16/f32 kernels)"
    )
    del num_splits, pack_gqa, deterministic, sm_margin
    del attn_write_list
    if qv is not None and softmax_scale is None:
        # Reference MLA convention (flash_attn_interface.py:301): the
        # score is q.k + qv.v, so the scale covers both dims.
        softmax_scale = (q.shape[-1] + qv.shape[-1]) ** (-0.5)
    qh = _bshd_to_bhsd(q)
    kh = _bshd_to_bhsd(k)
    vh = _bshd_to_bhsd(v)
    qvh = _bshd_to_bhsd(qv) if qv is not None else None
    d = q.shape[-1]
    bs = block_sizes or get_block_sizes(
        d, q.dtype.itemsize,
        kind="dense" if attn_read_list is None else "lite",
    )
    window = None if window_size == (-1, -1) else tuple(window_size)
    if attn_read_list is None:
        out, lse = flash_attention_masked(
            qh,
            kh,
            vh,
            alibi_slopes=alibi_slopes,
            scale=softmax_scale,
            causal=causal,
            window=window,
            attention_chunk=int(attention_chunk),
            softcap=softcap,
            block_sizes=bs,
            return_lse=True,
            dropout_p=dropout_p,
            dropout_seed=dropout_seed,
            qv=qvh,
        )
        new_mask = None
    else:
        assert not attention_chunk, (
            "attention_chunk composes with the dense path only"
        )
        assert qv is None, "qv (MLA) composes with the dense path only"
        assert dropout_p == 0.0, (
            "attention dropout is a training feature; the skip-masked "
            "engine is inference-only (reference ships it in the "
            "inference build, hopper/setup.py:47-68)"
        )
        assert not causal, "skip-masked attention is non-causal (video DiT)"
        assert window is None and softcap == 0.0 and alibi_slopes is None, (
            "skip-masked attention composes with none of window/softcap/"
            "alibi (matching the reference's lean skipable build, "
            "hopper/setup.py:47-68)"
        )
        # Mask granularity is inferred from its shape: FINE (128x128,
        # the round-2 default matching the reference's resolution) or
        # COARSE (compute-tile granularity; static blocksparse masks).
        sq, sk = q.shape[1], k.shape[1]
        bq = min(bs.block_q, max(128, -(-sq // 128) * 128))
        bk = min(bs.block_k, max(128, -(-sk // 128) * 128))
        qtm, ktm = attn_read_list.shape[-2:]
        fine_shape = (-(-sq // 128), -(-sk // 128))
        coarse_shape = (-(-sq // bq), -(-sk // bk))
        fine = (qtm, ktm) == fine_shape
        if fine:
            kv_idx, count, kv_bits = compact_mask_gather(
                attn_read_list, bq // 128
            )
        elif (qtm, ktm) == coarse_shape:
            kv_idx, count = compact_mask(attn_read_list)
            kv_bits = None
        else:
            raise ValueError(
                f"attn_read_list tile grid {(qtm, ktm)} matches neither "
                f"fine {fine_shape} nor coarse {coarse_shape} granularity"
            )
        out, lse, votes = lite_flash_attention(
            qh,
            kh,
            vh,
            kv_idx,
            count,
            jnp.asarray(thr, jnp.float32),
            kv_bits=kv_bits,
            scale=softmax_scale,
            block_sizes=bs,
            fine_schedule=fine,
        )
        votes = votes[:, :, :qtm, :ktm]
        st = update_mask(
            SkipMaskState(attn_read_list, jnp.zeros((), jnp.int32)),
            votes,
            must_do=attn_must_do_list,
        )
        new_mask = st.do_mask
    out = _bhsd_to_bshd(out)
    result = [out]
    if return_softmax_lse:
        result.append(lse)
    if return_skip_mask:
        result.append(new_mask)
    return result[0] if len(result) == 1 else tuple(result)


def flash_attn_qkvpacked_func(
    qkv: jax.Array,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    return_softmax_lse: bool = False,
    **kwargs,
):
    """Packed-QKV attention (reference flash_attn_interface.py
    ``flash_attn_qkvpacked_func``). ``qkv``: [B, S, 3, H, D]."""
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    return flash_attn_func(
        q,
        k,
        v,
        softmax_scale=softmax_scale,
        causal=causal,
        return_softmax_lse=return_softmax_lse,
        **kwargs,
    )


def flash_attn_kvpacked_func(
    q: jax.Array,
    kv: jax.Array,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    return_softmax_lse: bool = False,
    **kwargs,
):
    """Packed-KV attention. ``kv``: [B, S, 2, H, D]."""
    return flash_attn_func(
        q,
        kv[:, :, 0],
        kv[:, :, 1],
        softmax_scale=softmax_scale,
        causal=causal,
        return_softmax_lse=return_softmax_lse,
        **kwargs,
    )


def _gather_rotary(tab, pos):
    """tab [seqlen_ro, rd/2] fp32, pos int32 [B, S] -> [B, S, rd/2]."""
    return jnp.take(tab.astype(jnp.float32), pos, axis=0)


def _apply_rotary_batched(x, cos, sin, interleaved):
    """Rotary with per-batch per-position tables.

    ``x``: [B, S, H, D]; ``cos``/``sin``: [B, S, rd/2]. Matches the
    reference's kvcache rotary semantics (rotary_interleaved flag,
    partial rotary over the first 2*rd/2 features).
    """
    ro = 2 * cos.shape[-1]
    d = x.shape[-1]
    xf = x[..., :ro].astype(jnp.float32)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    if interleaved:
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        rot = jnp.stack(
            [x1 * c - x2 * s, x1 * s + x2 * c], axis=-1
        ).reshape(xf.shape)
    else:
        x1, x2 = jnp.split(xf, 2, axis=-1)
        rot = jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    rot = rot.astype(x.dtype)
    if ro < d:
        rot = jnp.concatenate([rot, x[..., ro:]], axis=-1)
    return rot


def flash_attn_varlen_func(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    max_seqlen_q: Optional[int] = None,
    max_seqlen_k: Optional[int] = None,
    seqused_q: Optional[jax.Array] = None,
    seqused_k: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    qv=None,
    q_descale=None,
    k_descale=None,
    v_descale=None,
    window_size: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,
    softcap: float = 0.0,
    num_splits: int = 1,
    pack_gqa=None,
    deterministic: bool = False,
    sm_margin: int = 0,
    return_softmax_lse: bool = False,
    block_sizes: Optional[BlockSizes] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    """Variable-length attention over packed sequences.

    Parity target: ``flash_attn_varlen_func`` (reference
    hopper/_internal/flash_attn_interface.py:637-683). Inputs are packed
    ``[total_tokens, heads, head_dim]`` with ``cu_seqlens_* [B+1]``
    int32 prefix sums. On TPU the per-sequence boundaries become
    segment-id masking inside the dense kernel (the idiomatic
    replacement for the reference's varlen scheduler,
    flash_prepare_scheduler.cu); ``max_seqlen_*`` are accepted for
    signature parity but unused (the grid is static).

    ``seqused_q``/``seqused_k`` restrict each sequence to its first N
    tokens (reference semantics); masked-out q rows produce zero output
    and -inf lse.

    Causal / sliding-window masking is applied per segment: positions
    are compared on the packed axis, which equals the per-segment
    relative comparison iff q and k share the packing -- asserted.
    """
    if qv is not None:
        raise NotImplementedError("qv-packed fp8 path is not supported")
    assert q_descale is None and k_descale is None and v_descale is None, (
        "fp8 descales are not supported (bf16/f32 kernels)"
    )
    del max_seqlen_q, max_seqlen_k, num_splits, pack_gqa, deterministic
    del sm_margin
    tq, h, d = q.shape
    tk = k.shape[0]
    # token -> segment index via prefix-sum search.
    pos_q = jnp.arange(tq)
    pos_k = jnp.arange(tk)
    seg_q = (
        jnp.searchsorted(cu_seqlens_q[1:], pos_q, side="right")
    ).astype(jnp.int32)
    seg_k = (
        jnp.searchsorted(cu_seqlens_k[1:], pos_k, side="right")
    ).astype(jnp.int32)
    if seqused_q is not None:
        # Tokens past seqused_q[i] within sequence i are dead q rows:
        # give them a segment id that matches no key.
        local_q = pos_q - jnp.take(cu_seqlens_q, seg_q)
        seg_q = jnp.where(
            local_q < jnp.take(seqused_q.astype(jnp.int32), seg_q),
            seg_q,
            -1,
        )
    if seqused_k is not None:
        local_k = pos_k - jnp.take(cu_seqlens_k, seg_k)
        seg_k = jnp.where(
            local_k < jnp.take(seqused_k.astype(jnp.int32), seg_k),
            seg_k,
            -2,
        )
    seg_q = seg_q[None]
    seg_k = seg_k[None]
    qh = jnp.transpose(q, (1, 0, 2))[None]
    kh = jnp.transpose(k, (1, 0, 2))[None]
    vh = jnp.transpose(v, (1, 0, 2))[None]
    d_model = q.shape[-1]
    bs = block_sizes or get_block_sizes(d_model, q.dtype.itemsize)
    window = None if tuple(window_size) == (-1, -1) else tuple(window_size)
    if attention_chunk:
        # Chunked attention on packed sequences (reference
        # mask.h:116-119 via the varlen fwd): with identical q/k packing
        # the chunk-membership predicate
        # ``floor(local_row/chunk) == floor(local_col/chunk)`` is pure
        # segment algebra, so it folds into the EXISTING segment-id
        # masking -- refine each token's segment id with its local chunk
        # index (dead-row markers stay negative and unequal).
        assert tq == tk, (
            "attention_chunk varlen requires identical q/k packing"
        )
        chunk = int(attention_chunk)
        mult = tq // chunk + 2
        local_q = pos_q.astype(jnp.int32) - jnp.take(cu_seqlens_q, jnp.clip(seg_q, 0))
        local_k = pos_k.astype(jnp.int32) - jnp.take(cu_seqlens_k, jnp.clip(seg_k, 0))
        seg_q = jnp.where(seg_q < 0, seg_q, seg_q * mult + local_q // chunk)
        seg_k = jnp.where(seg_k < 0, seg_k, seg_k * mult + local_k // chunk)
    if causal or window is not None or attention_chunk:
        # Global-position causal/window + segment equality == the
        # segment-local predicate, provided q and k share the packing
        # (self-attention varlen). Cross-packing is not supported.
        assert tq == tk, (
            "causal/windowed varlen requires identical q/k packing "
            "(self-attention)"
        )
        try:
            import numpy as _np

            same = bool(
                (_np.asarray(cu_seqlens_q) == _np.asarray(cu_seqlens_k))
                .all()
            )
            assert same, (
                "causal/windowed varlen requires cu_seqlens_q == "
                "cu_seqlens_k (cross-packing positions are undefined on "
                "the packed axis)"
            )
        except jax.errors.TracerArrayConversionError:
            pass  # traced cu_seqlens: caller's responsibility
    out, lse = flash_attention_masked(
        qh,
        kh,
        vh,
        q_segments=seg_q,
        kv_segments=seg_k,
        scale=softmax_scale,
        causal=causal,
        window=window,
        softcap=softcap,
        block_sizes=bs,
        return_lse=True,
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
    )
    out = jnp.transpose(out[0], (1, 0, 2))
    if return_softmax_lse:
        return out, lse[0]
    return out


def flash_attn_varlen_qkvpacked_func(
    qkv: jax.Array,
    cu_seqlens: jax.Array,
    max_seqlen: Optional[int] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    **kwargs,
):
    """Packed-QKV varlen attention (reference
    flash_attn/flash_attn_interface.py:1212). ``qkv``: [total, 3, H, D]."""
    return flash_attn_varlen_func(
        qkv[:, 0],
        qkv[:, 1],
        qkv[:, 2],
        cu_seqlens,
        cu_seqlens,
        max_seqlen,
        max_seqlen,
        softmax_scale=softmax_scale,
        causal=causal,
        **kwargs,
    )


def flash_attn_varlen_kvpacked_func(
    q: jax.Array,
    kv: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    max_seqlen_q: Optional[int] = None,
    max_seqlen_k: Optional[int] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    **kwargs,
):
    """Packed-KV varlen attention (reference
    flash_attn/flash_attn_interface.py:1278). ``kv``: [total_k, 2, H, D]."""
    return flash_attn_varlen_func(
        q,
        kv[:, 0],
        kv[:, 1],
        cu_seqlens_q,
        cu_seqlens_k,
        max_seqlen_q,
        max_seqlen_k,
        softmax_scale=softmax_scale,
        causal=causal,
        **kwargs,
    )


def flash_attn_with_kvcache(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k: Optional[jax.Array] = None,
    v: Optional[jax.Array] = None,
    qv=None,
    rotary_cos: Optional[jax.Array] = None,
    rotary_sin: Optional[jax.Array] = None,
    cache_seqlens: Optional[Union[int, jax.Array]] = None,
    cache_batch_idx: Optional[jax.Array] = None,
    cache_leftpad: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,
    cu_seqlens_q: Optional[jax.Array] = None,
    cu_seqlens_k_new: Optional[jax.Array] = None,
    max_seqlen_q: Optional[int] = None,
    rotary_seqlens: Optional[jax.Array] = None,
    q_descale=None,
    k_descale=None,
    v_descale=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,
    softcap: float = 0.0,
    rotary_interleaved: bool = True,
    scheduler_metadata=None,
    num_splits: int = 1,
    pack_gqa=None,
    sm_margin: int = 0,
    return_softmax_lse: bool = False,
    block_sizes: Optional[BlockSizes] = None,
    kv_cache_layout: str = "bshd",
    k_cache_scale: Optional[jax.Array] = None,
    v_cache_scale: Optional[jax.Array] = None,
    max_seqlen_k_new: Optional[int] = None,
    int8_mma: bool = False,
):
    """Decode/append attention against a fixed-capacity KV cache.

    Parity target: ``flash_attn_with_kvcache`` (reference
    hopper/_internal/flash_attn_interface.py:688-861; same argument
    order through ``return_softmax_lse``). ``k_cache``/``v_cache`` are
    ``[B, S_max, Hk, D]`` (or ``[num_pages, page_size, Hk, D]`` with
    ``page_table``); optional new ``k``/``v`` ``[B, S_new, Hk, D]`` are
    written at ``cache_seqlens`` (per batch) and attended. Returns out
    (and updated caches via the return tuple -- JAX is functional; the
    reference updates in place).

    Supported reference extras: ``rotary_cos``/``rotary_sin`` (+
    ``rotary_interleaved``, ``rotary_seqlens``) applied to q and new k
    pre-kernel at the reference's positions; ``cache_batch_idx``
    (gather/scatter around the kernel); ``cache_leftpad`` (per-batch
    first valid key); ``window_size``; ``softcap``; paged decode AND
    paged append/prefill (new tokens are scattered into their pages
    first, then attended).

    Varlen-q batches (``cu_seqlens_q``/``cu_seqlens_k_new``, packed
    ``[total, H, D]`` inputs) are ACCEPTED via internal right-aligned
    padding to ``max_seqlen_q`` (required) / ``max_seqlen_k_new``
    (TPU extension, static new-KV pad bound, defaults to the packed
    total) -- see :func:`_kvcache_varlen_q`.

    Not supported (documented descopes): fp8 descales, skip lists in
    the decode path. ``causal`` defaults to False like the reference.

    MLA/GLA decode (reference benchmark_mla_decode.py): ``v_cache`` may
    have a different head dim than ``k_cache`` (output takes V's dim)
    and ``qv`` adds the extra-query term ``qv . v`` to the scores, on
    the contiguous generic path. For DeepSeek-style ABSORBED MLA, where
    K and V are slices of one latent cache, use
    :func:`flash_mla_with_kvcache` / ``ops/mla.mla_decode`` -- the
    dedicated kernel streams the shared cache once.

    TPU extension: ``kv_cache_layout="bhsd"`` keeps the caches as
    ``[B, Hk, S_max, D]`` (head-major). Decode reads each head's cache
    slice CONTIGUOUSLY -- the reference's ``[B, S, Hk, D]`` layout
    interleaves heads every row, which on TPU costs either a multi-GB
    relayout per step or strided 256-byte DMA bursts. Serving loops
    (``utils/generation``) should allocate caches in this layout; the
    new-token ``k``/``v`` arguments stay ``[B, S_new, Hk, D]``
    (reference parity) in both modes.

    Causality is bottom-right aligned: new query i attends cache
    positions < cache_seqlens + appended - S_new + i + 1.

    TPU extension (int8 KV cache): pass int8 ``k_cache``/``v_cache``
    with ``k_cache_scale``/``v_cache_scale`` ``[B, Hk, D]``
    (``ops/kv_quant.quantize_kv_cache``) for the pure single-token
    decode config (reference bshd layout, ``d % 128 == 0``, no append
    -- append into an int8 cache with ``ops/kv_quant
    .quantize_kv_append`` BEFORE the call). Decode is HBM-bound, so
    halving the cache bytes approaches a 2x step speedup; this is the
    functional analog of the fp8 descale path the reference compiles
    out (hopper/setup.py:47-68). ``int8_mma=True`` (opt-in) further
    runs the QK contraction int8 x int8 on the MXU -- a reduced-
    precision mode with percent-class logit rounding, the accuracy
    class of the reference's fp8 attention; the default dequant path
    is exact w.r.t. the quantized cache.
    """
    if attention_chunk:
        # Chunked attention (reference mask.h:116-119): supported on the
        # contiguous cache paths; page-table and split-KV composition is
        # descoped (the reference's heuristics disable splits there too).
        assert page_table is None and num_splits <= 1, (
            "attention_chunk composes with the contiguous unsplit "
            "cache path only"
        )
    assert q_descale is None and k_descale is None and v_descale is None, (
        "fp8 descales are not supported (bf16/f32 kernels)"
    )
    if qv is not None:
        # MLA extra-query term (reference benchmark_mla_decode.py:79):
        # scores = q.k + qv.v; generic (unfolded) decode path only. For
        # the absorbed-MLA latent cache (K and V sharing one array) use
        # ops/mla.mla_decode -- it streams the cache once.
        assert page_table is None and num_splits <= 1 and k is None, (
            "qv (MLA) supports the contiguous non-split decode path; "
            "see ops/mla.mla_decode for the absorbed latent-cache kernel"
        )
        if softmax_scale is None:
            softmax_scale = (q.shape[-1] + qv.shape[-1]) ** (-0.5)
    if cu_seqlens_q is not None:
        # Varlen-q batches (reference flash_attn_interface.py:688-861):
        # accepted via internal right-aligned padding; see
        # _kvcache_varlen_q for the exact-predicate argument.
        return _kvcache_varlen_q(
            q, k_cache, v_cache, k, v, qv, rotary_cos, rotary_sin,
            cache_seqlens, cache_batch_idx, cache_leftpad, page_table,
            cu_seqlens_q, cu_seqlens_k_new, max_seqlen_q,
            max_seqlen_k_new, rotary_seqlens, softmax_scale, causal,
            window_size, attention_chunk, softcap, rotary_interleaved,
            num_splits, return_softmax_lse, block_sizes,
            kv_cache_layout,
        )
    if cu_seqlens_k_new is not None:
        # Dense q + ragged new-KV batches (round 5): express the dense
        # q as a degenerate varlen batch (every length = Sq, so the
        # right-aligned padding is the identity) and reuse the
        # varlen-q machinery's ragged append; then restore the dense
        # [B, Sq, ...] return conventions.
        b_, sq_, hq_, _ = q.shape
        cu_q = jnp.arange(b_ + 1, dtype=jnp.int32) * sq_
        res = _kvcache_varlen_q(
            q.reshape(b_ * sq_, hq_, q.shape[-1]), k_cache, v_cache,
            k, v, qv, rotary_cos, rotary_sin, cache_seqlens,
            cache_batch_idx, cache_leftpad, page_table, cu_q,
            cu_seqlens_k_new, sq_, max_seqlen_k_new, rotary_seqlens,
            softmax_scale, causal, window_size, attention_chunk,
            softcap, rotary_interleaved, num_splits,
            return_softmax_lse, block_sizes, kv_cache_layout,
        )
        out = res[0].reshape(b_, sq_, hq_, -1)
        rest = list(res[1:])
        if return_softmax_lse:
            # packed [Hq, total_q] -> dense [B, Hq, Sq]
            rest[0] = rest[0].reshape(hq_, b_, sq_).transpose(1, 0, 2)
        return tuple([out] + rest) if rest else out
    del scheduler_metadata, pack_gqa, sm_margin, max_seqlen_q
    if num_splits == 0:
        num_splits = 1  # reference heuristic knob; Mosaic schedules
    if k_cache.dtype == jnp.int8:
        assert (
            k_cache_scale is not None and v_cache_scale is not None
        ), (
            "int8 caches need k_cache_scale/v_cache_scale "
            "(ops/kv_quant: [B, Hk, D] contiguous, [Hk, D] paged)"
        )
        assert (
            k is None
            and cache_batch_idx is None
            and q.shape[1] == 1
            and (kv_cache_layout == "bhsd" or q.shape[-1] % 128 == 0)
            and num_splits == 1
            and tuple(window_size) == (-1, -1)
            and rotary_cos is None
        ), (
            "int8 KV caches support the pure single-token decode "
            "config (bshd layout with d % 128 == 0, bhsd layout, or "
            "native page pools); append with "
            "ops/kv_quant.quantize_kv_append / quantize_pages_append "
            "before the call"
        )
        if page_table is not None:
            hq_i8 = q.shape[2]
            hk_i8 = k_cache.shape[2]
            assert (hq_i8 // hk_i8) * q.shape[1] <= 128, (
                "int8 paged decode requires the folded path "
                "(Hq/Hk * Sq <= 128)"
            )
    else:
        assert k_cache_scale is None and v_cache_scale is None
    b = q.shape[0]
    s_new = q.shape[1]
    window = None if tuple(window_size) == (-1, -1) else tuple(window_size)
    if cache_seqlens is None:
        cache_seqlens = jnp.zeros((b,), jnp.int32)
    elif isinstance(cache_seqlens, int):
        cache_seqlens = jnp.full((b,), cache_seqlens, jnp.int32)
    cache_seqlens = cache_seqlens.astype(jnp.int32)

    if rotary_cos is not None:
        assert rotary_sin is not None
        rot_base = (
            rotary_seqlens.astype(jnp.int32)
            if rotary_seqlens is not None
            else cache_seqlens
        )
        # Reference semantics (flash_attn_interface.py:734-739): k is
        # rotated at positions cache_seqlens + i; q likewise when causal
        # or local, else all q rows at position cache_seqlens.
        if causal or window is not None:
            pos_q = rot_base[:, None] + jnp.arange(s_new)[None]
        else:
            pos_q = jnp.broadcast_to(rot_base[:, None], (b, s_new))
        q = _apply_rotary_batched(
            q,
            _gather_rotary(rotary_cos, pos_q),
            _gather_rotary(rotary_sin, pos_q),
            rotary_interleaved,
        )
        if k is not None:
            pos_k = rot_base[:, None] + jnp.arange(k.shape[1])[None]
            k = _apply_rotary_batched(
                k,
                _gather_rotary(rotary_cos, pos_k),
                _gather_rotary(rotary_sin, pos_k),
                rotary_interleaved,
            )

    if page_table is not None:
        # Paged cache (reference page_table path, flash_api.cpp paged-KV
        # heuristics): caches are [num_pages, page_size, Hk, D] pools.
        assert kv_cache_layout == "bshd", (
            "page pools have their own layout; kv_cache_layout does "
            "not apply"
        )
        assert cache_batch_idx is None and cache_leftpad is None, (
            "cache_batch_idx/cache_leftpad with page_table are not "
            "supported (the page table already indirects)"
        )
        assert window is None and softcap == 0.0, (
            "window/softcap on the paged path are not supported"
        )
        assert v_cache.shape[-1] == k_cache.shape[-1], (
            "paged MLA/GLA (head_dim_v != head_dim) is served by the "
            "absorbed latent-cache kernel, ops/mla.mla_decode(page_table=)"
        )
        num_pages, page_size, hk, dd = k_cache.shape
        appended = 0
        if k is not None:
            # Scatter the new tokens into their pages (the reference's
            # in-kernel paged append, mainloop append path).
            appended = k.shape[1]
            pos = cache_seqlens[:, None] + jnp.arange(appended)[None]
            page_of = jnp.take_along_axis(
                page_table.astype(jnp.int32), pos // page_size, axis=1
            )
            slot = pos % page_size
            k_cache = k_cache.at[page_of.reshape(-1), slot.reshape(-1)].set(
                k.reshape(-1, hk, dd)
            )
            v_cache = v_cache.at[page_of.reshape(-1), slot.reshape(-1)].set(
                v.reshape(-1, hk, dd)
            )
        lengths = cache_seqlens + appended
        hq_ = q.shape[2]
        sq_ = q.shape[1]
        if dd % 128 == 0 and (hq_ // hk) * sq_ <= 128:
            # Head-folded paged decode (round 3): consumes the NATIVE
            # [pages, psz, Hk, D] pool -- full-lane contiguous page
            # streams, no pool transpose (the per-head walk below
            # relayouts the whole multi-GB pool every call and then
            # reads 64 KB per-head slabs; it sat at 12.6% of HBM peak).
            res = paged_attention_folded(
                q,
                k_cache,
                v_cache,
                lengths,
                page_table.astype(jnp.int32),
                scale=softmax_scale,
                causal=causal,
                return_lse=return_softmax_lse,
                k_scale=k_cache_scale,
                v_scale=v_cache_scale,
                int8_mma=int8_mma,
            )
        else:
            kp = jnp.transpose(k_cache, (2, 0, 1, 3))  # [Hk, pages, psz, D]
            vp = jnp.transpose(v_cache, (2, 0, 1, 3))
            res = paged_attention(
                q,
                kp,
                vp,
                lengths,
                page_table.astype(jnp.int32),
                scale=softmax_scale,
                causal=causal,
                return_lse=return_softmax_lse,
            )
        out, lse = res if return_softmax_lse else (res, None)
        result = [out]
        if return_softmax_lse:
            result.append(lse)
        if k is not None:
            result.append((k_cache, v_cache))
        return result[0] if len(result) == 1 else tuple(result)

    full_k_cache, full_v_cache = k_cache, v_cache
    if cache_batch_idx is not None:
        idx = cache_batch_idx.astype(jnp.int32)
        k_cache = jnp.take(k_cache, idx, axis=0)
        v_cache = jnp.take(v_cache, idx, axis=0)

    native = kv_cache_layout == "bhsd"
    if native:
        b_c, hk, s_max, d = k_cache.shape
    else:
        b_c, s_max, hk, d = k_cache.shape
    if k is not None:
        if native:
            kn, vn = _bshd_to_bhsd(k), _bshd_to_bhsd(v)

            def put_n(cache, new, off):
                return jax.lax.dynamic_update_slice(
                    cache, new, (jnp.int32(0), off, jnp.int32(0))
                )

            k_cache = jax.vmap(put_n)(k_cache, kn, cache_seqlens)
            v_cache = jax.vmap(put_n)(v_cache, vn, cache_seqlens)
        else:
            def put(cache, new, off):
                return jax.lax.dynamic_update_slice(
                    cache, new, (off, jnp.int32(0), jnp.int32(0))
                )

            k_cache = jax.vmap(put)(k_cache, k, cache_seqlens)
            v_cache = jax.vmap(put)(v_cache, v, cache_seqlens)
    qh = _bshd_to_bhsd(q)
    bs = block_sizes or get_block_sizes(d, q.dtype.itemsize)
    # Valid cache region: [cache_leftpad, cache_seqlens + appended). The
    # kernel receives the TOTAL valid length and applies bottom-right
    # causality (col < total - s_new + row + 1) when ``causal``.
    # NB: the appended-KV length is k's, which may differ from the query
    # length (the reference tracks seqlen_knew separately from seqlen_q).
    appended = 0 if k is None else k.shape[1]
    total = cache_seqlens + appended
    kv_low = (
        cache_leftpad.astype(jnp.int32) if cache_leftpad is not None
        else None
    )
    if num_splits > 1:
        # Split-KV decode (the reference's num_splits + combine-kernel
        # path, flash_api.cpp:437-466 + flash_fwd_combine_kernel.h): the
        # cache is chunked on the sequence axis, each split computes a
        # bounded partial attention, and the LSE merge recombines.
        # Parallelism across splits comes from the extra grid rows XLA
        # sees; useful when batch*heads underfills the chip at decode.
        assert s_max % num_splits == 0
        kh = k_cache if native else _bshd_to_bhsd(k_cache)
        vh = v_cache if native else _bshd_to_bhsd(v_cache)
        chunk = s_max // num_splits
        outs, lses = [], []
        for i in range(num_splits):
            lo = i * chunk
            # Shifted (possibly negative / oversized) bounds: the kernel
            # predicates on col_local are then exactly the global
            # predicates in every split.
            o_i, lse_i = flash_attention_masked(
                qh,
                kh[:, :, lo : lo + chunk],
                vh[:, :, lo : lo + chunk],
                kv_bound=total - lo,
                kv_low=None if kv_low is None else kv_low - lo,
                scale=softmax_scale,
                bound_causal=causal,
                window=window,
                softcap=softcap,
                block_sizes=bs,
                return_lse=True,
            )
            outs.append(o_i)
            lses.append(lse_i)
        out, lse = combine_attention(
            jnp.stack(outs), jnp.stack(lses), axis=0
        )
    elif (
        s_new == 1
        and window is None
        and (native or d % 128 == 0)
        and v_cache.shape[-1] == d
        and qv is None
    ):
        if attention_chunk:
            # Single new token at position total-1: the chunk window
            # [round_down(total-1, chunk), total) is a pure left bound,
            # so it folds into the kernel's kv_low (cache_leftpad)
            # predicate -- the packed-GQA row fold stays valid (packed
            # rows are HEADS, not positions).
            cstart = ((total - 1) // attention_chunk) * attention_chunk
            kv_low = cstart if kv_low is None else jnp.maximum(kv_low, cstart)
        # PackGQA single-token decode (the reference's pack_gqa trick,
        # pack_gqa.h, TPU-style): fold the `group` query heads of each
        # KV head into the q-ROW dimension, so the kernel grid collapses
        # from (B, 1, H, Kt) tiny steps to (B, 1, Hk, Kt) full-bandwidth
        # sweeps -- and read K/V in the CACHE layout directly
        # (flash_attention_decode): the [B,Hk,S,D] relayout of the
        # multi-GB cache ran at ~40 GB/s and dominated decode latency.
        # Bottom-right causality for one new token is exactly
        # `col < total`, so the packed rows (different HEADS, not
        # positions) all share the plain kv_bound predicate.
        b_, hq, _, dd_ = qh.shape
        group = hq // hk
        qp = qh.reshape(b_, hk, group, dd_)
        if native:
            # TPU-native cache layout [B, Hk, S, D]: head slices are
            # CONTIGUOUS, so decode streams the cache at full-burst
            # bandwidth with the regular 4D kernel path. int8 caches:
            # per-channel k scales fold into the packed q rows and v
            # scales into the output, exactly (see _decode_folded);
            # the kernel only casts after the halved DMA.
            if k_cache.dtype == jnp.int8:
                qp = (
                    qp.astype(jnp.float32)
                    * k_cache_scale[:, :, None, :]
                ).astype(qp.dtype)
            out_p, lse_p = flash_attention_masked(
                qp,
                k_cache,
                v_cache,
                kv_bound=total,
                kv_low=kv_low,
                scale=softmax_scale,
                bound_causal=False,
                softcap=softcap,
                block_sizes=block_sizes or BlockSizes(128, 2048),
                return_lse=True,
            )
            if k_cache.dtype == jnp.int8:
                out_p = (
                    out_p.astype(jnp.float32)
                    * v_cache_scale[:, :, None, :]
                ).astype(out_p.dtype)
        else:
            out_p, lse_p = flash_attention_decode(
                qp,
                k_cache,
                v_cache,
                kv_bound=total,
                kv_low=kv_low,
                scale=softmax_scale,
                softcap=softcap,
                block_sizes=block_sizes,
                k_scale=k_cache_scale,
                v_scale=v_cache_scale,
                int8_mma=int8_mma,
            )
        out = out_p.reshape(b_, hq, 1, dd_)
        lse = lse_p.reshape(b_, hq, 1)
    else:
        out, lse = flash_attention_masked(
            qh,
            k_cache if native else _bshd_to_bhsd(k_cache),
            v_cache if native else _bshd_to_bhsd(v_cache),
            kv_bound=total,
            kv_low=kv_low,
            scale=softmax_scale,
            bound_causal=causal,
            window=window,
            attention_chunk=int(attention_chunk),
            softcap=softcap,
            block_sizes=bs,
            return_lse=True,
            qv=None if qv is None else _bshd_to_bhsd(qv),
        )
    out = _bhsd_to_bshd(out)
    result = [out]
    if return_softmax_lse:
        result.append(lse)
    if k is not None:
        # JAX is functional: the updated caches are returned rather than
        # mutated in place as the reference does.
        if cache_batch_idx is not None:
            full_k_cache = full_k_cache.at[idx].set(k_cache)
            full_v_cache = full_v_cache.at[idx].set(v_cache)
            result.append((full_k_cache, full_v_cache))
        else:
            result.append((k_cache, v_cache))
    return result[0] if len(result) == 1 else tuple(result)


def _kvcache_varlen_q(
    q,
    k_cache,
    v_cache,
    k,
    v,
    qv,
    rotary_cos,
    rotary_sin,
    cache_seqlens,
    cache_batch_idx,
    cache_leftpad,
    page_table,
    cu_seqlens_q,
    cu_seqlens_k_new,
    max_seqlen_q,
    max_seqlen_k_new,
    rotary_seqlens,
    softmax_scale,
    causal,
    window_size,
    attention_chunk,
    softcap,
    rotary_interleaved,
    num_splits,
    return_softmax_lse,
    block_sizes,
    kv_cache_layout,
):
    """Varlen-q KV-cache attention via internal padding.

    Parity target: the ``cu_seqlens_q``/``cu_seqlens_k_new`` arguments
    of the reference ``flash_attn_with_kvcache`` (reference
    hopper/_internal/flash_attn_interface.py:688-861): ``q`` is packed
    ``[total_q, Hq, D]`` with per-sequence boundaries ``cu_seqlens_q``
    ``[B+1]``; new ``k``/``v`` are packed ``[total_k_new, Hk, D]`` with
    ``cu_seqlens_k_new``. The CUDA kernel walks the ragged batch
    directly; XLA wants static shapes, so here each sequence is padded
    to ``max_seqlen_q`` (REQUIRED, like the reference) / a static new-KV
    bound, the fixed-shape kvcache path runs, and the outputs are
    re-packed. Queries are padded RIGHT-ALIGNED so the kernel's
    bottom-right causal/local predicate ``col < total - Lq_pad + row + 1``
    equals the per-sequence predicate ``col < total - lq + i + 1``
    exactly at every actual query row.
    """
    assert max_seqlen_q is not None, (
        "cu_seqlens_q requires max_seqlen_q (static pad bound; the "
        "reference requires it too)"
    )
    assert k_cache.dtype != jnp.int8, (
        "varlen-q batches with int8 caches are not supported"
    )
    b = cu_seqlens_q.shape[0] - 1
    lq_max = int(max_seqlen_q)
    cu_q = cu_seqlens_q.astype(jnp.int32)
    seqlens_q = cu_q[1:] - cu_q[:-1]  # [B]
    total_q = q.shape[0]
    hq, d = q.shape[1], q.shape[2]
    if softmax_scale is None:
        softmax_scale = (
            d + (qv.shape[-1] if qv is not None else 0)
        ) ** (-0.5)
    if cache_seqlens is None:
        cache_seqlens = jnp.zeros((b,), jnp.int32)
    elif isinstance(cache_seqlens, int):
        cache_seqlens = jnp.full((b,), cache_seqlens, jnp.int32)
    cache_seqlens = cache_seqlens.astype(jnp.int32)

    # --- pad q right-aligned: row r holds query i = r - (Lq - lq). ---
    rows = jnp.arange(lq_max, dtype=jnp.int32)
    lead = (lq_max - seqlens_q)[:, None]  # [B, 1] garbage rows in front
    q_valid = rows[None, :] >= lead  # [B, Lq]
    src_q = jnp.clip(cu_q[:-1, None] + rows[None, :] - lead, 0, total_q - 1)

    def _pad_rows(packed):
        g = jnp.take(packed, src_q.reshape(-1), axis=0)
        g = g.reshape(b, lq_max, *packed.shape[1:])
        vm = q_valid.reshape(b, lq_max, *([1] * (packed.ndim - 1)))
        return jnp.where(vm, g, 0)

    q_pad = _pad_rows(q)
    qv_pad = None if qv is None else _pad_rows(qv)

    # --- pad + append new K/V (per-sequence ragged lengths). ---
    appended = jnp.zeros((b,), jnp.int32)
    if k is not None:
        assert cu_seqlens_k_new is not None
        cu_k = cu_seqlens_k_new.astype(jnp.int32)
        seqlens_k = cu_k[1:] - cu_k[:-1]
        appended = seqlens_k
        lk_max = int(
            max_seqlen_k_new if max_seqlen_k_new is not None else k.shape[0]
        )
        hk, dk = k.shape[1], k.shape[2]
        rk = jnp.arange(lk_max, dtype=jnp.int32)
        k_valid = rk[None, :] < seqlens_k[:, None]  # [B, Lk]
        src_k = jnp.clip(cu_k[:-1, None] + rk[None, :], 0, k.shape[0] - 1)

        def _pad_new(packed):
            g = jnp.take(packed, src_k.reshape(-1), axis=0)
            return g.reshape(b, lk_max, *packed.shape[1:])

        k_pad, v_pad = _pad_new(k), _pad_new(v)
        if rotary_cos is not None:
            rot_base = (
                rotary_seqlens.astype(jnp.int32)
                if rotary_seqlens is not None
                else cache_seqlens
            )
            pos_k = jnp.clip(rot_base[:, None] + rk[None, :], 0)
            k_pad = _apply_rotary_batched(
                k_pad,
                _gather_rotary(rotary_cos, pos_k),
                _gather_rotary(rotary_sin, pos_k),
                rotary_interleaved,
            )
        if page_table is not None:
            npages, psz = k_cache.shape[0], k_cache.shape[1]
            pos = cache_seqlens[:, None] + rk[None, :]
            pos_c = jnp.clip(pos, 0, page_table.shape[1] * psz - 1)
            page_of = jnp.take_along_axis(
                page_table.astype(jnp.int32), pos_c // psz, axis=1
            )
            slot = pos_c % psz
            pf, sf = page_of.reshape(-1), slot.reshape(-1)
            vm = k_valid.reshape(-1)[:, None, None]
            k_cache = k_cache.at[pf, sf].set(
                jnp.where(vm, k_pad.reshape(-1, hk, dk), k_cache[pf, sf])
            )
            v_cache = v_cache.at[pf, sf].set(
                jnp.where(
                    vm,
                    v_pad.reshape(-1, hk, v.shape[-1]),
                    v_cache[pf, sf],
                )
            )
        else:
            if cache_batch_idx is not None:
                idx = cache_batch_idx.astype(jnp.int32)
                kc_b = jnp.take(k_cache, idx, axis=0)
                vc_b = jnp.take(v_cache, idx, axis=0)
            else:
                kc_b, vc_b = k_cache, v_cache
            s_ax = 2 if kv_cache_layout == "bhsd" else 1
            s_max = kc_b.shape[s_ax]
            pos_c = jnp.clip(
                cache_seqlens[:, None] + rk[None, :], 0, s_max - 1
            )

            def _put(cache, new, p, vm_b):
                # cache [S,Hk,D] or [Hk,S,D]; new [Lk,Hk,D] bshd rows.
                if kv_cache_layout == "bhsd":
                    new_h = jnp.swapaxes(new, 0, 1)  # [Hk, Lk, D]
                    cur = cache[:, p]
                    return cache.at[:, p].set(
                        jnp.where(vm_b[None, :, None], new_h, cur)
                    )
                cur = cache[p]
                return cache.at[p].set(
                    jnp.where(vm_b[:, None, None], new, cur)
                )

            kc_b = jax.vmap(_put)(kc_b, k_pad, pos_c, k_valid)
            vc_b = jax.vmap(_put)(vc_b, v_pad, pos_c, k_valid)
            if cache_batch_idx is not None:
                k_cache = k_cache.at[idx].set(kc_b)
                v_cache = v_cache.at[idx].set(vc_b)
            else:
                k_cache, v_cache = kc_b, vc_b

    # --- rotary on q (within-sequence positions, right-aligned). ---
    if rotary_cos is not None:
        rot_base = (
            rotary_seqlens.astype(jnp.int32)
            if rotary_seqlens is not None
            else cache_seqlens
        )
        if causal or tuple(window_size) != (-1, -1):
            pos_q = jnp.clip(rot_base[:, None] + rows[None, :] - lead, 0)
        else:
            pos_q = jnp.broadcast_to(rot_base[:, None], (b, lq_max))
        q_pad = _apply_rotary_batched(
            q_pad,
            _gather_rotary(rotary_cos, pos_q),
            _gather_rotary(rotary_sin, pos_q),
            rotary_interleaved,
        )

    res = flash_attn_with_kvcache(
        q_pad,
        k_cache,
        v_cache,
        qv=qv_pad,
        cache_seqlens=cache_seqlens + appended,
        cache_batch_idx=cache_batch_idx,
        cache_leftpad=cache_leftpad,
        page_table=page_table,
        softmax_scale=softmax_scale,
        causal=causal,
        window_size=window_size,
        attention_chunk=attention_chunk,
        softcap=softcap,
        num_splits=num_splits,
        return_softmax_lse=True,
        block_sizes=block_sizes,
        kv_cache_layout=kv_cache_layout,
    )
    out_pad, lse_pad = res[0], res[1]

    # --- re-pack: token t of sequence seg sits at padded row
    #     Lq - lq[seg] + (t - cu_q[seg]). ---
    t = jnp.arange(total_q, dtype=jnp.int32)
    seg = jnp.searchsorted(cu_q[1:], t, side="right").astype(jnp.int32)
    seg = jnp.clip(seg, 0, b - 1)
    row = t - jnp.take(cu_q, seg) + lq_max - jnp.take(seqlens_q, seg)
    row = jnp.clip(row, 0, lq_max - 1)
    out = out_pad.reshape(b * lq_max, hq, out_pad.shape[-1])[
        seg * lq_max + row
    ]
    result = [out]
    if return_softmax_lse:
        # Packed LSE [Hq, total_q] (reference varlen convention).
        lse = lse_pad[seg, :, row].T
        result.append(lse)
    if k is not None:
        result.append((k_cache, v_cache))
    return result[0] if len(result) == 1 else tuple(result)


def flash_mla_with_kvcache(
    q: jax.Array,
    kv_cache: jax.Array,
    page_table: Optional[jax.Array],
    cache_seqlens: jax.Array,
    head_dim_v: int,
    *metadata,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    return_softmax_lse: bool = True,
):
    """Absorbed-MLA decode against a single latent KV cache.

    Signature parity with the external ``flash_mla_with_kvcache`` the
    reference benchmarks (benchmark_mla_decode.py:103): ``kv_cache``
    holds one latent row per token (``Hk == 1``); K is the full row and
    V its first ``head_dim_v`` channels. ``page_table`` may be None for
    a contiguous ``[B, S, 1, D]`` cache. The ``*metadata`` produced by
    the CUDA ``get_mla_metadata`` (tile-scheduler splits) has no TPU
    analog -- Mosaic schedules -- and is accepted and ignored.

    Returns ``(out, softmax_lse)`` like the reference (out only if
    ``return_softmax_lse=False``).
    """
    del metadata
    res = mla_decode(
        q,
        kv_cache,
        cache_seqlens,
        head_dim_v,
        page_table=page_table,
        scale=softmax_scale,
        causal=causal,
        return_lse=return_softmax_lse,
    )
    return res


def flash_attn_combine(
    out_partial: jax.Array,
    lse_partial: jax.Array,
    return_lse: bool = False,
):
    """LSE-weighted merge of partial attentions over KV splits.

    Parity target: ``flash_attn_combine`` -> ``fwd_combine``
    (reference flash_attn_interface.py:684-685, flash_api.cpp:1640-1719).
    ``out_partial``: [N, B, S, H, D]; ``lse_partial``: [N, B, H, S].
    """
    outs = jnp.moveaxis(out_partial, 3, 2)  # [N, B, H, S, D]
    out, lse = combine_attention(outs, lse_partial, axis=0)
    out = jnp.moveaxis(out, 1, 2)  # [B, S, H, D]
    if return_lse:
        return out, lse
    return out


def get_scheduler_metadata(
    attn_read_list: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Compacted (kv_idx, count) schedule for a skip mask.

    TPU analog of the reference's ``get_scheduler_metadata``
    (flash_attn_interface.py / flash_api.cpp:1793-1823): the
    precomputable part of kernel scheduling. Useful to amortize
    compaction when one mask drives several calls.
    """
    return compact_mask(attn_read_list)


__all__ = [
    "flash_attn_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_kvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_qkvpacked_func",
    "flash_attn_varlen_kvpacked_func",
    "flash_attn_with_kvcache",
    "flash_mla_with_kvcache",
    "flash_attn_combine",
    "get_scheduler_metadata",
]
