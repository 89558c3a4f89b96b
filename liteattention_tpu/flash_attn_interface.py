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
    flash_attention_masked,
)
from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
from liteattention_tpu.ops.paged_attention import paged_attention
from liteattention_tpu.ops.mask import compact_mask, update_mask, SkipMaskState
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
    # flash_attn_interface.py:466-567). fp8 descales and attention_chunk
    # are unsupported; scheduling hints (num_splits, pack_gqa, sm_margin)
    # are Mosaic's job on TPU; kernels are always deterministic.
    if qv is not None or attention_chunk:
        raise NotImplementedError(
            "qv-packed fp8 path / attention_chunk are not supported"
        )
    assert q_descale is None and k_descale is None and v_descale is None, (
        "fp8 descales are not supported (bf16/f32 kernels)"
    )
    del num_splits, pack_gqa, deterministic, sm_margin
    del attn_write_list
    qh = _bshd_to_bhsd(q)
    kh = _bshd_to_bhsd(k)
    vh = _bshd_to_bhsd(v)
    d = q.shape[-1]
    bs = block_sizes or get_block_sizes(d, q.dtype.itemsize)
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
            softcap=softcap,
            block_sizes=bs,
            return_lse=True,
        )
        new_mask = None
    else:
        assert not causal, "skip-masked attention is non-causal (video DiT)"
        assert window is None and softcap == 0.0 and alibi_slopes is None, (
            "skip-masked attention composes with none of window/softcap/"
            "alibi (matching the reference's lean skipable build, "
            "hopper/setup.py:47-68)"
        )
        kv_idx, count = compact_mask(attn_read_list)
        out, lse, votes = lite_flash_attention(
            qh,
            kh,
            vh,
            kv_idx,
            count,
            jnp.asarray(thr, jnp.float32),
            scale=softmax_scale,
            block_sizes=bs,
        )
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


def flash_attn_varlen_func(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    max_seqlen_q: Optional[int] = None,
    max_seqlen_k: Optional[int] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    return_softmax_lse: bool = False,
    block_sizes: Optional[BlockSizes] = None,
):
    """Variable-length attention over packed sequences.

    Parity target: ``flash_attn_varlen_func`` (reference
    hopper/_internal/flash_attn_interface.py). Inputs are packed
    ``[total_tokens, heads, head_dim]`` with ``cu_seqlens_* [B+1]``
    int32 prefix sums. On TPU the per-sequence boundaries become
    segment-id masking inside the dense kernel (the idiomatic
    replacement for the reference's varlen scheduler,
    flash_prepare_scheduler.cu); ``max_seqlen_*`` are accepted for
    signature parity but unused (the grid is static).

    Causal masking is applied per segment: positions are compared on
    the packed axis, and cross-segment pairs are masked regardless.
    """
    del max_seqlen_q, max_seqlen_k
    tq, h, d = q.shape
    tk = k.shape[0]
    # token -> segment index via prefix-sum search.
    pos_q = jnp.arange(tq)
    pos_k = jnp.arange(tk)
    seg_q = (
        jnp.searchsorted(cu_seqlens_q[1:], pos_q, side="right")
    ).astype(jnp.int32)[None]
    seg_k = (
        jnp.searchsorted(cu_seqlens_k[1:], pos_k, side="right")
    ).astype(jnp.int32)[None]
    qh = jnp.transpose(q, (1, 0, 2))[None]
    kh = jnp.transpose(k, (1, 0, 2))[None]
    vh = jnp.transpose(v, (1, 0, 2))[None]
    d_model = q.shape[-1]
    bs = block_sizes or get_block_sizes(d_model, q.dtype.itemsize)
    if causal:
        # Global-position causal + segment equality == segment-local
        # causality, provided q and k share the packing (self-attention
        # varlen). Cross-packing causal varlen is not supported.
        assert tq == tk, (
            "causal varlen requires identical q/k packing (self-attention)"
        )
        try:
            import numpy as _np

            same = bool(
                (_np.asarray(cu_seqlens_q) == _np.asarray(cu_seqlens_k))
                .all()
            )
            assert same, (
                "causal varlen requires cu_seqlens_q == cu_seqlens_k "
                "(cross-packing causality is undefined on the packed axis)"
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
        block_sizes=bs,
        return_lse=True,
    )
    out = jnp.transpose(out[0], (1, 0, 2))
    if return_softmax_lse:
        return out, lse[0]
    return out


def flash_attn_with_kvcache(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k: Optional[jax.Array] = None,
    v: Optional[jax.Array] = None,
    cache_seqlens: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    num_splits: int = 1,
    return_softmax_lse: bool = False,
    block_sizes: Optional[BlockSizes] = None,
):
    """Decode/append attention against a fixed-capacity KV cache.

    Parity target: ``flash_attn_with_kvcache`` (reference
    hopper/_internal/flash_attn_interface.py). ``k_cache``/``v_cache``
    are ``[B, S_max, Hk, D]``; optional new ``k``/``v`` ``[B, S_new, Hk,
    D]`` are written at ``cache_seqlens`` (per batch) and attended.
    Returns out (and updated caches via the return tuple -- JAX is
    functional; the reference updates in place).

    Causality is bottom-right aligned: new query i attends cache
    positions < cache_seqlens + i + 1.
    """
    if page_table is not None:
        # Paged cache (reference page_table path, flash_api.cpp paged-KV
        # heuristics): caches are [num_pages, page_size, Hk, D] page
        # pools; decode-only (one query token), no in-call append.
        assert k is None and v is None, (
            "paged flash_attn_with_kvcache does not append in-call; "
            "write new tokens into their page first"
        )
        assert q.shape[1] == 1, "paged path is decode-only (seqlen_q == 1)"
        assert cache_seqlens is not None
        kp = jnp.transpose(k_cache, (2, 0, 1, 3))  # [Hk, pages, psz, D]
        vp = jnp.transpose(v_cache, (2, 0, 1, 3))
        out = paged_attention(
            q[:, 0],
            kp,
            vp,
            cache_seqlens.astype(jnp.int32),
            page_table.astype(jnp.int32),
            scale=softmax_scale,
        )[:, None]
        return out

    b, s_max, hk, d = k_cache.shape
    s_new = q.shape[1]
    if cache_seqlens is None:
        cache_seqlens = jnp.zeros((b,), jnp.int32)
    cache_seqlens = cache_seqlens.astype(jnp.int32)
    if k is not None:
        def put(cache, new, off):
            return jax.lax.dynamic_update_slice(
                cache, new, (off, jnp.int32(0), jnp.int32(0))
            )
        k_cache = jax.vmap(put)(k_cache, k, cache_seqlens)
        v_cache = jax.vmap(put)(v_cache, v, cache_seqlens)
    qh = _bshd_to_bhsd(q)
    kh = _bshd_to_bhsd(k_cache)
    vh = _bshd_to_bhsd(v_cache)
    bs = block_sizes or get_block_sizes(d, q.dtype.itemsize)
    # Valid cache region: [0, cache_seqlens + appended). Bottom-right
    # causality aligns the last query with the last valid position, so
    # the kernel bound is total - s_new when causal (with no appended
    # k/v, queries must NOT see slots past cache_seqlens -- they hold
    # zeros/stale data).
    appended = 0 if k is None else s_new
    total = cache_seqlens + appended
    bound = total - s_new if causal else total
    if num_splits > 1:
        # Split-KV decode (the reference's num_splits + combine-kernel
        # path, flash_api.cpp:437-466 + flash_fwd_combine_kernel.h): the
        # cache is chunked on the sequence axis, each split computes a
        # bounded partial attention, and the LSE merge recombines.
        # Parallelism across splits comes from the extra grid rows XLA
        # sees; useful when batch*heads underfills the chip at decode.
        assert s_max % num_splits == 0
        chunk = s_max // num_splits
        outs, lses = [], []
        for i in range(num_splits):
            lo = i * chunk
            # Shifted (possibly negative / oversized) bound: the kernel
            # predicate col_local < (bound - lo) [+ row + 1] is then
            # exactly the global predicate in every split.
            split_bound = bound - lo
            o_i, lse_i = flash_attention_masked(
                qh,
                kh[:, :, lo : lo + chunk],
                vh[:, :, lo : lo + chunk],
                kv_bound=split_bound,
                scale=softmax_scale,
                bound_causal=causal,
                block_sizes=bs,
                return_lse=True,
            )
            outs.append(o_i)
            lses.append(lse_i)
        out, lse = combine_attention(
            jnp.stack(outs), jnp.stack(lses), axis=0
        )
    else:
        out, lse = flash_attention_masked(
            qh,
            kh,
            vh,
            kv_bound=bound,
            scale=softmax_scale,
            bound_causal=causal,
            block_sizes=bs,
            return_lse=True,
        )
    out = _bhsd_to_bshd(out)
    result = [out]
    if return_softmax_lse:
        result.append(lse)
    if k is not None:
        # JAX is functional: the updated caches are returned rather than
        # mutated in place as the reference does.
        result.append((k_cache, v_cache))
    return result[0] if len(result) == 1 else tuple(result)


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
    "flash_attn_with_kvcache",
    "flash_attn_combine",
    "get_scheduler_metadata",
]
