"""int8 KV-cache quantization for bandwidth-bound decode.

Single-token decode reads the whole cache per step and does O(d) work
per byte, so it runs at the HBM roofline (DECODE_BENCH.json: 87% of
peak for GQA). The only remaining lever is moving fewer bytes: an int8
cache halves the stream, approaching a 2x step speedup (or 2x context
at equal latency).

Numerics: scales are per-(batch, kv-head, CHANNEL), absmax over the
sequence axis -- the granularity at which dequantization folds EXACTLY
outside the kernel (see ops/flash_fwd._decode_folded: k scales multiply
q per channel, v scales multiply the output per channel), so the kernel
itself stays scale-free and the quantization error is the only error.
Per-channel absmax tracks the well-known outlier-channel structure of
KV activations.

This is the TPU analog of the capability the reference's fp8 path
gates behind Hopper hardware (hopper/setup.py:47-68 ships it compiled
out; q/k/v_descale in hopper/_internal/flash_attn_interface.py): on
this stack int8 MATMULS measured no faster than bf16 (403 vs 425 T/s,
round-3 probe), so compute-side low precision buys nothing -- the win
is all in decode bandwidth, which is where this module spends it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class QuantizedKVCache(NamedTuple):
    """int8 caches + per-(batch, kv-head, channel) dequant scales.

    ``k``/``v``: int8 ``[B, S, Hk, D]`` (reference cache layout).
    ``k_scale``/``v_scale``: f32 ``[B, Hk, D]``.
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array


def _quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    # scale [B, Hk, D] against x [B, S, Hk, D]; symmetric round-to-
    # nearest into [-127, 127] (-128 unused, symmetric like the
    # reference's fp8 e4m3 descale convention).
    q = jnp.round(x.astype(jnp.float32) / scale[:, None])
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _absmax_scale(x: jax.Array) -> jax.Array:
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)  # [B, Hk, D]
    return jnp.maximum(amax / 127.0, 1e-8)


def quantize_kv_cache(
    k_cache: jax.Array, v_cache: jax.Array
) -> QuantizedKVCache:
    """Quantize float caches ``[B, S, Hk, D]`` to int8 (e.g. once after
    prefill). Scales are per-(batch, kv-head, channel) absmax over S.

    NOTE: compute absmax over the VALID region only by passing caches
    whose padding is zero (zeros never raise the absmax).
    """
    ks = _absmax_scale(k_cache)
    vs = _absmax_scale(v_cache)
    return QuantizedKVCache(
        _quantize(k_cache, ks), _quantize(v_cache, vs), ks, vs
    )


def quantize_kv_append(
    cache: QuantizedKVCache,
    k_new: jax.Array,
    v_new: jax.Array,
    positions: jax.Array,
) -> QuantizedKVCache:
    """Append new float K/V rows ``[B, S_new, Hk, D]`` into an int8
    cache at ``positions`` ``[B]`` (the pre-append lengths), quantizing
    with the EXISTING scales (values beyond the calibrated absmax
    clamp; decode steps shift the activation distribution little, the
    same stationarity the reference's run-once fp8 descales assume).
    """
    b, s_new = k_new.shape[0], k_new.shape[1]
    ki = _quantize(k_new, cache.k_scale)
    vi = _quantize(v_new, cache.v_scale)
    idx = positions[:, None] + jnp.arange(s_new)[None]  # [B, S_new]
    bi = jnp.arange(b)[:, None]
    return QuantizedKVCache(
        cache.k.at[bi, idx].set(ki),
        cache.v.at[bi, idx].set(vi),
        cache.k_scale,
        cache.v_scale,
    )


def quantize_kv_cache_native(
    k_cache: jax.Array, v_cache: jax.Array
) -> QuantizedKVCache:
    """Quantize NATIVE-layout caches ``[B, Hk, S, D]`` (the MHA decode
    cache / ``kv_cache_layout="bhsd"``) to int8 with per-(batch,
    kv-head, channel) scales -- absmax over the sequence axis (axis 2;
    zero-filled capacity beyond the valid region never raises it).
    The returned ``QuantizedKVCache.k/v`` stay in the native layout."""

    def sc(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2)
        return jnp.maximum(amax / 127.0, 1e-8)  # [B, Hk, D]

    ks, vs = sc(k_cache), sc(v_cache)
    kq = quantize_rows_native(k_cache, ks)
    vq = quantize_rows_native(v_cache, vs)
    return QuantizedKVCache(kq, vq, ks, vs)


def quantize_rows_native(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Quantize native-layout rows ``[B, Hk, S_new, D]`` with existing
    scales ``[B, Hk, D]`` (clamped -- decode appends)."""
    q = jnp.round(x.astype(jnp.float32) / scale[:, :, None, :])
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


class QuantizedKVPages(NamedTuple):
    """int8 page pools + GLOBAL per-(kv-head, channel) scales.

    ``k``/``v``: int8 ``[num_pages, page_size, Hk, D]``.
    ``k_scale``/``v_scale``: f32 ``[Hk, D]`` -- pages are shared across
    sequences, so the scales carry no batch axis (they must hold for
    every sequence that may write the pool).
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array


def quantize_kv_pages(
    k_pages: jax.Array, v_pages: jax.Array
) -> QuantizedKVPages:
    """Quantize float page pools ``[num_pages, page_size, Hk, D]`` to
    int8 with global per-(kv-head, channel) absmax scales (zero-filled
    dead pages never raise the absmax)."""

    def sc(x):
        amax = jnp.max(
            jnp.abs(x.astype(jnp.float32)), axis=(0, 1)
        )  # [Hk, D]
        return jnp.maximum(amax / 127.0, 1e-8)

    ks, vs = sc(k_pages), sc(v_pages)

    def q8(x, s):
        q = jnp.round(x.astype(jnp.float32) / s)
        return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)

    return QuantizedKVPages(q8(k_pages, ks), q8(v_pages, vs), ks, vs)


def quantize_pages_append(
    pages: QuantizedKVPages,
    k_new: jax.Array,
    v_new: jax.Array,
    page_table: jax.Array,
    positions: jax.Array,
) -> QuantizedKVPages:
    """Scatter new float K/V rows ``[B, S_new, Hk, D]`` into the int8
    pools at ``positions`` ``[B]`` via ``page_table`` ``[B, pages]``,
    quantizing with the existing global scales (clamped)."""
    b, s_new, hk, d = k_new.shape
    page_size = pages.k.shape[1]

    def q8(x, s):
        q = jnp.round(x.astype(jnp.float32) / s)
        return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)

    ki = q8(k_new, pages.k_scale)
    vi = q8(v_new, pages.v_scale)
    pos = positions[:, None] + jnp.arange(s_new)[None]  # [B, S_new]
    page_of = jnp.take_along_axis(
        page_table.astype(jnp.int32), pos // page_size, axis=1
    )
    slot = pos % page_size
    return QuantizedKVPages(
        pages.k.at[page_of.reshape(-1), slot.reshape(-1)].set(
            ki.reshape(-1, hk, d)
        ),
        pages.v.at[page_of.reshape(-1), slot.reshape(-1)].set(
            vi.reshape(-1, hk, d)
        ),
        pages.k_scale,
        pages.v_scale,
    )


def dequantize_kv_cache(
    cache: QuantizedKVCache, dtype=jnp.bfloat16
) -> Tuple[jax.Array, jax.Array]:
    """Reference dequantization (tests / fallbacks)."""
    k = cache.k.astype(jnp.float32) * cache.k_scale[:, None]
    v = cache.v.astype(jnp.float32) * cache.v_scale[:, None]
    return k.astype(dtype), v.astype(dtype)


__all__ = [
    "QuantizedKVCache",
    "QuantizedKVPages",
    "quantize_kv_cache",
    "quantize_kv_cache_native",
    "quantize_rows_native",
    "quantize_kv_append",
    "quantize_kv_pages",
    "quantize_pages_append",
    "dequantize_kv_cache",
]
