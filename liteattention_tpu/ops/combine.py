"""LSE-weighted combination of partial attention outputs.

TPU-native replacement for the reference's split-KV combine kernel
(``flash_attn_combine`` -> ``fwd_combine`` op -> flash_fwd_combine_kernel.h;
reference: hopper/_internal/flash_attn_interface.py:684-685,
hopper/_internal/cpp/flash_api.cpp:1640-1719).

On TPU this is a handful of elementwise ops + one weighted sum that XLA
fuses into a single HBM pass -- no custom kernel is warranted (the arrays
are [N, B, H, S, D] reads, one [B, H, S, D] write; there is no reuse for a
Pallas kernel to exploit). It is the building block of sequence-parallel
attention (reference README.md:199-250): each KV-split rank computes a
partial (out, lse) and the results merge exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def combine_attention(
    partial_out: jax.Array,
    partial_lse: jax.Array,
    axis: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Merge partial attentions computed over disjoint KV splits.

    Args:
      partial_out: [..., N, ..., S, D] partial outputs stacked on ``axis``
        (each already normalized by its local softmax sum).
      partial_lse: matching natural-log LSEs, same shape minus D.
      axis: the split axis.

    Returns:
      (out, lse) with the split axis reduced; numerically identical to
      attention over the concatenated KV (online-softmax algebra, same as
      the reference's combine kernel).
    """
    lse32 = partial_lse.astype(jnp.float32)
    m = jnp.max(lse32, axis=axis, keepdims=True)
    # Guard fully-masked splits (lse == -inf everywhere).
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(lse32 - m_safe)
    w_sum = jnp.sum(w, axis=axis, keepdims=True)
    # Rows where every split is empty (w_sum == 0, e.g. num_splits decode
    # with cache_seqlens == 0) follow the kernels' empty-row convention:
    # zero output, -inf lse (reference epilogue store_zero,
    # flash_fwd_kernel_sm90.h:557-567) -- not 0/0 NaN.
    denom = jnp.maximum(w_sum, jnp.finfo(jnp.float32).tiny)
    out = jnp.sum(
        partial_out.astype(jnp.float32) * jnp.expand_dims(w, -1), axis=axis
    ) / jnp.squeeze(jnp.expand_dims(denom, -1), axis)
    lse = jnp.squeeze(
        jnp.where(w_sum == 0.0, -jnp.inf, m_safe + jnp.log(denom)), axis
    )
    return out.astype(partial_out.dtype), lse


def combine_attention_psum(
    out_local: jax.Array,
    lse_local: jax.Array,
    axis_name: str,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-device combine for use inside ``shard_map``.

    Merges per-shard partial attention over mesh axis ``axis_name`` using
    ``pmax`` + ``psum`` collectives over ICI -- the multi-chip form of
    :func:`combine_attention` (replaces the reference's user-side NCCL
    gather + ``flash_attn_combine``, README.md:199-250).
    """
    lse32 = lse_local.astype(jnp.float32)
    m = jax.lax.pmax(lse32, axis_name)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(lse32 - m_safe)
    w_sum = jax.lax.psum(w, axis_name)
    out = jax.lax.psum(out_local.astype(jnp.float32) * w[..., None], axis_name)
    # Same all-shards-empty guard as combine_attention: 0 out, -inf lse.
    denom = jnp.maximum(w_sum, jnp.finfo(jnp.float32).tiny)
    out = out / denom[..., None]
    lse = jnp.where(w_sum == 0.0, -jnp.inf, m_safe + jnp.log(denom))
    return out.astype(out_local.dtype), lse


__all__ = ["combine_attention", "combine_attention_psum"]
