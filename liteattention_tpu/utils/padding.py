"""Pad/unpad utilities for variable-length batches.

TPU-native counterpart of the reference's ``bert_padding.py``
(reference flash_attn/bert_padding.py, duplicated at
hopper/utils/padding.py): convert between padded ``[B, S, ...]`` batches
and packed ``[total_tokens, ...]`` form plus cu_seqlens metadata.

TPU caveat baked into the API: XLA wants static shapes, so ``unpad_input``
takes (and returns) a **static** ``max_tokens`` capacity -- the packed
array is padded to that capacity and consumers mask with
``total_tokens``. This replaces the reference's dynamic
``index_first_axis`` gather with a fixed-size gather.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def index_first_axis(x: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather rows of ``x`` (reference bert_padding.IndexFirstAxis)."""
    return jnp.take(x, indices, axis=0)


def unpad_input(
    hidden_states: jax.Array,
    attention_mask: jax.Array,
    max_tokens: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Pack valid tokens of ``[B, S, ...]`` into ``[max_tokens, ...]``.

    Returns (packed, indices, cu_seqlens [B+1] int32, total_tokens
    scalar). Mirrors reference ``unpad_input`` -> (hidden, indices,
    cu_seqlens, max_seqlen) with the static-capacity twist above.
    """
    b, s = attention_mask.shape
    if max_tokens is None:
        max_tokens = b * s
    mask = attention_mask.astype(bool).reshape(-1)
    seqlens = attention_mask.astype(jnp.int32).sum(-1)
    cu_seqlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens).astype(jnp.int32)]
    )
    total = cu_seqlens[-1]
    # Stable compaction: valid positions first, in order.
    order = jnp.argsort(~mask, stable=True).astype(jnp.int32)
    indices = order[:max_tokens]
    flat = hidden_states.reshape(b * s, *hidden_states.shape[2:])
    packed = index_first_axis(flat, indices)
    # Zero the tail beyond total (gathered garbage from padded slots).
    pos = jnp.arange(max_tokens)
    valid = (pos < total).reshape((max_tokens,) + (1,) * (packed.ndim - 1))
    packed = jnp.where(valid, packed, 0)
    return packed, indices, cu_seqlens, total


def pad_input(
    packed: jax.Array,
    indices: jax.Array,
    batch: int,
    seqlen: int,
) -> jax.Array:
    """Inverse of :func:`unpad_input` (reference ``pad_input``)."""
    flat = jnp.zeros((batch * seqlen, *packed.shape[1:]), packed.dtype)
    flat = flat.at[indices].set(packed)
    return flat.reshape(batch, seqlen, *packed.shape[1:])


def unpad_input_for_concatenated_sequences(
    hidden_states: jax.Array,
    attention_mask_in_length: jax.Array,
    max_tokens: Optional[int] = None,
    max_seqs: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Unpad a batch of CONCATENATED short samples (packed SFT rows).

    Reference ``bert_padding.unpad_input_for_concatenated_sequences``:
    ``attention_mask_in_length[b, i]`` holds the length of the i-th
    sample concatenated into row ``b`` (0 = none); rows are valid for
    their first ``sum_i length_i`` positions. Returns
    ``(packed, indices, cu_seqlens, max_seqlen_in_batch)`` where
    ``cu_seqlens`` delimits every SUB-sample for
    ``flash_attn_varlen_func``.

    TPU static-shape twist (see the module docstring): ``packed`` has
    static capacity ``max_tokens`` and ``cu_seqlens`` static length
    ``max_seqs + 1`` -- entries past the real sub-sample count repeat
    the final cumulative total, i.e. phantom ZERO-length segments,
    which the varlen kernels treat as empty. ``max_seqlen_in_batch``
    is a traced scalar (static-shape consumers should pass their own
    bound).
    """
    b, s = attention_mask_in_length.shape
    lengths = attention_mask_in_length.astype(jnp.int32)
    row_total = lengths.sum(-1)  # [B] valid tokens per row
    mask2d = (
        jnp.arange(s, dtype=jnp.int32)[None, :] < row_total[:, None]
    )
    packed, indices, _, _ = unpad_input(
        hidden_states, mask2d, max_tokens
    )
    # Compact the nonzero sub-sample lengths in row-major order.
    if max_seqs is None:
        max_seqs = b * s
    flat_len = lengths.reshape(-1)
    is_seq = flat_len > 0
    nseqs = is_seq.sum()
    order = jnp.argsort(~is_seq, stable=True).astype(jnp.int32)
    seqlens = jnp.take(flat_len, order[:max_seqs])
    seqlens = jnp.where(
        jnp.arange(max_seqs, dtype=jnp.int32) < nseqs, seqlens, 0
    )
    cu_seqlens = jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(seqlens).astype(jnp.int32),
        ]
    )
    max_seqlen_in_batch = seqlens.max()
    return packed, indices, cu_seqlens, max_seqlen_in_batch


__all__ = [
    "pad_input",
    "unpad_input",
    "unpad_input_for_concatenated_sequences",
    "index_first_axis",
]
