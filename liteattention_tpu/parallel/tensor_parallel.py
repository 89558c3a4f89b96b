"""Tensor-parallel building blocks (Megatron-style) for shard_map code.

TPU-native counterparts of the reference's ``ColumnParallelLinear`` /
``RowParallelLinear`` and its fused TP dense layer
(reference flash_attn/ops/fused_dense.py:369-520,
flash_attn/utils/distributed.py:18-101). There is no custom NCCL wrapper
layer to port: inside ``shard_map`` these are plain matmuls plus
``jax.lax`` collectives, and XLA fuses/overlaps them over ICI
(SURVEY.md section 2.4).

These helpers operate on *local shards* inside a ``shard_map`` region:

* column-parallel: weight sharded on the output dim; output stays
  feature-sharded (no comms).
* row-parallel: weight sharded on the input dim; the partial product is
  summed with ``psum`` (or ``psum_scatter`` for sequence parallelism --
  the Megatron-SP all-gather/reduce-scatter pair the reference implements
  at flash_attn/utils/distributed.py:49-101).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def column_parallel_dense(
    x: jax.Array,
    w_local: jax.Array,
    b_local: Optional[jax.Array] = None,
    gather_input_axis: Optional[str] = None,
) -> jax.Array:
    """y_local = x @ W_local (+ b_local); output feature-sharded.

    With ``gather_input_axis`` set, the input is all-gathered over that
    axis first (Megatron sequence parallelism: activations arrive
    sequence-sharded, reference models/gpt.py:264-305).
    """
    if gather_input_axis is not None:
        x = jax.lax.all_gather(
            x, gather_input_axis, axis=x.ndim - 2, tiled=True
        )
    y = jnp.dot(x, w_local)
    if b_local is not None:
        y = y + b_local
    return y


def row_parallel_dense(
    x_local: jax.Array,
    w_local: jax.Array,
    b: Optional[jax.Array] = None,
    axis_name: str = "tp",
    scatter_output: bool = False,
) -> jax.Array:
    """y = sum_over_shards(x_local @ W_local) (+ b).

    ``scatter_output`` uses ``psum_scatter`` over the sequence dim instead
    of ``psum`` (returns sequence-sharded activations -- Megatron SP).
    """
    partial = jnp.dot(x_local, w_local)
    if scatter_output:
        y = jax.lax.psum_scatter(
            partial, axis_name, scatter_dimension=partial.ndim - 2,
            tiled=True,
        )
    else:
        y = jax.lax.psum(partial, axis_name)
    if b is not None:
        y = y + b
    return y


def vocab_parallel_embedding(
    ids: jax.Array, emb_local: jax.Array, axis_name: str = "tp"
) -> jax.Array:
    """Embedding lookup with the VOCAB dim sharded over ``axis_name``.

    Each shard owns rows ``[rank*V_loc, (rank+1)*V_loc)``: out-of-range
    ids look up row 0 and are zeroed, and a ``psum`` combines the single
    nonzero shard -- the reference's masked-lookup + all-reduce recipe
    (flash_attn/modules/embedding.py:114-143) as a shard_map-local
    function. Replicated output (full embed dim).
    """
    rank = jax.lax.axis_index(axis_name)
    v_loc = emb_local.shape[0]
    local = ids - rank * v_loc
    ok = jnp.logical_and(local >= 0, local < v_loc)
    emb = jnp.take(emb_local, jnp.where(ok, local, 0), axis=0)
    emb = jnp.where(ok[..., None], emb, 0.0)
    return jax.lax.psum(emb, axis_name)


def column_parallel_embedding(
    ids: jax.Array, emb_local: jax.Array
) -> jax.Array:
    """Embedding lookup with the EMBED dim sharded (each shard holds all
    vocab rows but a feature slice). No comms; output feature-sharded
    (reference ``ColumnParallelEmbedding``, embedding.py:146-157)."""
    return jnp.take(emb_local, ids, axis=0)


def parallel_gpt2_embeddings(
    input_ids: jax.Array,
    word_emb_local: jax.Array,
    pos_emb_local: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    axis_name: str = "tp",
    sequence_parallel: bool = False,
) -> jax.Array:
    """Word (vocab-parallel) + position (column-parallel) embeddings with
    ONE combining collective.

    The reference's trick (``ParallelGPT2Embeddings.forward``,
    embedding.py:160-216): each rank adds its position-embedding feature
    slice into its own feature block of the *partial* word embedding
    BEFORE the reduce, so the all-reduce (or reduce-scatter under
    Megatron sequence parallelism) both sums the vocab shards and
    scatters the position features into place.

    Args:
      input_ids: int ``[B, S]``.
      word_emb_local: ``[V_loc, D]`` vocab shard.
      pos_emb_local: optional ``[P, D_loc]`` feature shard.
      sequence_parallel: reduce-scatter over the sequence dim instead of
        all-reduce (returns ``[B, S/tp, D]``).
    """
    rank = jax.lax.axis_index(axis_name)
    v_loc = word_emb_local.shape[0]
    local = input_ids - rank * v_loc
    ok = jnp.logical_and(local >= 0, local < v_loc)
    emb = jnp.take(word_emb_local, jnp.where(ok, local, 0), axis=0)
    emb = jnp.where(ok[..., None], emb, 0.0)
    if pos_emb_local is not None:
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None]
        pe = jnp.take(
            pos_emb_local, position_ids, axis=0
        )  # broadcastable [*, S, D_loc]
        d_loc = pos_emb_local.shape[1]
        pe = jnp.broadcast_to(
            pe, (emb.shape[0], emb.shape[1], d_loc)
        ).astype(emb.dtype)
        sl = jax.lax.dynamic_slice_in_dim(
            emb, rank * d_loc, d_loc, axis=emb.ndim - 1
        )
        emb = jax.lax.dynamic_update_slice_in_dim(
            emb, sl + pe, rank * d_loc, axis=emb.ndim - 1
        )
    if sequence_parallel:
        return jax.lax.psum_scatter(
            emb, axis_name, scatter_dimension=emb.ndim - 2, tiled=True
        )
    return jax.lax.psum(emb, axis_name)


def vocab_parallel_logits(
    x: jax.Array, word_emb_local: jax.Array
) -> jax.Array:
    """Tied LM head against the vocab-sharded embedding: local logits
    shard ``[.., V_loc]`` (NO collective -- feed
    :func:`liteattention_tpu.losses.cross_entropy.parallel_cross_entropy_loss`,
    which reduces in lse space). Reference pairing:
    ``ColumnParallelLinear`` lm_head + sharded CE
    (flash_attn/models/gpt.py:477-495, ops/triton/cross_entropy.py)."""
    return jnp.dot(x, word_emb_local.T)


__all__ = [
    "column_parallel_dense",
    "row_parallel_dense",
    "vocab_parallel_embedding",
    "column_parallel_embedding",
    "parallel_gpt2_embeddings",
    "vocab_parallel_logits",
]
