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


__all__ = ["column_parallel_dense", "row_parallel_dense"]
