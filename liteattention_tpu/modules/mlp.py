"""MLP blocks (reference flash_attn/modules/mlp.py + ops/fused_dense.py).

The reference fuses GEMM + bias + GELU with cublasLt epilogues
(csrc/fused_dense_lib/). XLA performs the same fusion on TPU
automatically (bias add and GELU fuse into the matmul epilogue), so these
are plain linen modules; the TP variant composes the shard_map
column/row-parallel helpers.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Mlp(nn.Module):
    """Dense -> activation -> Dense (reference modules/mlp.py Mlp)."""

    hidden_features: int
    out_features: Optional[int] = None
    activation: Callable = nn.gelu
    bias1: bool = True
    bias2: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        y = nn.Dense(
            self.hidden_features,
            use_bias=self.bias1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc1",
        )(x)
        y = self.activation(y)
        return nn.Dense(
            out_features,
            use_bias=self.bias2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(y)


class GatedMlp(nn.Module):
    """SwiGLU/GeGLU MLP (reference modules/mlp.py GatedMlp, used by the
    LLaMA-family models)."""

    hidden_features: int
    out_features: Optional[int] = None
    activation: Callable = nn.silu
    bias1: bool = False
    bias2: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        y = nn.Dense(
            2 * self.hidden_features,
            use_bias=self.bias1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc1",
        )(x)
        gate, up = jnp.split(y, 2, axis=-1)
        return nn.Dense(
            out_features,
            use_bias=self.bias2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(self.activation(gate) * up)


class ParallelMLP(nn.Module):
    """Tensor-parallel MLP for shard_map regions (reference
    modules/mlp.py ParallelMLP / ParallelGatedMlp): column-parallel up
    projection, row-parallel down projection with psum."""

    hidden_features: int
    axis_name: str = "tp"
    activation: Callable = nn.gelu
    gated: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        tp = jax.lax.axis_size(self.axis_name)
        hidden_local = self.hidden_features // tp
        up_feats = (2 if self.gated else 1) * hidden_local
        y = nn.Dense(
            up_feats,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc1",
        )(x)
        if self.gated:
            gate, up = jnp.split(y, 2, axis=-1)
            y = self.activation(gate) * up
        else:
            y = self.activation(y)
        y = nn.Dense(
            x.shape[-1],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(y)
        return jax.lax.psum(y, self.axis_name)


__all__ = ["Mlp", "GatedMlp", "ParallelMLP"]
