"""Transformer residual block (reference flash_attn/modules/block.py).

Supports the reference's prenorm/postnorm layouts and the fused
dropout-add-norm residual path (``Block`` wraps mixer + MLP with
LayerNorm/RMSNorm; reference block.py:397). The "parallel block"
(attention and MLP from the same normed input, GPT-J/NeoX style,
reference ParallelBlock) is a flag here rather than a second class.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteattention_tpu.modules.mha import MHA
from liteattention_tpu.modules.mlp import Mlp
from liteattention_tpu.ops.norms import dropout_add_norm


class Block(nn.Module):
    """Pre-/post-norm residual block: norm -> mixer -> norm -> MLP."""

    dim: int
    mixer: Optional[Callable[[], nn.Module]] = None
    mlp: Optional[Callable[[], nn.Module]] = None
    prenorm: bool = True
    parallel_block: bool = False
    # GPT-NeoX uses SEPARATE norms for the parallel attention and MLP
    # branches (HF use_parallel_residual: attn(ln1(x)) + mlp(ln2(x)));
    # Falcon-7B ties them (reference block.py ParallelBlock tied_norm /
    # falcon.py parallel_block_tied_norm inference).
    parallel_block_tied_norm: bool = True
    resid_dropout1: float = 0.0
    resid_dropout2: float = 0.0
    use_rms_norm: bool = False
    residual_in_fp32: bool = False
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    def _norm_params(self, name):
        w = self.param(f"{name}_scale", nn.initializers.ones, (self.dim,))
        b = (
            None
            if self.use_rms_norm
            else self.param(f"{name}_bias", nn.initializers.zeros, (self.dim,))
        )
        return w, b

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        residual: Optional[jax.Array] = None,
        deterministic: bool = True,
        **mixer_kwargs,
    ):
        mixer = (self.mixer or (lambda: MHA(self.dim, 8, dtype=self.dtype)))()
        mlp = (self.mlp or (lambda: Mlp(4 * self.dim, dtype=self.dtype)))()
        need_rng = (
            self.resid_dropout1 > 0 or self.resid_dropout2 > 0
        ) and not deterministic
        if need_rng:
            rng1, rng2 = jax.random.split(self.make_rng("dropout"))
        else:
            rng1 = rng2 = None

        if not self.prenorm:
            # Post-norm (BERT-style): residual add then norm.
            w1, b1 = self._norm_params("norm1")
            h = mixer(hidden_states, deterministic=deterministic, **mixer_kwargs)
            h = dropout_add_norm(
                h, hidden_states, w1, b1, self.resid_dropout1, rng1,
                self.eps, rms=self.use_rms_norm, deterministic=deterministic,
            )
            w2, b2 = self._norm_params("norm2")
            m = mlp(h)
            return dropout_add_norm(
                m, h, w2, b2, self.resid_dropout2, rng2, self.eps,
                rms=self.use_rms_norm, deterministic=deterministic,
            )

        # Pre-norm: the residual stream threads through in (optionally)
        # fp32, exactly the reference's fused prenorm path.
        w1, b1 = self._norm_params("norm1")
        residual_in = residual
        normed, residual = dropout_add_norm(
            hidden_states,
            residual,
            w1,
            b1,
            self.resid_dropout1,
            rng1,
            self.eps,
            prenorm=True,
            residual_in_fp32=self.residual_in_fp32,
            rms=self.use_rms_norm,
            deterministic=deterministic,
        )
        attn_out = mixer(normed, deterministic=deterministic, **mixer_kwargs)
        if self.parallel_block:
            if self.parallel_block_tied_norm:
                mlp_in = normed
            else:
                # Untied norms: re-norm the SAME pre-attention residual
                # stream with the second weight set (identical add path,
                # so dropout_add_norm reproduces `residual` exactly).
                w2, b2 = self._norm_params("norm2")
                mlp_in, _ = dropout_add_norm(
                    hidden_states, residual_in, w2, b2,
                    self.resid_dropout1, rng1, self.eps, prenorm=True,
                    residual_in_fp32=self.residual_in_fp32,
                    rms=self.use_rms_norm, deterministic=deterministic,
                )
            mlp_out = mlp(mlp_in)
            return attn_out + mlp_out, residual
        w2, b2 = self._norm_params("norm2")
        normed2, residual = dropout_add_norm(
            attn_out,
            residual,
            w2,
            b2,
            self.resid_dropout2,
            rng2,
            self.eps,
            prenorm=True,
            residual_in_fp32=self.residual_in_fp32,
            rms=self.use_rms_norm,
            deterministic=deterministic,
        )
        return mlp(normed2), residual


__all__ = ["Block"]
