"""Activation functions (reference flash_attn/ops/activations.py).

The reference carries Triton/CUDA fused activations (sqrelu, swiglu,
bias-gelu backward rules). XLA fuses all of these into the adjacent
matmul epilogues on TPU, so these are direct definitions kept for API
parity and for modules that reference them by name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sqrelu_fwd(x):
    """Squared ReLU (reference activations.sqrelu_fwd)."""
    r = jax.nn.relu(x)
    return r * r


def swiglu(gate, up):
    """SiLU(gate) * up (reference swiglu_fwd; LLaMA MLP)."""
    return jax.nn.silu(gate) * up


def bias_gelu(x, bias):
    """GELU(x + bias) (reference fused bias-gelu)."""
    return jax.nn.gelu(x + bias, approximate=True)


def gelu_approx(x):
    """Tanh-approximated GELU (the reference's default gelu)."""
    return jax.nn.gelu(x, approximate=True)


__all__ = ["sqrelu_fwd", "swiglu", "bias_gelu", "gelu_approx"]
