"""Fused norm ops: dropout + residual-add + LayerNorm / RMSNorm.

TPU-native counterpart of the reference's CUDA layer-norm library
(reference csrc/layer_norm/, 4.5k LoC of hand-fused dropout+residual+LN
kernels, exposed via flash_attn/ops/layer_norm.py and ops/rms_norm.py).
On TPU these are pure elementwise/reduction chains that XLA fuses into a
single VPU pass over the row -- a hand-written Pallas kernel would only
re-derive the same fusion -- so the value here is matching the
reference's *semantics*: the fused
``dropout(x) + residual -> norm`` pattern with optional
residual-in-fp32 and prenorm (returning the pre-norm residual sum).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def _norm_core(
    x: jax.Array,
    weight: Optional[jax.Array],
    bias: Optional[jax.Array],
    eps: float,
    rms: bool,
) -> jax.Array:
    xf = x.astype(jnp.float32)
    if rms:
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + eps)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed.astype(x.dtype)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """Plain LayerNorm (fp32 statistics, IO dtype preserved)."""
    return _norm_core(x, weight, bias, eps, rms=False)


def rms_norm(x, weight=None, eps: float = 1e-6):
    """Plain RMSNorm (reference flash_attn/ops/rms_norm.py)."""
    return _norm_core(x, weight, None, eps, rms=True)


def dropout_add_norm(
    x: jax.Array,
    residual: Optional[jax.Array],
    weight: Optional[jax.Array],
    bias: Optional[jax.Array],
    dropout_p: float = 0.0,
    rng: Optional[jax.Array] = None,
    eps: float = 1e-6,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    rms: bool = False,
    deterministic: bool = True,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Fused ``norm(dropout(x) + residual)``.

    Parity target: ``dropout_add_layer_norm`` / ``dropout_add_rms_norm``
    (reference flash_attn/ops/layer_norm.py:800,
    csrc/layer_norm/ln_api.cpp). With ``prenorm=True`` also returns the
    pre-norm sum (the residual stream), as the reference does.
    """
    h = x
    if dropout_p > 0.0 and not deterministic:
        assert rng is not None, "dropout requires an rng key"
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, x.shape)
        h = jnp.where(keep, x / (1.0 - dropout_p), 0.0).astype(x.dtype)
    if residual is not None:
        acc_dtype = jnp.float32 if residual_in_fp32 else x.dtype
        pre = (h.astype(acc_dtype) + residual.astype(acc_dtype))
    else:
        pre = h.astype(jnp.float32 if residual_in_fp32 else x.dtype)
    out = _norm_core(pre.astype(x.dtype), weight, bias, eps, rms)
    if prenorm:
        return out, pre
    return out


def dropout_add_layer_norm(*args, **kwargs):
    return dropout_add_norm(*args, rms=False, **kwargs)


def dropout_add_rms_norm(*args, **kwargs):
    return dropout_add_norm(*args, rms=True, **kwargs)


__all__ = [
    "layer_norm",
    "rms_norm",
    "dropout_add_norm",
    "dropout_add_layer_norm",
    "dropout_add_rms_norm",
]
