"""Rotary position embeddings (1D, GPT/LLaMA-style).

TPU-native counterpart of the reference's rotary layer
(reference flash_attn/layers/rotary.py, 482 LoC of Triton + autograd
wrappers). On TPU the rotation is a handful of elementwise ops that XLA
fuses into the surrounding projections, so there is no custom kernel --
just a functional API and a cache-friendly module. 3D RoPE for video
DiTs lives in :mod:`liteattention_tpu.models.wan`.

Both the GPT-NeoX convention (half-split, ``interleaved=False``) and the
GPT-J convention (even/odd interleave, ``interleaved=True``) are
supported, matching the reference's ``interleaved`` flag
(flash_attn/layers/rotary.py apply_rotary_emb).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def rotary_freqs(
    seqlen: int,
    rotary_dim: int,
    base: float = 10000.0,
    offset: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """(cos, sin) tables of shape [seqlen, rotary_dim // 2] (fp32)."""
    inv = 1.0 / (
        base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )
    t = jnp.arange(offset, offset + seqlen, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary_emb(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    interleaved: bool = False,
) -> jax.Array:
    """Rotate ``x`` [..., S, H, D] (rotary applied to the first
    ``2 * cos.shape[-1]`` features of D; the rest pass through, matching
    the reference's partial-rotary support)."""
    ro_dim = 2 * cos.shape[-1]
    d = x.shape[-1]
    xf = x[..., :ro_dim].astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * c - x2 * s
        r2 = x1 * s + x2 * c
        rotated = jnp.stack([r1, r2], axis=-1).reshape(xf.shape)
    else:
        x1, x2 = jnp.split(xf, 2, axis=-1)
        rotated = jnp.concatenate(
            [x1 * c - x2 * s, x1 * s + x2 * c], axis=-1
        )
    rotated = rotated.astype(x.dtype)
    if ro_dim < d:
        rotated = jnp.concatenate([rotated, x[..., ro_dim:]], axis=-1)
    return rotated


class RotaryEmbedding(nn.Module):
    """Stateless rotary module mirroring the reference's class surface
    (``RotaryEmbedding(dim, base, interleaved)``,
    flash_attn/layers/rotary.py:346-482)."""

    dim: int
    base: float = 10000.0
    interleaved: bool = False

    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        seqlen_offset: int = 0,
    ) -> Tuple[jax.Array, jax.Array]:
        cos, sin = rotary_freqs(
            q.shape[-3], self.dim, self.base, seqlen_offset
        )
        return (
            apply_rotary_emb(q, cos, sin, self.interleaved),
            apply_rotary_emb(k, cos, sin, self.interleaved),
        )


__all__ = ["RotaryEmbedding", "apply_rotary_emb", "rotary_freqs"]
