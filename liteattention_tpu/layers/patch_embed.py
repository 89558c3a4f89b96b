"""Image/video patch embedding (reference flash_attn/layers/patch_embed.py).

2D patchify for ViT-style models; the 3D video form lives inline in the
Wan model (models/wan.py patchify). The reference wraps a strided Conv2d
+ optional fused projection; on TPU a reshape + dense is the same
computation and XLA maps it onto the MXU directly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PatchEmbed(nn.Module):
    """[B, H, W, C] -> [B, N_patches, embed_dim]."""

    patch_size: Tuple[int, int] = (16, 16)
    embed_dim: int = 768
    bias: bool = True
    flatten: bool = True
    norm: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ph, pw = self.patch_size
        assert h % ph == 0 and w % pw == 0, (
            f"image size ({h},{w}) not divisible by patch size ({ph},{pw})"
        )
        gh, gw = h // ph, w // pw
        x = x.reshape(b, gh, ph, gw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, ph * pw * c)
        x = nn.Dense(
            self.embed_dim,
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(x.astype(self.dtype))
        if self.norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        if not self.flatten:
            x = x.reshape(b, gh, gw, self.embed_dim)
        return x


__all__ = ["PatchEmbed"]
