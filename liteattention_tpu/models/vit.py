"""Vision Transformer on the flash kernels.

TPU-native counterpart of the reference's ViT port
(reference flash_attn/models/vit.py:373: timm-style
``VisionTransformer`` with patch embedding, cls token, pre-norm blocks
over the fused MHA/MLP, classification head).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteattention_tpu.layers.patch_embed import PatchEmbed
from liteattention_tpu.modules.block import Block
from liteattention_tpu.modules.mha import MHA
from liteattention_tpu.modules.mlp import Mlp
from liteattention_tpu.ops.norms import layer_norm
from liteattention_tpu.ops.tile_sizes import BlockSizes


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    num_classes: int = 1000
    dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    use_cls_token: bool = True
    dtype: Any = jnp.bfloat16
    block_sizes: Optional[BlockSizes] = None

    @staticmethod
    def tiny():
        return ViTConfig(
            image_size=(32, 32), patch_size=(8, 8), num_classes=10,
            dim=64, num_layers=2, num_heads=2, ffn_dim=128,
            block_sizes=BlockSizes(128, 128),
        )


class VisionTransformer(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = PatchEmbed(
            patch_size=cfg.patch_size, embed_dim=cfg.dim, dtype=cfg.dtype,
            name="patch_embed",
        )(images)
        b, n, _ = x.shape
        if cfg.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.dim),
                jnp.float32,
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.dim)), x],
                axis=1,
            )
            n += 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n, cfg.dim),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)

        residual = None
        for i in range(cfg.num_layers):
            mixer = lambda: MHA(
                embed_dim=cfg.dim, num_heads=cfg.num_heads,
                dtype=cfg.dtype, block_sizes=cfg.block_sizes, name="mha",
            )
            mlp = lambda: Mlp(cfg.ffn_dim, dtype=cfg.dtype, name="mlp")
            x, residual = Block(
                dim=cfg.dim, mixer=mixer, mlp=mlp, prenorm=True,
                residual_in_fp32=True, dtype=cfg.dtype, name=f"block_{i}",
            )(x, residual)
        x = (x.astype(jnp.float32) + residual).astype(cfg.dtype)
        w = self.param("norm_scale", nn.initializers.ones, (cfg.dim,))
        b_ = self.param("norm_bias", nn.initializers.zeros, (cfg.dim,))
        x = layer_norm(x, w, b_)
        feat = x[:, 0] if cfg.use_cls_token else x.mean(axis=1)
        return nn.Dense(
            cfg.num_classes, dtype=jnp.float32, name="head"
        )(feat.astype(jnp.float32))


__all__ = ["ViTConfig", "VisionTransformer"]
