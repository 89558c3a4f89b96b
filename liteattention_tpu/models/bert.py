"""BERT-family encoder on the flash kernels.

TPU-native counterpart of the reference's BERT port
(reference flash_attn/models/bert.py:764: embeddings + post-norm encoder
+ pooler + MLM/NSP heads, with the unpad/pad varlen path through
bert_padding). Padding here rides the kernel's per-batch ``kv_bound``
masking (right-padded batches), which is differentiable -- no
unpad/repad round trip needed on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteattention_tpu.ops.flash_fwd import flash_attention_masked
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    eps: float = 1e-12
    dtype: Any = jnp.bfloat16
    block_sizes: Optional[BlockSizes] = None

    @staticmethod
    def tiny():
        return BertConfig(
            vocab_size=256, dim=64, num_layers=2, num_heads=2, ffn_dim=128,
            max_position_embeddings=128,
        )


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, seqlens):
        cfg = self.cfg
        d = cfg.dim // cfg.num_heads
        qkv = nn.Dense(
            3 * cfg.dim, dtype=cfg.dtype, param_dtype=jnp.float32,
            name="Wqkv",
        )(x)
        b, s, _ = x.shape
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_bhsd = lambda t: t.reshape(b, s, cfg.num_heads, d).transpose(
            0, 2, 1, 3
        )
        bs = cfg.block_sizes or get_block_sizes(d, 2)
        out = flash_attention_masked(
            to_bhsd(q), to_bhsd(k), to_bhsd(v), kv_bound=seqlens,
            block_sizes=bs,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.dim)
        return nn.Dense(
            cfg.dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="out"
        )(out)


class BertLayer(nn.Module):
    """Post-norm encoder layer (BERT-style, reference Block prenorm=False)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x, seqlens):
        cfg = self.cfg
        h = BertSelfAttention(cfg, name="attention")(x, seqlens)
        x = nn.LayerNorm(epsilon=cfg.eps, dtype=cfg.dtype, name="norm1")(
            x + h
        )
        m = nn.Dense(
            cfg.ffn_dim, dtype=cfg.dtype, param_dtype=jnp.float32,
            name="ffn_up",
        )(x)
        m = nn.gelu(m, approximate=True)
        m = nn.Dense(
            cfg.dim, dtype=cfg.dtype, param_dtype=jnp.float32,
            name="ffn_down",
        )(m)
        return nn.LayerNorm(epsilon=cfg.eps, dtype=cfg.dtype, name="norm2")(
            x + m
        )


class BertModel(nn.Module):
    """Embeddings + encoder + pooler (reference BertModel)."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        b, s = input_ids.shape
        seqlens = (
            attention_mask.astype(jnp.int32).sum(-1)
            if attention_mask is not None
            else jnp.full((b,), s, jnp.int32)
        )
        x = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="word_embeddings",
        )(input_ids)
        x = x + nn.Embed(
            cfg.max_position_embeddings, cfg.dim, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="position_embeddings",
        )(jnp.arange(s))[None]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + nn.Embed(
            cfg.type_vocab_size, cfg.dim, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="token_type_embeddings",
        )(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.eps, dtype=cfg.dtype, name="emb_norm")(x)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, seqlens)
        pooled = nn.tanh(
            nn.Dense(
                cfg.dim, dtype=cfg.dtype, param_dtype=jnp.float32,
                name="pooler",
            )(x[:, 0])
        )
        return x, pooled


class BertForPreTraining(nn.Module):
    """MLM + NSP heads (reference BertForPreTraining)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        hidden, pooled = BertModel(self.cfg, name="bert")(
            input_ids, attention_mask, token_type_ids
        )
        h = nn.Dense(
            self.cfg.dim, dtype=self.cfg.dtype, param_dtype=jnp.float32,
            name="mlm_transform",
        )(hidden)
        h = nn.gelu(h, approximate=True)
        h = nn.LayerNorm(
            epsilon=self.cfg.eps, dtype=self.cfg.dtype, name="mlm_norm"
        )(h)
        wte = self.variables["params"]["bert"]["word_embeddings"]["embedding"]
        mlm_logits = (h @ wte.T.astype(h.dtype)).astype(jnp.float32)
        nsp_logits = nn.Dense(
            2, dtype=self.cfg.dtype, param_dtype=jnp.float32, name="nsp"
        )(pooled).astype(jnp.float32)
        return mlm_logits, nsp_logits


__all__ = ["BertConfig", "BertModel", "BertForPreTraining"]
