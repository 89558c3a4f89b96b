"""GPT-family causal transformer on the flash kernels.

TPU-native counterpart of the reference's model library
(reference flash_attn/models/gpt.py:409-1080 ``GPTModel``/``GPTLMHeadModel``
with Megatron TP + sequence parallelism, and the thin config adapters in
models/llama.py, models/opt.py, models/falcon.py, ...). One configurable
backbone covers the family: rotary or learned positions, GQA, gated or
plain MLP, pre-norm with fused residual path, parallel-block (GPT-J)
layout, tied embeddings.

The tensor-parallel form follows SURVEY.md section 2.4: instead of the
reference's ``ColumnParallelLinear`` + custom NCCL wrappers, the model
is written once and run inside ``shard_map`` with ``ParallelMHA`` /
``ParallelMLP`` (psum over the TP axis); see
:func:`liteattention_tpu.models.gpt.gpt_tp_step` for the mesh recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteattention_tpu.losses.cross_entropy import cross_entropy_loss
from liteattention_tpu.modules.block import Block
from liteattention_tpu.modules.mha import MHA, InferenceParams, ParallelMHA
from liteattention_tpu.modules.mlp import GatedMlp, Mlp, ParallelMLP
from liteattention_tpu.ops.norms import layer_norm, rms_norm


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    """Covers GPT2/GPT-J/NeoX/LLaMA/OPT/Falcon geometry knobs
    (reference models/gpt.py GPT2Config usage + per-family adapters)."""

    vocab_size: int = 50304
    max_position_embeddings: int = 2048  # 0 = rotary only
    dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    num_heads_kv: Optional[int] = None
    ffn_dim: Optional[int] = None
    rotary_emb_dim: int = 0
    rotary_emb_base: float = 10000.0
    gated_mlp: bool = False  # LLaMA-style SwiGLU
    parallel_block: bool = False  # GPT-J/NeoX fused block
    use_rms_norm: bool = False
    use_alibi: bool = False  # baichuan-13B / BTLM position scheme
    # muP knobs (reference models/btlm.py:97-100): embedding/logit
    # multipliers and 1/d attention scaling.
    embeddings_multiplier: float = 1.0
    logits_multiplier: float = 1.0
    scale_qk_dot_by_d: bool = False
    tie_embeddings: bool = True
    dropout: float = 0.0
    eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Activation rematerialization: recompute each block's activations
    # during backward instead of storing them (jax.checkpoint /
    # nn.remat), trading ~33% more FLOPs for O(num_layers) less
    # activation HBM -- the TPU-native analog of the reference training
    # stack's activation checkpointing. Ignored on inference paths
    # (inference_params) where there is no backward pass.
    remat: bool = False

    @staticmethod
    def llama(dim=512, num_layers=4, num_heads=8, vocab=32000):
        return GPTConfig(
            vocab_size=vocab,
            max_position_embeddings=0,
            dim=dim,
            num_layers=num_layers,
            num_heads=num_heads,
            ffn_dim=int(dim * 8 / 3) // 64 * 64,
            rotary_emb_dim=dim // num_heads,
            gated_mlp=True,
            use_rms_norm=True,
            tie_embeddings=False,
        )

    @staticmethod
    def tiny():
        return GPTConfig(
            vocab_size=512, max_position_embeddings=256, dim=128,
            num_layers=2, num_heads=2,
        )


class GPTModel(nn.Module):
    """Embedding + Block stack + final norm (reference GPTModel)."""

    cfg: GPTConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        inference_params: Optional[InferenceParams] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        x = nn.Embed(
            cfg.vocab_size,
            cfg.dim,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="wte",
        )(input_ids)
        if cfg.embeddings_multiplier != 1.0:
            x = x * cfg.embeddings_multiplier
        if cfg.max_position_embeddings:
            offset = (
                inference_params.seqlen_offset if inference_params else 0
            )
            pos = jnp.arange(input_ids.shape[1]) + offset
            x = x + nn.Embed(
                cfg.max_position_embeddings,
                cfg.dim,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                name="wpe",
            )(pos)[None]

        residual = None
        for i in range(cfg.num_layers):
            head_dim = cfg.dim // cfg.num_heads
            mixer = lambda: MHA(
                embed_dim=cfg.dim,
                num_heads=cfg.num_heads,
                num_heads_kv=cfg.num_heads_kv,
                causal=True,
                rotary_emb_dim=cfg.rotary_emb_dim,
                rotary_emb_base=cfg.rotary_emb_base,
                use_alibi=cfg.use_alibi,
                softmax_scale=(
                    1.0 / head_dim if cfg.scale_qk_dot_by_d else None
                ),
                dropout=cfg.dropout,
                dtype=cfg.dtype,
                name="mha",
            )
            if cfg.gated_mlp:
                mlp = lambda: GatedMlp(
                    cfg.ffn_dim or 4 * cfg.dim, dtype=cfg.dtype, name="mlp"
                )
            else:
                mlp = lambda: Mlp(
                    cfg.ffn_dim or 4 * cfg.dim, dtype=cfg.dtype, name="mlp"
                )
            block_cls = Block
            if cfg.remat and inference_params is None:
                # deterministic (arg 3) is a Python bool -> static.
                block_cls = nn.remat(Block, static_argnums=(3,))
            x, residual = block_cls(
                dim=cfg.dim,
                mixer=mixer,
                mlp=mlp,
                prenorm=True,
                parallel_block=cfg.parallel_block,
                resid_dropout1=cfg.dropout,
                resid_dropout2=cfg.dropout,
                use_rms_norm=cfg.use_rms_norm,
                residual_in_fp32=True,
                eps=cfg.eps,
                dtype=cfg.dtype,
                name=f"block_{i}",
            )(
                x,
                residual,
                deterministic,
                inference_params=inference_params,
            )

        final = (x.astype(jnp.float32) + residual).astype(cfg.dtype)
        w = self.param("ln_f_scale", nn.initializers.ones, (cfg.dim,))
        if cfg.use_rms_norm:
            return rms_norm(final, w, eps=cfg.eps)
        b = self.param("ln_f_bias", nn.initializers.zeros, (cfg.dim,))
        return layer_norm(final, w, b, eps=cfg.eps)


class GPTLMHeadModel(nn.Module):
    """GPTModel + LM head (reference GPTLMHeadModel, models/gpt.py)."""

    cfg: GPTConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        inference_params: Optional[InferenceParams] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        hidden = GPTModel(self.cfg, name="transformer")(
            input_ids, inference_params, deterministic
        )
        if self.cfg.tie_embeddings:
            wte = self.variables["params"]["transformer"]["wte"]["embedding"]
            logits = hidden @ wte.T.astype(hidden.dtype)
        else:
            logits = nn.Dense(
                self.cfg.vocab_size,
                use_bias=False,
                dtype=self.cfg.dtype,
                param_dtype=jnp.float32,
                name="lm_head",
            )(hidden)
        if self.cfg.logits_multiplier != 1.0:
            logits = logits * self.cfg.logits_multiplier
        return logits.astype(jnp.float32)


def gpt_loss_fn(model: GPTLMHeadModel, params, input_ids, labels):
    """Next-token CE loss (the training objective of the reference's
    harness, training/src/tasks/seq.py)."""
    logits = model.apply(params, input_ids)
    return cross_entropy_loss(logits[:, :-1], labels[:, 1:])


__all__ = ["GPTConfig", "GPTModel", "GPTLMHeadModel", "gpt_loss_fn"]
