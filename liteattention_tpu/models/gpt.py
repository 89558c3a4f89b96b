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
:func:`liteattention_tpu.models.gpt.gpt_tp_apply` for the mesh-native
TP forward (vocab-parallel embeddings + tied vocab-parallel LM head).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteattention_tpu.losses.cross_entropy import cross_entropy_loss
from liteattention_tpu.modules.block import Block
from liteattention_tpu.ops.flash_fwd import flash_attention
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
    # GPT-J uses the even/odd interleaved rotary convention; NeoX (and
    # LLaMA) the half-split one (reference layers/rotary.py interleaved).
    rotary_emb_interleaved: bool = False
    # OPT uses ReLU in the MLP (reference models/opt.py).
    mlp_relu: bool = False
    # OPT-350m layout (reference models/opt.py
    # opt_config_to_gpt2_config + modules/embedding.py:29-55): token
    # embeddings live at word_embed_proj_dim and are projected in/out
    # of the hidden size by bias-free linears; the tied LM head reads
    # the proj-dim table.
    word_embed_proj_dim: Optional[int] = None
    # do_layer_norm_before=False (OPT-350m): post-norm blocks, and NO
    # final layer norm (reference gpt.py creates ln_f only when
    # prenorm).
    prenorm: bool = True
    # GPT-J's untied lm_head carries a bias (reference models/gptj.py).
    lm_head_bias: bool = False
    gated_mlp: bool = False  # LLaMA-style SwiGLU
    # Mixture-of-Experts FFN (beyond the reference, modules/moe.py):
    # >0 replaces the dense MLP with moe_experts experts, top-k routed
    # with a fixed capacity; the Switch load-balance aux loss is sown
    # under the "losses" collection ("moe_aux" per block).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    parallel_block: bool = False  # GPT-J/NeoX fused block
    # NeoX keeps separate norms for the parallel attn/MLP branches
    # (HF use_parallel_residual); Falcon-7B ties them.
    parallel_block_tied_norm: bool = True
    attn_bias: bool = True  # QKV/out-proj biases (False: Falcon/LLaMA)
    mlp_bias: bool = True
    # HF "gelu" is the exact erf form; GPT-2's gelu_new is the tanh
    # approximation (flax default).
    mlp_gelu_exact: bool = False
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
            cfg.word_embed_proj_dim or cfg.dim,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="wte",
        )(input_ids)
        if cfg.embeddings_multiplier != 1.0:
            x = x * cfg.embeddings_multiplier
        if cfg.word_embed_proj_dim:
            # OPT-350m: bias-free projection into the hidden size,
            # BEFORE the (hidden-sized) position table is added.
            x = nn.Dense(
                cfg.dim,
                use_bias=False,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                name="project_in",
            )(x)
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
                qkv_proj_bias=cfg.attn_bias,
                out_proj_bias=cfg.attn_bias,
                rotary_emb_dim=cfg.rotary_emb_dim,
                rotary_emb_base=cfg.rotary_emb_base,
                rotary_emb_interleaved=cfg.rotary_emb_interleaved,
                use_alibi=cfg.use_alibi,
                softmax_scale=(
                    1.0 / head_dim if cfg.scale_qk_dot_by_d else None
                ),
                dropout=cfg.dropout,
                dtype=cfg.dtype,
                name="mha",
            )
            if cfg.mlp_relu:
                act = nn.relu
            elif cfg.mlp_gelu_exact:
                act = functools.partial(nn.gelu, approximate=False)
            else:
                act = nn.gelu
            if cfg.moe_experts > 0:
                from liteattention_tpu.modules.moe import MoEMlp

                mlp = lambda: MoEMlp(
                    dim=cfg.dim,
                    hidden=cfg.ffn_dim or 4 * cfg.dim,
                    num_experts=cfg.moe_experts,
                    top_k=cfg.moe_top_k,
                    capacity_factor=cfg.moe_capacity_factor,
                    dtype=cfg.dtype,
                    name="mlp",
                )
            elif cfg.gated_mlp:
                mlp = lambda: GatedMlp(
                    cfg.ffn_dim or 4 * cfg.dim,
                    bias1=cfg.mlp_bias,
                    bias2=cfg.mlp_bias,
                    dtype=cfg.dtype,
                    name="mlp",
                )
            else:
                mlp = lambda: Mlp(
                    cfg.ffn_dim or 4 * cfg.dim,
                    activation=act,
                    bias1=cfg.mlp_bias,
                    bias2=cfg.mlp_bias,
                    dtype=cfg.dtype,
                    name="mlp",
                )
            block_cls = Block
            if cfg.remat and inference_params is None:
                # deterministic (arg 3) is a Python bool -> static.
                block_cls = nn.remat(Block, static_argnums=(3,))
            blk = block_cls(
                dim=cfg.dim,
                mixer=mixer,
                mlp=mlp,
                prenorm=cfg.prenorm,
                parallel_block=cfg.parallel_block,
                parallel_block_tied_norm=cfg.parallel_block_tied_norm,
                resid_dropout1=cfg.dropout,
                resid_dropout2=cfg.dropout,
                use_rms_norm=cfg.use_rms_norm,
                residual_in_fp32=True,
                eps=cfg.eps,
                dtype=cfg.dtype,
                name=f"block_{i}",
            )
            if cfg.prenorm:
                x, residual = blk(
                    x,
                    residual,
                    deterministic,
                    inference_params=inference_params,
                )
            else:
                # Post-norm (OPT do_layer_norm_before=False): the norm
                # closes each residual add, no separate stream.
                x = blk(
                    x,
                    None,
                    deterministic,
                    inference_params=inference_params,
                )

        if not cfg.prenorm:
            # Reference gpt.py creates ln_f only when prenorm; the
            # post-norm stack ends normalized already.
            return x
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
        if self.cfg.word_embed_proj_dim:
            # OPT-350m: bias-free projection back to the embedding dim
            # before the (proj-dim) tied head (reference
            # gpt.py:590-595).
            hidden = nn.Dense(
                self.cfg.word_embed_proj_dim,
                use_bias=False,
                dtype=self.cfg.dtype,
                param_dtype=jnp.float32,
                name="project_out",
            )(hidden)
        if self.cfg.tie_embeddings:
            wte = self.variables["params"]["transformer"]["wte"]["embedding"]
            logits = hidden @ wte.T.astype(hidden.dtype)
        else:
            logits = nn.Dense(
                self.cfg.vocab_size,
                use_bias=self.cfg.lm_head_bias,
                dtype=self.cfg.dtype,
                param_dtype=jnp.float32,
                name="lm_head",
            )(hidden)
        if self.cfg.logits_multiplier != 1.0:
            logits = logits * self.cfg.logits_multiplier
        return logits.astype(jnp.float32)

    def generate(
        self,
        params,
        input_ids: jax.Array,
        max_length: int,
        top_k: int = 1,
        top_p: float = 0.0,
        temperature: float = 1.0,
        rng: Optional[jax.Array] = None,
        eos_token_id: Optional[int] = None,
        **kwargs,
    ) -> jax.Array:
        """Reference ``GenerationMixin.generate``
        (flash_attn/utils/generation.py:566-587): kv-cached decode up to
        ``max_length`` total tokens. top_k=1 (the reference default) is
        greedy; pass ``rng`` + temperature/top_k/top_p for sampling."""
        from liteattention_tpu.utils.generation import greedy_decode

        greedy = rng is None or temperature == 0.0 or top_k == 1
        return greedy_decode(
            lambda p, ids, inf: self.apply(p, ids, inference_params=inf),
            params,
            input_ids,
            max_new_tokens=max_length - input_ids.shape[1],
            max_seqlen=max_length,
            rng=None if greedy else rng,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            eos_token_id=eos_token_id,
            **kwargs,
        )


def gpt_loss_fn(
    model: GPTLMHeadModel, params, input_ids, labels,
    moe_aux_weight: float = 0.01,
):
    """Next-token CE loss (the training objective of the reference's
    harness, training/src/tasks/seq.py). MoE configs: the sown Switch
    load-balance losses are collected (``mutable=["losses"]`` -- flax
    silently DROPS sows into immutable collections, so omitting this
    would starve the router of its balancing gradient) and added with
    ``moe_aux_weight``."""
    if model.cfg.moe_experts > 0:
        logits, state = model.apply(
            params, input_ids, mutable=["losses"]
        )
        ce = cross_entropy_loss(logits[:, :-1], labels[:, 1:])
        aux = sum(jax.tree_util.tree_leaves(state["losses"]))
        return ce + moe_aux_weight * aux
    logits = model.apply(params, input_ids)
    return cross_entropy_loss(logits[:, :-1], labels[:, 1:])


def gpt_tp_apply(
    cfg: GPTConfig, params, input_ids: jax.Array, axis_name: str = "tp"
):
    """Megatron-TP forward of :class:`GPTLMHeadModel` for ``shard_map``.

    Consumes the SINGLE-DEVICE (replicated) param tree and slices each
    rank's shard with ``axis_index`` inside the region: vocab-parallel
    word embedding + column-parallel position embedding with one fused
    all-reduce (reference ``ParallelGPT2Embeddings``,
    flash_attn/modules/embedding.py:160-216), head-sharded QKV +
    row-parallel out projection (reference ``ParallelMHA``),
    column/row-parallel MLP (reference ``ParallelMLP``), and the TIED
    vocab-parallel LM head (reference models/gpt.py:477-495).

    Returns the rank's LOCAL logits shard ``[B, S, V/tp]`` -- feed
    :func:`liteattention_tpu.losses.cross_entropy.parallel_cross_entropy_loss`
    or all-gather over ``axis_name`` for full logits. Deterministic
    (inference/eval) path; rotary/ALiBi configs are not yet TP-routed.
    """
    from liteattention_tpu.ops.norms import dropout_add_norm
    from liteattention_tpu.parallel.tensor_parallel import (
        parallel_gpt2_embeddings,
        vocab_parallel_logits,
    )

    assert cfg.rotary_emb_dim == 0, "TP path: learned positions only"
    assert not cfg.use_alibi
    assert cfg.prenorm and cfg.word_embed_proj_dim is None, (
        "TP path: the OPT-350m post-norm/projected-embedding layout "
        "is not plumbed (use the single-device model)"
    )
    p = params["params"]
    t = p["transformer"]
    tp = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    dt = cfg.dtype or jnp.float32

    def shard(w, axis):
        n = w.shape[axis] // tp
        return jax.lax.dynamic_slice_in_dim(w, rank * n, n, axis)

    wte = t["wte"]["embedding"]
    wte_loc = shard(wte, 0).astype(dt)
    if cfg.embeddings_multiplier != 1.0:
        wte_loc = wte_loc * cfg.embeddings_multiplier
    wpe_loc = (
        shard(t["wpe"]["embedding"], 1).astype(dt)
        if cfg.max_position_embeddings
        else None
    )
    x = parallel_gpt2_embeddings(
        input_ids, wte_loc, wpe_loc, axis_name=axis_name
    )

    h, hk = cfg.num_heads, cfg.num_heads_kv or cfg.num_heads
    d = cfg.dim // h
    h_loc, hk_loc = h // tp, hk // tp
    scale = 1.0 / d if cfg.scale_qk_dot_by_d else None

    def dense_local(x, kernel, bias, col_shard_sizes=None, row_shard=False):
        """Local matmul mirroring nn.Dense's dtype discipline. With
        ``col_shard_sizes`` the OUTPUT cols are a concatenation of
        per-section shards (e.g. packed q|k|v); ``row_shard`` slices the
        input dim (bias is NOT added here -- add after the psum)."""
        if col_shard_sizes is not None:
            cols, off = [], 0
            for full, loc in col_shard_sizes:
                sec = jax.lax.dynamic_slice_in_dim(
                    kernel, off + rank * loc, loc, 1
                )
                cols.append(sec)
                off += full
            kernel = jnp.concatenate(cols, axis=1)
            if bias is not None:
                bs, off = [], 0
                for full, loc in col_shard_sizes:
                    bs.append(
                        jax.lax.dynamic_slice_in_dim(
                            bias, off + rank * loc, loc, 0
                        )
                    )
                    off += full
                bias = jnp.concatenate(bs, axis=0)
        if row_shard:
            kernel = shard(kernel, 0)
            bias = None
        y = jnp.dot(x.astype(dt), kernel.astype(dt))
        if bias is not None:
            y = y + bias.astype(dt)
        return y

    residual = None
    for i in range(cfg.num_layers):
        blk = t[f"block_{i}"]
        w1 = blk["norm1_scale"]
        b1 = None if cfg.use_rms_norm else blk["norm1_bias"]
        normed, residual = dropout_add_norm(
            x, residual, w1, b1, 0.0, None, cfg.eps, prenorm=True,
            residual_in_fp32=True, rms=cfg.use_rms_norm,
            deterministic=True,
        )
        # -- attention (head-sharded) --
        mha = blk["mha"]
        qkv = dense_local(
            normed,
            mha["Wqkv"]["kernel"],
            mha["Wqkv"].get("bias"),
            col_shard_sizes=[
                (h * d, h_loc * d),
                (hk * d, hk_loc * d),
                (hk * d, hk_loc * d),
            ],
        )
        q = qkv[..., : h_loc * d]
        kk = qkv[..., h_loc * d : (h_loc + hk_loc) * d]
        vv = qkv[..., (h_loc + hk_loc) * d :]
        b_, s_ = q.shape[0], q.shape[1]
        oh = flash_attention(
            q.reshape(b_, s_, h_loc, d).transpose(0, 2, 1, 3),
            kk.reshape(b_, s_, hk_loc, d).transpose(0, 2, 1, 3),
            vv.reshape(b_, s_, hk_loc, d).transpose(0, 2, 1, 3),
            causal=True,
            scale=scale,
        )
        attn_local = oh.transpose(0, 2, 1, 3).reshape(b_, s_, h_loc * d)
        partial = dense_local(
            attn_local, mha["out_proj"]["kernel"], None, row_shard=True
        )
        attn_out = jax.lax.psum(partial, axis_name)
        ob = mha["out_proj"].get("bias")
        if ob is not None:
            attn_out = attn_out + ob.astype(dt)

        # -- MLP (column/row-parallel) --
        def run_mlp(src):
            mlp = blk["mlp"]
            ffn = cfg.ffn_dim or 4 * cfg.dim
            if cfg.gated_mlp:
                y = dense_local(
                    src,
                    mlp["fc1"]["kernel"],
                    mlp["fc1"].get("bias"),
                    col_shard_sizes=[
                        (ffn, ffn // tp),
                        (ffn, ffn // tp),
                    ],
                )
                gate, up = jnp.split(y, 2, axis=-1)
                y = nn.silu(gate) * up
            else:
                y = dense_local(
                    src,
                    mlp["fc1"]["kernel"],
                    mlp["fc1"].get("bias"),
                    col_shard_sizes=[(ffn, ffn // tp)],
                )
                y = nn.gelu(y)
            part = dense_local(
                y, mlp["fc2"]["kernel"], None, row_shard=True
            )
            out = jax.lax.psum(part, axis_name)
            fb = mlp["fc2"].get("bias")
            if fb is not None:
                out = out + fb.astype(dt)
            return out

        if cfg.parallel_block:
            x = attn_out + run_mlp(normed)
        else:
            w2 = blk["norm2_scale"]
            b2 = None if cfg.use_rms_norm else blk["norm2_bias"]
            normed2, residual = dropout_add_norm(
                attn_out, residual, w2, b2, 0.0, None, cfg.eps,
                prenorm=True, residual_in_fp32=True,
                rms=cfg.use_rms_norm, deterministic=True,
            )
            x = run_mlp(normed2)

    final = (x.astype(jnp.float32) + residual).astype(dt)
    if cfg.use_rms_norm:
        hidden = rms_norm(final, t["ln_f_scale"], eps=cfg.eps)
    else:
        hidden = layer_norm(
            final, t["ln_f_scale"], t["ln_f_bias"], eps=cfg.eps
        )
    if cfg.tie_embeddings:
        logits = vocab_parallel_logits(hidden, wte_loc)
        if cfg.embeddings_multiplier != 1.0:
            # wte_loc carries the embeddings multiplier; the tied head
            # must use the raw weights.
            logits = logits / cfg.embeddings_multiplier
    else:
        lm = p["lm_head"]["kernel"]
        logits = dense_local(
            hidden, lm, None, col_shard_sizes=[(lm.shape[1], lm.shape[1] // tp)]
        )
    if cfg.logits_multiplier != 1.0:
        logits = logits * cfg.logits_multiplier
    return logits.astype(jnp.float32)


__all__ = [
    "GPTConfig",
    "GPTModel",
    "GPTLMHeadModel",
    "gpt_loss_fn",
    "gpt_tp_apply",
]
