"""Multi-head attention modules over the Pallas flash kernels.

TPU-native counterpart of the reference's ``MHA`` / ``ParallelMHA``
(reference flash_attn/modules/mha.py:373-993): fused QKV projection,
MHA/GQA/MQA, rotary embeddings, causal masking, cross attention, and an
inference KV cache. Dropout inside attention falls back to a (slower)
XLA path, mirroring the reference's "flash only when dropout works"
dispatch.

``ParallelMHA`` is the Megatron tensor-parallel variant: the QKV
projection is column-parallel (heads sharded over the TP axis) and the
output projection is row-parallel with a ``psum`` -- the shard_map form
of the reference's ``ColumnParallelLinear``/``RowParallelLinear`` +
``all_reduce`` (flash_attn/modules/mha.py:707, ops/fused_dense.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteattention_tpu.layers.rotary import RotaryEmbedding
from liteattention_tpu.ops.flash_fwd import (
    flash_attention,
    flash_attention_masked,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes


@dataclasses.dataclass
class InferenceParams:
    """Decoding-time KV cache holder, mirroring the reference's
    ``InferenceParams`` (flash_attn/utils/generation.py:13-38)."""

    max_seqlen: int
    max_batch_size: int
    seqlen_offset: int = 0
    key_value_memory_dict: dict = dataclasses.field(default_factory=dict)

    def reset(self):
        self.seqlen_offset = 0
        self.key_value_memory_dict.clear()


def _split_heads(x, num_heads):
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, -1)


def alibi_slopes(nheads: int):
    """Standard ALiBi slope schedule (geometric from 2^(-8/n); the
    non-power-of-two interleave matches the reference's
    flash_attn/models usage of the train-short-test-long recipe)."""
    import math

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(nheads).is_integer():
        return jnp.asarray(pow2(nheads), jnp.float32)
    closest = 2 ** int(math.floor(math.log2(nheads)))
    extra = pow2(2 * closest)[0::2][: nheads - closest]
    return jnp.asarray(pow2(closest) + extra, jnp.float32)


class MHA(nn.Module):
    """Self/cross multi-head attention (reference modules/mha.py:373).

    Args mirror the reference: ``num_heads_kv`` < ``num_heads`` enables
    GQA/MQA; ``rotary_emb_dim`` > 0 applies rotary to q/k;
    ``cross_attn`` reads K/V from ``x_kv``.
    """

    embed_dim: int
    num_heads: int
    num_heads_kv: Optional[int] = None
    head_dim: Optional[int] = None
    cross_attn: bool = False
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    dropout: float = 0.0
    softmax_scale: Optional[float] = None
    causal: bool = False
    rotary_emb_dim: int = 0
    rotary_emb_base: float = 10000.0
    rotary_emb_interleaved: bool = False
    use_alibi: bool = False
    dtype: Any = jnp.bfloat16
    block_sizes: Optional[BlockSizes] = None

    def _attend(self, q, k, v, causal, deterministic):
        """q/k/v: [B, S, H, D] -> [B, S, H, D]."""
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        scale = self.softmax_scale
        dropout_p = 0.0
        dropout_seed = None
        if self.dropout > 0.0 and not deterministic:
            # In-kernel attention dropout (reference FA2 dropout,
            # csrc/flash_attn): the kernels regenerate a counter-based
            # keep mask (ops/flash_fwd.dropout_keep_mask) in fwd and
            # bwd, so no [B, H, S, S] mask tensor is materialized. The
            # flax "dropout" rng stream seeds the counter.
            dropout_p = float(self.dropout)
            rng = self.make_rng("dropout")
            dropout_seed = jax.random.randint(
                rng, (), -(2**31), 2**31 - 1, jnp.int32
            )
        bs = self.block_sizes or get_block_sizes(
            qh.shape[-1], q.dtype.itemsize
        )
        if self.use_alibi:
            out = flash_attention_masked(
                qh, kh, vh, scale=scale, causal=causal,
                alibi_slopes=alibi_slopes(qh.shape[1]), block_sizes=bs,
                dropout_p=dropout_p, dropout_seed=dropout_seed,
            )
        else:
            out = flash_attention(
                qh, kh, vh, scale=scale, causal=causal, block_sizes=bs,
                dropout_p=dropout_p, dropout_seed=dropout_seed,
            )
        return out.transpose(0, 2, 1, 3)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_kv: Optional[jax.Array] = None,
        inference_params: Optional[InferenceParams] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = self.num_heads
        hk = self.num_heads_kv or h
        d = self.head_dim or self.embed_dim // h
        dense = lambda feats, name, bias: nn.Dense(
            feats,
            use_bias=bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

        if self.cross_attn:
            assert x_kv is not None
            q = dense(h * d, "Wq", self.qkv_proj_bias)(x)
            kv = dense(2 * hk * d, "Wkv", self.qkv_proj_bias)(x_kv)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = dense((h + 2 * hk) * d, "Wqkv", self.qkv_proj_bias)(x)
            q = qkv[..., : h * d]
            k = qkv[..., h * d : (h + hk) * d]
            v = qkv[..., (h + hk) * d :]
        q = _split_heads(q, h)
        k = _split_heads(k, hk)
        v = _split_heads(v, hk)

        offset = 0
        if inference_params is not None:
            offset = inference_params.seqlen_offset
        if self.rotary_emb_dim > 0 and not self.cross_attn:
            q, k = RotaryEmbedding(
                self.rotary_emb_dim,
                self.rotary_emb_base,
                self.rotary_emb_interleaved,
                name="rotary",
            )(q, k, seqlen_offset=offset)

        causal = self.causal
        if inference_params is not None and not self.cross_attn:
            # Decode path: append to the cache, attend over the prefix.
            # The cache lives in the TPU-native HEAD-MAJOR layout
            # [B, Hk, S_max, D]: appends relayout only the new (tiny)
            # tokens, and the kernel streams each head's cache slice
            # contiguously -- the reference layout [B, S, Hk, D] would
            # cost a full-cache transpose per step.
            layer = "/".join(self.scope.path) or "root"
            cache = inference_params.key_value_memory_dict
            if layer not in cache:
                b = x.shape[0]
                cache[layer] = (
                    jnp.zeros(
                        (b, hk, inference_params.max_seqlen, d), k.dtype
                    ),
                    jnp.zeros(
                        (b, hk, inference_params.max_seqlen, d), v.dtype
                    ),
                )
            entry = cache[layer]
            # int8-quantized entry (generation quantize_cache=True):
            # (k_i8, v_i8, k_scale, v_scale), scales [B, Hk, D]
            # (utils/generation.quantize_inference_cache). New rows are
            # quantized with the FROZEN scales; the per-channel dequant
            # folds exactly into q / the output around the kernel
            # (ops/flash_fwd._decode_folded docstring).
            quantized = len(entry) == 4
            if quantized:
                kc, vc, kq_scale, vq_scale = entry
            else:
                kc, vc = entry
            kn = k.transpose(0, 2, 1, 3)
            vn = v.transpose(0, 2, 1, 3)
            if quantized:
                from liteattention_tpu.ops.kv_quant import (
                    quantize_rows_native,
                )

                kn = quantize_rows_native(kn, kq_scale)
                vn = quantize_rows_native(vn, vq_scale)
            kc = jax.lax.dynamic_update_slice(kc, kn, (0, 0, offset, 0))
            vc = jax.lax.dynamic_update_slice(vc, vn, (0, 0, offset, 0))
            cache[layer] = (
                (kc, vc, kq_scale, vq_scale) if quantized else (kc, vc)
            )
            # Attend over the FULL fixed-capacity cache with a per-batch
            # bound: shapes are identical at every decode step, so the
            # step compiles once and replays -- the TPU analog of the
            # reference's CUDA-graph decode cache
            # (flash_attn/utils/generation.py). Bottom-right causality
            # covers both prefill (offset 0) and appended tokens.
            # kv_bound = TOTAL valid key length (the kernel subtracts the
            # static q length for bottom-right causal alignment).
            s_new = k.shape[1]
            bound = jnp.full((kc.shape[0],), offset + s_new, jnp.int32)
            qh = q.transpose(0, 2, 1, 3)
            if s_new == 1 and not self.use_alibi:
                # PackGQA single-token decode (see
                # flash_attn_interface.flash_attn_with_kvcache): the
                # group query heads ride the q-row dimension; one new
                # token's bottom-right causality is plain col < bound.
                b_ = qh.shape[0]
                group = h // hk
                qp = qh.reshape(b_, hk, group, d)
                if quantized:
                    qp = (
                        qp.astype(jnp.float32)
                        * kq_scale[:, :, None, :]
                    ).astype(qp.dtype)
                oh = flash_attention_masked(
                    qp,
                    kc,
                    vc,
                    kv_bound=bound,
                    scale=self.softmax_scale,
                    bound_causal=False,
                    block_sizes=self.block_sizes or BlockSizes(128, 2048),
                )
                if quantized:
                    oh = (
                        oh.astype(jnp.float32)
                        * vq_scale[:, :, None, :]
                    ).astype(q.dtype)
                oh = oh.reshape(b_, h, 1, d)
            else:
                assert not quantized, (
                    "the quantized decode cache supports single-token "
                    "steps without ALiBi (quantize after prefill)"
                )
                oh = flash_attention_masked(
                    qh,
                    kc,
                    vc,
                    alibi_slopes=(
                        alibi_slopes(h) if self.use_alibi else None
                    ),
                    kv_bound=bound,
                    scale=self.softmax_scale,
                    bound_causal=self.causal,
                    block_sizes=self.block_sizes
                    or get_block_sizes(d, q.dtype.itemsize),
                )
            out = oh.transpose(0, 2, 1, 3)
            out = out.reshape(out.shape[0], out.shape[1], h * d)
            return dense(self.embed_dim, "out_proj", self.out_proj_bias)(
                out
            )

        out = self._attend(q, k, v, causal, deterministic)
        out = out.reshape(out.shape[0], out.shape[1], h * d)
        return dense(self.embed_dim, "out_proj", self.out_proj_bias)(out)


class ParallelMHA(nn.Module):
    """Tensor-parallel MHA for use inside ``shard_map`` (reference
    ``ParallelMHA``, flash_attn/modules/mha.py:707-993).

    Heads are sharded over ``axis_name``: this module receives the local
    head shard count via ``num_heads // tp_size`` computed from the axis
    size at call time, computes attention locally (zero comms), and
    psums after the output projection (row-parallel).
    """

    embed_dim: int
    num_heads: int
    axis_name: str = "tp"
    num_heads_kv: Optional[int] = None
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    softmax_scale: Optional[float] = None
    causal: bool = False
    rotary_emb_dim: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        tp = jax.lax.axis_size(self.axis_name)
        h_local = self.num_heads // tp
        hk_local = (self.num_heads_kv or self.num_heads) // tp
        d = self.embed_dim // self.num_heads
        inner = MHA(
            embed_dim=self.embed_dim,
            num_heads=h_local,
            num_heads_kv=hk_local,
            head_dim=d,
            qkv_proj_bias=self.qkv_proj_bias,
            out_proj_bias=False,
            softmax_scale=self.softmax_scale,
            causal=self.causal,
            rotary_emb_dim=self.rotary_emb_dim,
            dtype=self.dtype,
            name="local_mha",
        )
        out = inner(x, deterministic=deterministic)
        out = jax.lax.psum(out, self.axis_name)
        if self.out_proj_bias:
            bias = self.param(
                "out_bias", nn.initializers.zeros, (self.embed_dim,),
                jnp.float32,
            )
            out = out + bias.astype(out.dtype)
        return out


__all__ = ["MHA", "ParallelMHA", "InferenceParams"]
