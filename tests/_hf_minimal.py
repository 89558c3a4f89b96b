"""Minimal numpy forwards of trust_remote_code HF architectures.

Baichuan (baichuan-inc/Baichuan-7B/13B modeling_baichuan.py) and BTLM
(cerebras/btlm-3b-8k-base modeling_btlm.py) ship their modeling code
via trust_remote_code, which cannot be fetched offline. These are
vendored re-implementations of those public modeling semantics, small
enough to audit, used as offline logit-parity oracles for
``remap_state_dict_hf_baichuan`` / ``remap_state_dict_hf_btlm``
(parity bar: reference flash_attn/models/{baichuan,btlm}.py, which
test against the real HF classes online).
"""

import math

import numpy as np


def _rms(x, w, eps):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def _ln(x, w, b, eps):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / np.sqrt(v + eps) * w + b


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _rope_half(x, base=10000.0):
    """HF llama-style non-interleaved rotary (rotate_half convention)."""
    b, s, h, d = x.shape
    inv = 1.0 / base ** (np.arange(0, d, 2, dtype=np.float64) / d)
    f = np.outer(np.arange(s), inv)
    cos = np.cos(f)[None, :, None, :]
    sin = np.sin(f)[None, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return np.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def alibi_slopes(n):
    """Canonical ALiBi slope schedule (Press et al.; HF BTLM/baichuan-13B
    build_alibi_tensor)."""

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n).is_integer():
        return np.asarray(pow2(n))
    closest = 2 ** int(math.floor(math.log2(n)))
    extra = pow2(2 * closest)[0::2][: n - closest]
    return np.asarray(pow2(closest) + extra)


def _attn(q, k, v, scale, alibi=None):
    """Causal attention; q/k/v [b, s, h, hd]; optional alibi [h]."""
    s = q.shape[1]
    att = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if alibi is not None:
        # bias = -slope * (i - j); softmax-shift-equivalent to every HF
        # build_alibi_tensor variant.
        dist = np.arange(s)[:, None] - np.arange(s)[None, :]
        att = att - alibi[None, :, None, None] * dist[None, None]
    att = np.where(
        np.tril(np.ones((s, s), bool))[None, None], att, -np.inf
    )
    p = _softmax(att)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


def baichuan_forward(sd, ids, num_heads, num_layers, eps=1e-6,
                     use_rotary=True, norm_head=False):
    """modeling_baichuan.py semantics: RMSNorm pre-attn/pre-MLP, fused
    W_pack qkv, full rotary (7B) or ALiBi (13B), SwiGLU, no biases,
    untied lm_head (optionally L2-normalized: v2 norm_head)."""
    x = sd["model.embed_tokens.weight"][ids].astype(np.float64)
    b, s, d = x.shape
    hd = d // num_heads
    slopes = None if use_rotary else alibi_slopes(num_heads)
    for i in range(num_layers):
        pre = f"model.layers.{i}."
        y = _rms(x, sd[pre + "input_layernorm.weight"], eps)
        qkv = y @ sd[pre + "self_attn.W_pack.weight"].T
        q, k, v = (
            a.reshape(b, s, num_heads, hd) for a in np.split(qkv, 3, -1)
        )
        if use_rotary:
            q, k = _rope_half(q), _rope_half(k)
        o = _attn(q, k, v, hd**-0.5, alibi=slopes).reshape(b, s, d)
        x = x + o @ sd[pre + "self_attn.o_proj.weight"].T
        y = _rms(x, sd[pre + "post_attention_layernorm.weight"], eps)
        g = y @ sd[pre + "mlp.gate_proj.weight"].T
        u = y @ sd[pre + "mlp.up_proj.weight"].T
        x = x + (_silu(g) * u) @ sd[pre + "mlp.down_proj.weight"].T
    x = _rms(x, sd["model.norm.weight"], eps)
    w = sd["lm_head.weight"].astype(np.float64)
    if norm_head:
        w = w / np.maximum(
            np.linalg.norm(w, axis=1, keepdims=True), 1e-12
        )
    return x @ w.T


def btlm_forward(sd, ids, num_heads, num_layers, eps=1e-5,
                 emb_scale=14.6, width_scale=0.1, output_alpha=2.22,
                 scale_qk_dot_by_d=True):
    """modeling_btlm.py semantics: muP-scaled embeddings, LayerNorm,
    Conv1D ((in, out)) fused c_attn, ALiBi, 1/d attention scaling,
    SwiGLU (act(c_fc) * c_fc2), tied lm_head with muP output scale."""
    x = sd["transformer.wte.weight"][ids].astype(np.float64) * emb_scale
    b, s, d = x.shape
    hd = d // num_heads
    slopes = alibi_slopes(num_heads)
    scale = 1.0 / hd if scale_qk_dot_by_d else hd**-0.5
    for i in range(num_layers):
        pre = f"transformer.h.{i}."
        y = _ln(x, sd[pre + "ln_1.weight"], sd[pre + "ln_1.bias"], eps)
        qkv = y @ sd[pre + "attn.c_attn.weight"] + sd[
            pre + "attn.c_attn.bias"
        ]
        q, k, v = (
            a.reshape(b, s, num_heads, hd) for a in np.split(qkv, 3, -1)
        )
        o = _attn(q, k, v, scale, alibi=slopes).reshape(b, s, d)
        x = x + o @ sd[pre + "attn.c_proj.weight"] + sd[
            pre + "attn.c_proj.bias"
        ]
        y = _ln(x, sd[pre + "ln_2.weight"], sd[pre + "ln_2.bias"], eps)
        g = y @ sd[pre + "mlp.c_fc.weight"] + sd[pre + "mlp.c_fc.bias"]
        u = y @ sd[pre + "mlp.c_fc2.weight"] + sd[pre + "mlp.c_fc2.bias"]
        x = x + (_silu(g) * u) @ sd[pre + "mlp.c_proj.weight"] + sd[
            pre + "mlp.c_proj.bias"
        ]
    x = _ln(x, sd["transformer.ln_f.weight"], sd["transformer.ln_f.bias"],
            eps)
    return (x @ sd["transformer.wte.weight"].T) * (
        output_alpha * width_scale
    )
