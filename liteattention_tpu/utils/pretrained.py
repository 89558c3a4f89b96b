"""Pretrained-weight loading from HuggingFace checkpoints.

TPU-native counterpart of the reference's remapping loaders
(reference flash_attn/utils/pretrained.py +
flash_attn/models/gpt.py remap_state_dict_hf_gpt2 and the per-family
``remap_state_dict_hf_*`` functions): convert a HuggingFace state dict
into this framework's flax param tree so HF-pretrained models run on the
Pallas kernels.

Works from either a ``transformers`` model object or a raw
``{name: np.ndarray}`` state dict (no torch required at call time if
arrays are already numpy).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from liteattention_tpu.models.gpt import GPTConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def remap_state_dict_hf_gpt2(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF GPT-2 state dict -> flax params for ``GPTLMHeadModel``.

    Parity target: ``remap_state_dict_hf_gpt2`` (reference
    flash_attn/models/gpt.py). HF GPT-2 Conv1D weights are stored
    (in, out), which matches flax Dense kernels directly.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["wte.weight"]}
    t["wpe"] = {"embedding": sd["wpe.weight"]}
    for i in range(cfg.num_layers):
        pre = f"h.{i}."
        blk: Dict[str, Any] = {
            "norm1_scale": sd[pre + "ln_1.weight"],
            "norm1_bias": sd[pre + "ln_1.bias"],
            "norm2_scale": sd[pre + "ln_2.weight"],
            "norm2_bias": sd[pre + "ln_2.bias"],
            "mha": {
                "Wqkv": {
                    "kernel": sd[pre + "attn.c_attn.weight"],
                    "bias": sd[pre + "attn.c_attn.bias"],
                },
                "out_proj": {
                    "kernel": sd[pre + "attn.c_proj.weight"],
                    "bias": sd[pre + "attn.c_proj.bias"],
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[pre + "mlp.c_fc.weight"],
                    "bias": sd[pre + "mlp.c_fc.bias"],
                },
                "fc2": {
                    "kernel": sd[pre + "mlp.c_proj.weight"],
                    "bias": sd[pre + "mlp.c_proj.bias"],
                },
            },
        }
        t[f"block_{i}"] = blk
    t["ln_f_scale"] = sd["ln_f.weight"]
    t["ln_f_bias"] = sd["ln_f.bias"]
    return {"params": p}


def remap_state_dict_hf_llama(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF LLaMA state dict -> flax params (reference
    flash_attn/models/llama.py remap_state_dict_hf_llama). HF Linear
    weights are (out, in) and are transposed; q/k/v are fused into Wqkv
    in the reference's packing order."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def lin(name):
        return sd[name].T

    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["model.embed_tokens.weight"]}
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        wq = lin(pre + "self_attn.q_proj.weight")
        wk = lin(pre + "self_attn.k_proj.weight")
        wv = lin(pre + "self_attn.v_proj.weight")
        gate = lin(pre + "mlp.gate_proj.weight")
        up = lin(pre + "mlp.up_proj.weight")
        t[f"block_{i}"] = {
            "norm1_scale": sd[pre + "input_layernorm.weight"],
            "norm2_scale": sd[pre + "post_attention_layernorm.weight"],
            "mha": {
                "Wqkv": {"kernel": np.concatenate([wq, wk, wv], axis=1)},
                "out_proj": {
                    "kernel": lin(pre + "self_attn.o_proj.weight")
                },
            },
            "mlp": {
                "fc1": {"kernel": np.concatenate([gate, up], axis=1)},
                "fc2": {"kernel": lin(pre + "mlp.down_proj.weight")},
            },
        }
    t["ln_f_scale"] = sd["model.norm.weight"]
    p["lm_head"] = {"kernel": lin("lm_head.weight")}
    return {"params": p}


def state_dict_from_pretrained(model_name: str) -> Dict[str, np.ndarray]:
    """Fetch a HF state dict (reference utils/pretrained.py
    ``state_dict_from_pretrained``). Requires local HF cache or network."""
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_name)
    return {k: _np(v) for k, v in model.state_dict().items()}


def remap_state_dict_wan(
    state_dict: Mapping[str, Any], cfg
) -> Dict[str, Any]:
    """Official Wan2.1/2.2 torch checkpoint -> flax params for
    ``liteattention_tpu.models.wan.WanModel``.

    Key layout follows Wan-Video/Wan2.1 ``wan/modules/model.py``
    (WanModel): ``patch_embedding`` (Conv3d), ``text_embedding.{0,2}``,
    ``time_embedding.{0,2}``, ``time_projection.1``,
    ``blocks.N.{self_attn,cross_attn}.{q,k,v,o,norm_q,norm_k}``,
    ``blocks.N.{norm3,ffn.0,ffn.2,modulation}``, ``head.{head,
    modulation}``, and (I2V) ``img_emb.proj.{0,1,3,4}``. Torch Linear
    weights are (out, in) and transpose into flax (in, out) kernels; the
    patch-embedding Conv3d kernel (out, in, kt, kh, kw) is permuted to
    match the model's patchify feature order (pt, ph, pw, c).

    I2V checkpoints with decoupled image K/V (``cross_attn.k_img``,
    ``v_img``, ``norm_k_img`` -- the Wan2.1-I2V WanI2VCrossAttention
    layout) remap onto the model's decoupled branch; construct it with
    ``WanConfig(i2v_decoupled=True)`` (round 5; the concat-context form
    stays the default for Wan2.2-style checkpoints).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    has_img_kv = any("k_img" in k for k in sd)
    if has_img_kv != bool(getattr(cfg, "i2v_decoupled", False)):
        raise ValueError(
            "checkpoint/config mismatch: decoupled image-K/V keys "
            f"{'present' if has_img_kv else 'absent'} but "
            f"cfg.i2v_decoupled={getattr(cfg, 'i2v_decoupled', False)}; "
            "construct WanConfig(i2v_decoupled="
            f"{has_img_kv}) for this checkpoint"
        )

    def lin(prefix):
        out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
        if prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"]
        return out

    p: Dict[str, Any] = {}
    # Patchify: Conv3d(out=dim, in=c, k=(pt,ph,pw)) == Dense over
    # features ordered (pt, ph, pw, c) -- permute (2,3,4,1,0).
    w = sd["patch_embedding.weight"]
    dim, c_in, pt, ph, pw = w.shape
    p["patch_embed"] = {
        "kernel": np.ascontiguousarray(
            w.transpose(2, 3, 4, 1, 0).reshape(pt * ph * pw * c_in, dim)
        ),
        "bias": sd["patch_embedding.bias"],
    }
    p["text_proj"] = {
        "fc1": lin("text_embedding.0"),
        "fc2": lin("text_embedding.2"),
    }
    p["time_mlp_1"] = lin("time_embedding.0")
    p["time_mlp_2"] = lin("time_embedding.2")
    p["time_mod"] = lin("time_projection.1")
    if "img_emb.proj.0.weight" in sd:
        p["img_proj"] = {
            "norm_in": {
                "scale": sd["img_emb.proj.0.weight"],
                "bias": sd["img_emb.proj.0.bias"],
            },
            "fc1": lin("img_emb.proj.1"),
            "fc2": lin("img_emb.proj.3"),
            "norm_out": {
                "scale": sd["img_emb.proj.4.weight"],
                "bias": sd["img_emb.proj.4.bias"],
            },
        }

    def attn(prefix):
        out = {
            "q": lin(prefix + ".q"),
            "k": lin(prefix + ".k"),
            "v": lin(prefix + ".v"),
            "o": lin(prefix + ".o"),
        }
        if prefix + ".norm_q.weight" in sd:
            out["q_norm"] = {"scale": sd[prefix + ".norm_q.weight"]}
            out["k_norm"] = {"scale": sd[prefix + ".norm_k.weight"]}
        if prefix + ".k_img.weight" in sd:
            # Wan2.1-I2V decoupled image branch (WanI2VCrossAttention).
            out["k_img"] = lin(prefix + ".k_img")
            out["v_img"] = lin(prefix + ".v_img")
            if prefix + ".norm_k_img.weight" in sd:
                out["k_img_norm"] = {
                    "scale": sd[prefix + ".norm_k_img.weight"]
                }
        return out

    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        p[f"block_{i}"] = {
            "mod_bias": sd[pre + "modulation"].reshape(6, -1),
            "self_attn": attn(pre + "self_attn"),
            "cross_attn": attn(pre + "cross_attn"),
            "norm3": {
                "scale": sd[pre + "norm3.weight"],
                "bias": sd[pre + "norm3.bias"],
            },
            "ffn_up": lin(pre + "ffn.0"),
            "ffn_down": lin(pre + "ffn.2"),
        }
    p["proj_out"] = lin("head.head")
    p["final_mod_bias"] = sd["head.modulation"].reshape(2, -1)
    return {"params": p}


__all__ = [
    "remap_state_dict_wan",
    "remap_state_dict_hf_gpt2",
    "remap_state_dict_hf_llama",
    "state_dict_from_pretrained",
]


def remap_state_dict_hf_gpt_neox(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF GPT-NeoX state dict -> flax params for ``GPTLMHeadModel``.

    Parity target: ``remap_state_dict_hf_gpt_neox`` (reference
    flash_attn/models/gpt_neox.py:13-98). NeoX stores Wqkv
    head-INTERLEAVED as ((nheads, 3, headdim), hidden) -- it is
    regrouped to the packed (q | k | v) layout -- and uses untied
    parallel-block norms (``use_parallel_residual``:
    ``attn(ln1(x)) + mlp(ln2(x)) + x``).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    h = cfg.num_heads
    d = cfg.dim // h
    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["gpt_neox.embed_in.weight"]}
    for i in range(cfg.num_layers):
        pre = f"gpt_neox.layers.{i}."
        # (h, 3, d, in) -> (3, h, d, in) -> transpose to (in, 3*h*d)
        w = sd[pre + "attention.query_key_value.weight"]
        w = w.reshape(h, 3, d, -1).transpose(1, 0, 2, 3).reshape(
            3 * h * d, -1
        )
        b = sd[pre + "attention.query_key_value.bias"]
        b = b.reshape(h, 3, d).transpose(1, 0, 2).reshape(3 * h * d)
        t[f"block_{i}"] = {
            "norm1_scale": sd[pre + "input_layernorm.weight"],
            "norm1_bias": sd[pre + "input_layernorm.bias"],
            "norm2_scale": sd[pre + "post_attention_layernorm.weight"],
            "norm2_bias": sd[pre + "post_attention_layernorm.bias"],
            "mha": {
                "Wqkv": {"kernel": w.T, "bias": b},
                "out_proj": {
                    "kernel": sd[pre + "attention.dense.weight"].T,
                    "bias": sd[pre + "attention.dense.bias"],
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[pre + "mlp.dense_h_to_4h.weight"].T,
                    "bias": sd[pre + "mlp.dense_h_to_4h.bias"],
                },
                "fc2": {
                    "kernel": sd[pre + "mlp.dense_4h_to_h.weight"].T,
                    "bias": sd[pre + "mlp.dense_4h_to_h.bias"],
                },
            },
        }
    t["ln_f_scale"] = sd["gpt_neox.final_layer_norm.weight"]
    t["ln_f_bias"] = sd["gpt_neox.final_layer_norm.bias"]
    p["lm_head"] = {"kernel": sd["embed_out.weight"].T}
    return {"params": p}


def remap_state_dict_hf_falcon(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF Falcon (7B-style: MQA, parallel block, tied norm, no linear
    biases, tied embeddings) state dict -> flax params.

    Parity target: ``remap_state_dict_hf_falcon`` (reference
    flash_attn/models/falcon.py:13-105). Falcon stores Wqkv grouped as
    ((n_kv_groups, q_per_group + 2, headdim), hidden); it is split into
    the packed (q | k | v) layout.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    h = cfg.num_heads
    hk = cfg.num_heads_kv or h
    d = cfg.dim // h
    ratio = h // hk + 2
    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["transformer.word_embeddings.weight"]}
    for i in range(cfg.num_layers):
        pre = f"transformer.h.{i}."
        w = sd[pre + "self_attention.query_key_value.weight"]
        w = w.reshape(hk, ratio, d, -1)
        wq = w[:, :-2].reshape(h * d, -1)
        wk = w[:, -2].reshape(hk * d, -1)
        wv = w[:, -1].reshape(hk * d, -1)
        wqkv = np.concatenate([wq, wk, wv], axis=0)
        t[f"block_{i}"] = {
            "norm1_scale": sd[pre + "input_layernorm.weight"],
            "norm1_bias": sd[pre + "input_layernorm.bias"],
            "mha": {
                "Wqkv": {"kernel": wqkv.T},
                "out_proj": {
                    "kernel": sd[pre + "self_attention.dense.weight"].T
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[pre + "mlp.dense_h_to_4h.weight"].T
                },
                "fc2": {
                    "kernel": sd[pre + "mlp.dense_4h_to_h.weight"].T
                },
            },
        }
    t["ln_f_scale"] = sd["transformer.ln_f.weight"]
    t["ln_f_bias"] = sd["transformer.ln_f.bias"]
    return {"params": p}


def remap_state_dict_hf_opt(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF OPT state dict -> flax params for ``GPTLMHeadModel``.

    Parity target: ``remap_state_dict_hf_opt`` (reference
    flash_attn/models/opt.py:14-74). OPT's learned position table
    carries a +2 offset (HF ``OPTLearnedPositionalEmbedding``); rows
    [2:] are the real positions. Separate biased q/k/v projections fuse
    into Wqkv; the MLP is ReLU; embeddings are tied. The 350m layout
    (``word_embed_proj_dim != hidden_size`` project_in/out +
    ``do_layer_norm_before=False`` post-norm, no final norm) remaps
    onto ``GPTConfig(word_embed_proj_dim=..., prenorm=False)``
    (reference models/opt.py:22-28 + modules/embedding.py:29-55).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    pre0 = (
        "model.decoder."
        if any(k.startswith("model.decoder.") for k in sd)
        else "decoder."
    )
    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd[pre0 + "embed_tokens.weight"]}
    if pre0 + "project_in.weight" in sd:
        assert cfg.word_embed_proj_dim, (
            "checkpoint has project_in/out (OPT-350m layout); construct "
            "GPTConfig(word_embed_proj_dim=..., prenorm=False)"
        )
        t["project_in"] = {
            "kernel": sd[pre0 + "project_in.weight"].T
        }
        p["project_out"] = {
            "kernel": sd[pre0 + "project_out.weight"].T
        }
    # Positions: drop the 2 offset rows (reference opt.py does the same
    # slice when building the GPT2-shaped dict).
    t["wpe"] = {"embedding": sd[pre0 + "embed_positions.weight"][2:]}
    for i in range(cfg.num_layers):
        pre = f"{pre0}layers.{i}."
        wq = sd[pre + "self_attn.q_proj.weight"]
        wk = sd[pre + "self_attn.k_proj.weight"]
        wv = sd[pre + "self_attn.v_proj.weight"]
        bq = sd[pre + "self_attn.q_proj.bias"]
        bk = sd[pre + "self_attn.k_proj.bias"]
        bv = sd[pre + "self_attn.v_proj.bias"]
        t[f"block_{i}"] = {
            "norm1_scale": sd[pre + "self_attn_layer_norm.weight"],
            "norm1_bias": sd[pre + "self_attn_layer_norm.bias"],
            "norm2_scale": sd[pre + "final_layer_norm.weight"],
            "norm2_bias": sd[pre + "final_layer_norm.bias"],
            "mha": {
                "Wqkv": {
                    "kernel": np.concatenate([wq, wk, wv], axis=0).T,
                    "bias": np.concatenate([bq, bk, bv]),
                },
                "out_proj": {
                    "kernel": sd[pre + "self_attn.out_proj.weight"].T,
                    "bias": sd[pre + "self_attn.out_proj.bias"],
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[pre + "fc1.weight"].T,
                    "bias": sd[pre + "fc1.bias"],
                },
                "fc2": {
                    "kernel": sd[pre + "fc2.weight"].T,
                    "bias": sd[pre + "fc2.bias"],
                },
            },
        }
    if pre0 + "final_layer_norm.weight" in sd:
        t["ln_f_scale"] = sd[pre0 + "final_layer_norm.weight"]
        t["ln_f_bias"] = sd[pre0 + "final_layer_norm.bias"]
    elif pre0 + "layer_norm.weight" in sd:
        # OPT-175B names the final norm 'decoder.layer_norm'
        # (reference opt.py:49-51).
        t["ln_f_scale"] = sd[pre0 + "layer_norm.weight"]
        t["ln_f_bias"] = sd[pre0 + "layer_norm.bias"]
    else:
        # do_layer_norm_before=False checkpoints (350m) have no final
        # norm; the model must be post-norm.
        assert not cfg.prenorm, (
            "checkpoint has no final layer norm "
            "(do_layer_norm_before=False); construct "
            "GPTConfig(prenorm=False)"
        )
    return {"params": p}


def remap_state_dict_hf_gptj(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF GPT-J state dict -> flax params for ``GPTLMHeadModel``.

    Parity target: ``remap_state_dict_hf_gptj`` (reference
    flash_attn/models/gptj.py:12-68). GPT-J is a tied-norm parallel
    block (one ln_1 feeds both attn and MLP), bias-free separate q/k/v
    projections (fused to Wqkv), biased fc_in/fc_out MLP, partial
    INTERLEAVED rotary, and an untied lm_head WITH bias.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["transformer.wte.weight"]}
    for i in range(cfg.num_layers):
        pre = f"transformer.h.{i}."
        wq = sd[pre + "attn.q_proj.weight"]
        wk = sd[pre + "attn.k_proj.weight"]
        wv = sd[pre + "attn.v_proj.weight"]
        t[f"block_{i}"] = {
            # Tied-norm parallel block: the single HF ln_1 is norm1.
            "norm1_scale": sd[pre + "ln_1.weight"],
            "norm1_bias": sd[pre + "ln_1.bias"],
            "mha": {
                "Wqkv": {
                    "kernel": np.concatenate([wq, wk, wv], axis=0).T
                },
                "out_proj": {
                    "kernel": sd[pre + "attn.out_proj.weight"].T
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[pre + "mlp.fc_in.weight"].T,
                    "bias": sd[pre + "mlp.fc_in.bias"],
                },
                "fc2": {
                    "kernel": sd[pre + "mlp.fc_out.weight"].T,
                    "bias": sd[pre + "mlp.fc_out.bias"],
                },
            },
        }
    t["ln_f_scale"] = sd["transformer.ln_f.weight"]
    t["ln_f_bias"] = sd["transformer.ln_f.bias"]
    p["lm_head"] = {
        "kernel": sd["lm_head.weight"].T,
        "bias": sd["lm_head.bias"],
    }
    return {"params": p}


__all__ += [
    "remap_state_dict_hf_gpt_neox",
    "remap_state_dict_hf_falcon",
    "remap_state_dict_hf_opt",
    "remap_state_dict_hf_gptj",
]


def remap_state_dict_hf_bigcode(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF GPTBigCode (StarCoder) state dict -> flax params.

    Parity target: ``remap_state_dict_hf_bigcode`` (reference
    flash_attn/models/bigcode.py:12-71). BigCode is GPT-2 shaped but
    MQA: ``c_attn`` is already packed (q | k | v) with one KV head, and
    its torch Linear weights are (out, in) -- unlike GPT-2's Conv1D --
    so they transpose. Embeddings are tied.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["transformer.wte.weight"]}
    t["wpe"] = {"embedding": sd["transformer.wpe.weight"]}
    for i in range(cfg.num_layers):
        pre = f"transformer.h.{i}."
        t[f"block_{i}"] = {
            "norm1_scale": sd[pre + "ln_1.weight"],
            "norm1_bias": sd[pre + "ln_1.bias"],
            "norm2_scale": sd[pre + "ln_2.weight"],
            "norm2_bias": sd[pre + "ln_2.bias"],
            "mha": {
                "Wqkv": {
                    "kernel": sd[pre + "attn.c_attn.weight"].T,
                    "bias": sd[pre + "attn.c_attn.bias"],
                },
                "out_proj": {
                    "kernel": sd[pre + "attn.c_proj.weight"].T,
                    "bias": sd[pre + "attn.c_proj.bias"],
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[pre + "mlp.c_fc.weight"].T,
                    "bias": sd[pre + "mlp.c_fc.bias"],
                },
                "fc2": {
                    "kernel": sd[pre + "mlp.c_proj.weight"].T,
                    "bias": sd[pre + "mlp.c_proj.bias"],
                },
            },
        }
    t["ln_f_scale"] = sd["transformer.ln_f.weight"]
    t["ln_f_bias"] = sd["transformer.ln_f.bias"]
    return {"params": p}


def remap_state_dict_hf_baichuan(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF Baichuan state dict -> flax params.

    Parity target: ``remap_state_dict_baichuan`` (reference
    flash_attn/models/baichuan.py:20-113). LLaMA geometry with the
    fused ``W_pack`` qkv projection (3*dim, dim), split into thirds;
    7B uses rotary, 13B ALiBi (selected by hidden size in the config
    adapter, same hack as the reference). No linear biases.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}

    def lin(name):
        return sd[name].T

    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["model.embed_tokens.weight"]}
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        gate = lin(pre + "mlp.gate_proj.weight")
        up = lin(pre + "mlp.up_proj.weight")
        t[f"block_{i}"] = {
            "norm1_scale": sd[pre + "input_layernorm.weight"],
            "norm2_scale": sd[pre + "post_attention_layernorm.weight"],
            "mha": {
                # W_pack rows are (q | k | v) thirds already.
                "Wqkv": {"kernel": lin(pre + "self_attn.W_pack.weight")},
                "out_proj": {
                    "kernel": lin(pre + "self_attn.o_proj.weight")
                },
            },
            "mlp": {
                "fc1": {"kernel": np.concatenate([gate, up], axis=1)},
                "fc2": {"kernel": lin(pre + "mlp.down_proj.weight")},
            },
        }
    t["ln_f_scale"] = sd["model.norm.weight"]
    head = sd["lm_head.weight"]
    if head.shape[0] > 70000:
        # Baichuan v2 "norm head" (reference models/baichuan.py:120,
        # gpt.py:657-663: F.normalize(lm_head.weight) every forward).
        # The weights are frozen at inference, so normalizing once at
        # remap time is exact; the same vocab-size inference hack picks
        # v2 (v1 64k vocab, v2 128k).
        head = head / np.maximum(
            np.linalg.norm(head, axis=1, keepdims=True), 1e-12
        )
    p["lm_head"] = {"kernel": head.T}
    return {"params": p}


def remap_state_dict_hf_btlm(
    state_dict: Mapping[str, Any], cfg: GPTConfig
) -> Dict[str, Any]:
    """HF BTLM-3B state dict -> flax params.

    Parity target: ``remap_state_dict_hf_btlm`` (reference
    flash_attn/models/btlm.py:13-68). GPT-2-heritage Conv1D weights
    ((in, out): no transpose), fused biased ``c_attn``, SwiGLU with
    ``c_fc`` the activated gate and ``c_fc2`` the linear up branch,
    ALiBi positions (no wpe), tied embeddings. The muP multipliers live
    in the config adapter (``btlm_config``), not the weights.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {"transformer": {}}
    t = p["transformer"]
    t["wte"] = {"embedding": sd["transformer.wte.weight"]}
    for i in range(cfg.num_layers):
        pre = f"transformer.h.{i}."
        gate = sd[pre + "mlp.c_fc.weight"]
        up = sd[pre + "mlp.c_fc2.weight"]
        gate_b = sd[pre + "mlp.c_fc.bias"]
        up_b = sd[pre + "mlp.c_fc2.bias"]
        t[f"block_{i}"] = {
            "norm1_scale": sd[pre + "ln_1.weight"],
            "norm1_bias": sd[pre + "ln_1.bias"],
            "norm2_scale": sd[pre + "ln_2.weight"],
            "norm2_bias": sd[pre + "ln_2.bias"],
            "mha": {
                "Wqkv": {
                    "kernel": sd[pre + "attn.c_attn.weight"],
                    "bias": sd[pre + "attn.c_attn.bias"],
                },
                "out_proj": {
                    "kernel": sd[pre + "attn.c_proj.weight"],
                    "bias": sd[pre + "attn.c_proj.bias"],
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": np.concatenate([gate, up], axis=1),
                    "bias": np.concatenate([gate_b, up_b]),
                },
                "fc2": {
                    "kernel": sd[pre + "mlp.c_proj.weight"],
                    "bias": sd[pre + "mlp.c_proj.bias"],
                },
            },
        }
    t["ln_f_scale"] = sd["transformer.ln_f.weight"]
    t["ln_f_bias"] = sd["transformer.ln_f.bias"]
    return {"params": p}


__all__ += [
    "remap_state_dict_hf_bigcode",
    "remap_state_dict_hf_baichuan",
    "remap_state_dict_hf_btlm",
]
