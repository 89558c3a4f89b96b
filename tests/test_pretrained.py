"""HuggingFace weight-remap parity: our GPT on the Pallas kernels must
reproduce transformers' GPT-2 logits from the same (randomly
initialized, locally constructed) checkpoint.

The TPU analog of the reference's HF-parity model tests
(reference tests/models/test_gpt.py): no network needed -- the HF model
is built locally and its state dict remapped.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from liteattention_tpu.utils.pretrained import remap_state_dict_hf_gpt2


def test_gpt2_logit_parity_with_hf():
    hf_cfg = transformers.GPT2Config(
        vocab_size=128,
        n_positions=64,
        n_embd=64,
        n_layer=2,
        n_head=2,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.GPT2LMHeadModel(hf_cfg).eval()

    cfg = GPTConfig(
        vocab_size=128,
        max_position_embeddings=64,
        dim=64,
        num_layers=2,
        num_heads=2,
        eps=hf_cfg.layer_norm_epsilon,
        dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_gpt2(
        hf_model.transformer.state_dict(), cfg
    )

    ids_np = np.random.RandomState(0).randint(0, 128, size=(2, 32))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(ids_np)))
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)


def test_gpt_neox_logit_parity_with_hf():
    """VERDICT r2 item 7: NeoX exercises the UNTIED-norm parallel block
    + partial rotary. Bar: reference flash_attn/models/gpt_neox.py +
    tests/models/test_gpt_neox.py."""
    from liteattention_tpu.models.configs import gpt_neox_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_gpt_neox,
    )

    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=256,
        rotary_pct=0.25,
        hidden_act="gelu",
        max_position_embeddings=64,
        use_parallel_residual=True,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.GPTNeoXForCausalLM(hf_cfg).eval()

    cfg = gpt_neox_config(dim=64, num_layers=2, num_heads=2, vocab=128)
    cfg = dataclasses.replace(
        cfg, eps=hf_cfg.layer_norm_eps, dtype=jnp.float32
    )
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_gpt_neox(hf_model.state_dict(), cfg)

    ids_np = np.random.RandomState(1).randint(0, 128, size=(2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(ids_np)))
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)


def test_falcon_logit_parity_with_hf():
    """VERDICT r2 item 7: Falcon exercises MQA + tied-norm parallel
    block + bias-free projections + tied embeddings. Bar: reference
    flash_attn/models/falcon.py + tests/models/test_falcon.py."""
    from liteattention_tpu.models.configs import falcon_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_falcon,
    )

    hf_cfg = transformers.FalconConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_kv_heads=1,
        multi_query=True,
        parallel_attn=True,
        new_decoder_architecture=False,
        bias=False,
        alibi=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.FalconForCausalLM(hf_cfg).eval()

    cfg = falcon_config(dim=64, num_layers=2, num_heads=4, vocab=128)
    cfg = dataclasses.replace(
        cfg, eps=hf_cfg.layer_norm_epsilon, dtype=jnp.float32
    )
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_falcon(hf_model.state_dict(), cfg)

    ids_np = np.random.RandomState(2).randint(0, 128, size=(2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(ids_np)))
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)


def test_opt_logit_parity_with_hf():
    """OPT exercises learned positions with the HF +2 offset, fused
    biased q/k/v, per-layer final_layer_norm as norm2, and a ReLU MLP.
    Bar: reference flash_attn/models/opt.py + tests/models/test_opt.py."""
    from liteattention_tpu.models.configs import opt_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_opt,
    )

    hf_cfg = transformers.OPTConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        ffn_dim=256,
        max_position_embeddings=64,
        activation_function="relu",
        do_layer_norm_before=True,
        word_embed_proj_dim=64,
        dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.OPTForCausalLM(hf_cfg).eval()

    cfg = opt_config(
        dim=64, num_layers=2, num_heads=2, vocab=128, max_pos=64
    )
    cfg = dataclasses.replace(cfg, ffn_dim=256, dtype=jnp.float32)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_opt(hf_model.state_dict(), cfg)

    ids_np = np.random.RandomState(3).randint(0, 128, size=(2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(ids_np)))
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)


def test_gptj_logit_parity_with_hf():
    """GPT-J exercises the tied-norm parallel block, partial
    INTERLEAVED rotary, bias-free attention + biased MLP, and the
    biased untied lm_head. Bar: reference flash_attn/models/gptj.py +
    tests/models/test_gptj.py."""
    from liteattention_tpu.models.configs import gptj_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_gptj,
    )

    hf_cfg = transformers.GPTJConfig(
        vocab_size=128,
        n_positions=64,
        n_embd=64,
        n_layer=2,
        n_head=2,
        rotary_dim=16,
        activation_function="gelu_new",
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.GPTJForCausalLM(hf_cfg).eval()

    cfg = gptj_config(
        dim=64, num_layers=2, num_heads=2, vocab=128, rotary_dim=16
    )
    cfg = dataclasses.replace(
        cfg, eps=hf_cfg.layer_norm_epsilon, dtype=jnp.float32
    )
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_gptj(hf_model.state_dict(), cfg)

    ids_np = np.random.RandomState(4).randint(0, 128, size=(2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(ids_np)))
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)


def test_bigcode_logit_parity_with_hf():
    """StarCoder/BigCode exercises MQA with the GPT-2-shaped fused
    c_attn (already packed q|kv) + learned positions. Bar: reference
    flash_attn/models/bigcode.py + tests/models/test_bigcode.py."""
    from liteattention_tpu.models.configs import bigcode_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_bigcode,
    )

    hf_cfg = transformers.GPTBigCodeConfig(
        vocab_size=128,
        n_positions=64,
        n_embd=64,
        n_layer=2,
        n_head=4,
        multi_query=True,
        activation_function="gelu_pytorch_tanh",
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.GPTBigCodeForCausalLM(hf_cfg).eval()

    cfg = bigcode_config(
        dim=64, num_layers=2, num_heads=4, vocab=128, max_pos=64
    )
    cfg = dataclasses.replace(
        cfg, eps=hf_cfg.layer_norm_epsilon, dtype=jnp.float32
    )
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_bigcode(hf_model.state_dict(), cfg)

    ids_np = np.random.RandomState(5).randint(0, 128, size=(2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(ids_np)))
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), tree)


def test_baichuan_remap_structure_and_forward():
    """Baichuan's HF class needs trust_remote_code (unavailable
    offline), so the W_pack remap is checked structurally against
    model.init and smoke-run. Bar: reference
    flash_attn/models/baichuan.py remap_state_dict_baichuan."""
    from liteattention_tpu.models.configs import baichuan_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_baichuan,
    )

    dim, nl, vocab = 64, 2, 128
    cfg = baichuan_config(dim=dim, num_layers=nl, num_heads=2,
                          vocab=vocab)
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    ffn = cfg.ffn_dim
    rs = np.random.RandomState(6)
    sd = {"model.embed_tokens.weight": rs.randn(vocab, dim) * 0.02,
          "model.norm.weight": np.ones(dim),
          "lm_head.weight": rs.randn(vocab, dim) * 0.02}
    for i in range(nl):
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.W_pack.weight"] = rs.randn(3 * dim, dim) * 0.02
        sd[pre + "self_attn.o_proj.weight"] = rs.randn(dim, dim) * 0.02
        sd[pre + "mlp.gate_proj.weight"] = rs.randn(ffn, dim) * 0.02
        sd[pre + "mlp.up_proj.weight"] = rs.randn(ffn, dim) * 0.02
        sd[pre + "mlp.down_proj.weight"] = rs.randn(dim, ffn) * 0.02
        sd[pre + "input_layernorm.weight"] = np.ones(dim)
        sd[pre + "post_attention_layernorm.weight"] = np.ones(dim)

    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_baichuan(sd, cfg)
    ids = jnp.asarray(np.random.RandomState(7).randint(0, vocab, (2, 16)))
    init_p = model.init(jax.random.PRNGKey(0), ids)
    assert _tree_shapes(params) == _tree_shapes(
        jax.tree_util.tree_map(np.asarray, init_p)
    )
    logits = model.apply(params, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_btlm_remap_structure_and_forward():
    """BTLM's HF class needs trust_remote_code (unavailable offline);
    the Conv1D/SwiGLU/muP remap is checked structurally and smoke-run
    (muP multipliers assert a nonzero effect). Bar: reference
    flash_attn/models/btlm.py remap_state_dict_hf_btlm."""
    import dataclasses as dc

    from liteattention_tpu.models.configs import btlm_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_btlm,
    )

    dim, nl, vocab = 64, 2, 128
    cfg = btlm_config(dim=dim, num_layers=nl, num_heads=2, vocab=vocab)
    cfg = dc.replace(cfg, ffn_dim=128, dtype=jnp.float32)
    rs = np.random.RandomState(8)
    sd = {"transformer.wte.weight": rs.randn(vocab, dim) * 0.02,
          "transformer.ln_f.weight": np.ones(dim),
          "transformer.ln_f.bias": np.zeros(dim)}
    for i in range(nl):
        pre = f"transformer.h.{i}."
        sd[pre + "attn.c_attn.weight"] = rs.randn(dim, 3 * dim) * 0.02
        sd[pre + "attn.c_attn.bias"] = np.zeros(3 * dim)
        sd[pre + "attn.c_proj.weight"] = rs.randn(dim, dim) * 0.02
        sd[pre + "attn.c_proj.bias"] = np.zeros(dim)
        sd[pre + "mlp.c_fc.weight"] = rs.randn(dim, 128) * 0.02
        sd[pre + "mlp.c_fc.bias"] = np.zeros(128)
        sd[pre + "mlp.c_fc2.weight"] = rs.randn(dim, 128) * 0.02
        sd[pre + "mlp.c_fc2.bias"] = np.zeros(128)
        sd[pre + "mlp.c_proj.weight"] = rs.randn(128, dim) * 0.02
        sd[pre + "mlp.c_proj.bias"] = np.zeros(dim)
        sd[pre + "ln_1.weight"] = np.ones(dim)
        sd[pre + "ln_1.bias"] = np.zeros(dim)
        sd[pre + "ln_2.weight"] = np.ones(dim)
        sd[pre + "ln_2.bias"] = np.zeros(dim)

    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_btlm(sd, cfg)
    ids = jnp.asarray(np.random.RandomState(9).randint(0, vocab, (2, 16)))
    init_p = model.init(jax.random.PRNGKey(0), ids)
    assert _tree_shapes(params) == _tree_shapes(
        jax.tree_util.tree_map(np.asarray, init_p)
    )
    logits = np.asarray(model.apply(params, ids))
    assert np.isfinite(logits).all()
    # muP logits multiplier must bite: doubling it doubles the logits.
    cfg2 = dc.replace(cfg, logits_multiplier=2 * cfg.logits_multiplier)
    logits2 = np.asarray(GPTLMHeadModel(cfg2).apply(params, ids))
    np.testing.assert_allclose(logits2, 2 * logits, rtol=1e-5)


def _baichuan_toy_sd(dim, nl, vocab, ffn, seed=6):
    rs = np.random.RandomState(seed)
    sd = {"model.embed_tokens.weight": rs.randn(vocab, dim) * 0.02,
          "model.norm.weight": 1 + 0.1 * rs.randn(dim),
          "lm_head.weight": rs.randn(vocab, dim) * 0.02}
    for i in range(nl):
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.W_pack.weight"] = rs.randn(3 * dim, dim) * 0.02
        sd[pre + "self_attn.o_proj.weight"] = rs.randn(dim, dim) * 0.02
        sd[pre + "mlp.gate_proj.weight"] = rs.randn(ffn, dim) * 0.02
        sd[pre + "mlp.up_proj.weight"] = rs.randn(ffn, dim) * 0.02
        sd[pre + "mlp.down_proj.weight"] = rs.randn(dim, ffn) * 0.02
        sd[pre + "input_layernorm.weight"] = 1 + 0.1 * rs.randn(dim)
        sd[pre + "post_attention_layernorm.weight"] = 1 + 0.1 * rs.randn(dim)
    return sd


@pytest.mark.parametrize("use_rotary", [True, False])
def test_baichuan_logit_parity_vendored(use_rotary):
    """Logit parity against the vendored numpy re-implementation of HF
    modeling_baichuan.py (tests/_hf_minimal.py) -- the offline stand-in
    for the reference's live-HF test (flash_attn/models/baichuan.py;
    trust_remote_code is unavailable offline). Covers the 7B rotary and
    13B ALiBi variants."""
    from tests._hf_minimal import baichuan_forward
    from liteattention_tpu.models.configs import baichuan_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_baichuan,
    )

    dim, nl, vocab = 64, 2, 128
    cfg = baichuan_config(dim=dim, num_layers=nl, num_heads=2,
                          vocab=vocab)
    cfg = dataclasses.replace(
        cfg, dtype=jnp.float32,
        rotary_emb_dim=(dim // 2 if use_rotary else 0),
        use_alibi=not use_rotary,
    )
    sd = _baichuan_toy_sd(dim, nl, vocab, cfg.ffn_dim)
    params = remap_state_dict_hf_baichuan(sd, cfg)
    ids_np = np.random.RandomState(7).randint(0, vocab, (2, 24))
    ref = baichuan_forward(sd, ids_np, num_heads=2, num_layers=nl,
                           use_rotary=use_rotary)
    logits = np.asarray(
        GPTLMHeadModel(cfg).apply(params, jnp.asarray(ids_np))
    )
    np.testing.assert_allclose(logits, ref, atol=2e-3, rtol=1e-3)


def test_baichuan_v2_norm_head_remap():
    """Vocab > 70k selects the v2 norm-head (reference
    models/baichuan.py:120): remapped lm_head rows are L2-normalized."""
    from liteattention_tpu.models.configs import baichuan_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_baichuan,
    )

    dim, nl, vocab = 16, 1, 70080
    cfg = baichuan_config(dim=dim, num_layers=nl, num_heads=2,
                          vocab=vocab)
    sd = _baichuan_toy_sd(dim, nl, vocab, cfg.ffn_dim)
    params = remap_state_dict_hf_baichuan(sd, cfg)
    head = params["params"]["lm_head"]["kernel"]  # [dim, vocab]
    np.testing.assert_allclose(
        np.linalg.norm(head, axis=0), np.ones(vocab), atol=1e-6
    )


def test_btlm_logit_parity_vendored():
    """Logit parity against the vendored numpy re-implementation of HF
    modeling_btlm.py (tests/_hf_minimal.py): muP embedding/output
    scales, 1/d qk scaling, ALiBi, Conv1D SwiGLU."""
    import dataclasses as dc

    from tests._hf_minimal import btlm_forward
    from liteattention_tpu.models.configs import btlm_config
    from liteattention_tpu.utils.pretrained import remap_state_dict_hf_btlm

    dim, nl, vocab, ffn = 64, 2, 128, 96
    cfg = btlm_config(dim=dim, num_layers=nl, num_heads=2, vocab=vocab)
    cfg = dc.replace(cfg, ffn_dim=ffn, dtype=jnp.float32)
    rs = np.random.RandomState(8)
    sd = {"transformer.wte.weight": rs.randn(vocab, dim) * 0.02,
          "transformer.ln_f.weight": 1 + 0.1 * rs.randn(dim),
          "transformer.ln_f.bias": 0.1 * rs.randn(dim)}
    for i in range(nl):
        pre = f"transformer.h.{i}."
        sd[pre + "attn.c_attn.weight"] = rs.randn(dim, 3 * dim) * 0.02
        sd[pre + "attn.c_attn.bias"] = 0.1 * rs.randn(3 * dim)
        sd[pre + "attn.c_proj.weight"] = rs.randn(dim, dim) * 0.02
        sd[pre + "attn.c_proj.bias"] = 0.1 * rs.randn(dim)
        sd[pre + "mlp.c_fc.weight"] = rs.randn(dim, ffn) * 0.02
        sd[pre + "mlp.c_fc.bias"] = 0.1 * rs.randn(ffn)
        sd[pre + "mlp.c_fc2.weight"] = rs.randn(dim, ffn) * 0.02
        sd[pre + "mlp.c_fc2.bias"] = 0.1 * rs.randn(ffn)
        sd[pre + "mlp.c_proj.weight"] = rs.randn(ffn, dim) * 0.02
        sd[pre + "mlp.c_proj.bias"] = 0.1 * rs.randn(dim)
        sd[pre + "ln_1.weight"] = 1 + 0.1 * rs.randn(dim)
        sd[pre + "ln_1.bias"] = 0.1 * rs.randn(dim)
        sd[pre + "ln_2.weight"] = 1 + 0.1 * rs.randn(dim)
        sd[pre + "ln_2.bias"] = 0.1 * rs.randn(dim)
    params = remap_state_dict_hf_btlm(sd, cfg)
    ids_np = np.random.RandomState(9).randint(0, vocab, (2, 24))
    ref = btlm_forward(sd, ids_np, num_heads=2, num_layers=nl)
    logits = np.asarray(
        GPTLMHeadModel(cfg).apply(params, jnp.asarray(ids_np))
    )
    np.testing.assert_allclose(logits, ref, atol=2e-3, rtol=1e-3)


def test_opt_350m_layout_logit_parity_with_hf():
    """OPT-350m layout (round 5): word_embed_proj_dim != hidden_size
    (project_in/out around the decoder) AND do_layer_norm_before=False
    (post-norm blocks, no final norm). Bar: reference
    models/opt.py opt_config_to_gpt2_config + modules/embedding.py."""
    from liteattention_tpu.models.configs import opt_config
    from liteattention_tpu.utils.pretrained import (
        remap_state_dict_hf_opt,
    )

    hf_cfg = transformers.OPTConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        ffn_dim=256,
        max_position_embeddings=64,
        activation_function="relu",
        do_layer_norm_before=False,
        word_embed_proj_dim=32,
        dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(1)
    hf_model = transformers.OPTForCausalLM(hf_cfg).eval()

    cfg = opt_config(
        dim=64, num_layers=2, num_heads=2, vocab=128, max_pos=64,
        word_embed_proj_dim=32, prenorm=False,
    )
    cfg = dataclasses.replace(cfg, ffn_dim=256, dtype=jnp.float32)
    model = GPTLMHeadModel(cfg)
    params = remap_state_dict_hf_opt(hf_model.state_dict(), cfg)

    ids_np = np.random.RandomState(5).randint(0, 128, size=(2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(ids_np)))
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)
