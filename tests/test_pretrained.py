"""HuggingFace weight-remap parity: our GPT on the Pallas kernels must
reproduce transformers' GPT-2 logits from the same (randomly
initialized, locally constructed) checkpoint.

The TPU analog of the reference's HF-parity model tests
(reference tests/models/test_gpt.py): no network needed -- the HF model
is built locally and its state dict remapped.
"""

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
