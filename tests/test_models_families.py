"""BERT and ViT model-family tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.models.bert import (
    BertConfig,
    BertForPreTraining,
    BertModel,
)
from liteattention_tpu.models.vit import ViTConfig, VisionTransformer


def test_bert_forward_and_padding_invariance():
    cfg = BertConfig.tiny()
    model = BertModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 64), 0, cfg.vocab_size)
    mask = jnp.asarray(
        np.stack([[1] * 40 + [0] * 24, [1] * 64], 0), jnp.int32
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), ids, mask)
    hidden, pooled = model.apply(params, ids, mask)
    assert hidden.shape == (2, 64, cfg.dim) and pooled.shape == (2, cfg.dim)
    # Padding invariance: garbage in masked-out positions must not change
    # valid-position outputs.
    ids2 = ids.at[0, 40:].set((ids[0, 40:] + 7) % cfg.vocab_size)
    hidden2, _ = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(hidden[0, :40], np.float32),
        np.asarray(hidden2[0, :40], np.float32),
        atol=1e-3,
    )


def test_bert_pretraining_heads_and_grads():
    cfg = BertConfig.tiny()
    model = BertForPreTraining(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 64), 0, cfg.vocab_size)
    mask = jnp.ones((1, 64), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), ids, mask)
    mlm, nsp = model.apply(params, ids, mask)
    assert mlm.shape == (1, 64, cfg.vocab_size) and nsp.shape == (1, 2)

    def loss(p):
        mlm, nsp = model.apply(p, ids, mask)
        return jnp.mean(mlm**2) + jnp.mean(nsp**2)

    g = jax.jit(jax.grad(loss))(params)
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(g)
    )


def test_vit_forward():
    cfg = ViTConfig.tiny()
    model = VisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), imgs)
    logits = model.apply(params, imgs)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()
