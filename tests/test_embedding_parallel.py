"""Vocab/tensor-parallel embeddings + TP GPT forward (VERDICT r2 item 5).

Parity model: reference tests/modules/test_embedding_parallel.py (the
sharded embeddings must reproduce the dense module bit-for-bit up to
reduction order) and the TP GPT forward must match single-device logits
on an 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from liteattention_tpu.models.gpt import (
    GPTConfig,
    GPTLMHeadModel,
    gpt_tp_apply,
)
from liteattention_tpu.parallel.tensor_parallel import (
    column_parallel_embedding,
    parallel_gpt2_embeddings,
    vocab_parallel_embedding,
    vocab_parallel_logits,
)


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("tp",))


def test_vocab_parallel_embedding_matches_dense():
    mesh = _mesh()
    rng = np.random.RandomState(0)
    V, D, B, S = 64, 32, 2, 16
    emb = jnp.asarray(rng.randn(V, D), jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, size=(B, S)), jnp.int32)
    out = jax.jit(
        jax.shard_map(
            lambda ids, e: vocab_parallel_embedding(ids, e),
            mesh=mesh,
            in_specs=(P(), P("tp", None)),
            out_specs=P(),
        )
    )(ids, emb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(emb, ids, axis=0)),
        rtol=1e-6, atol=1e-6,
    )


def test_parallel_gpt2_embeddings_matches_dense():
    mesh = _mesh()
    rng = np.random.RandomState(1)
    V, D, B, S, Pmax = 64, 32, 2, 16, 24
    word = jnp.asarray(rng.randn(V, D), jnp.float32)
    pos = jnp.asarray(rng.randn(Pmax, D), jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, size=(B, S)), jnp.int32)
    dense = jnp.take(word, ids, axis=0) + jnp.take(
        pos, jnp.arange(S), axis=0
    )[None]

    out = jax.jit(
        jax.shard_map(
            lambda ids, w, p: parallel_gpt2_embeddings(ids, w, p),
            mesh=mesh,
            in_specs=(P(), P("tp", None), P(None, "tp")),
            out_specs=P(),
        )
    )(ids, word, pos)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense), rtol=1e-6, atol=1e-6
    )

    # Megatron-SP form: reduce-scatter over the sequence dim.
    out_sp = jax.jit(
        jax.shard_map(
            lambda ids, w, p: parallel_gpt2_embeddings(
                ids, w, p, sequence_parallel=True
            ),
            mesh=mesh,
            in_specs=(P(), P("tp", None), P(None, "tp")),
            out_specs=P(None, "tp", None),
        )
    )(ids, word, pos)
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(dense), rtol=1e-6, atol=1e-6
    )


def test_column_parallel_embedding_shards_features():
    mesh = _mesh()
    rng = np.random.RandomState(2)
    V, D, S = 16, 32, 8
    emb = jnp.asarray(rng.randn(V, D), jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, size=(S,)), jnp.int32)
    out = jax.jit(
        jax.shard_map(
            lambda ids, e: column_parallel_embedding(ids, e),
            mesh=mesh,
            in_specs=(P(), P(None, "tp")),
            out_specs=P(None, "tp"),
        )
    )(ids, emb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(emb, ids, axis=0)),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("tie", [True, False])
def test_gpt_tp_apply_matches_single_device_logits(tie):
    """The full TP GPT forward (vocab-parallel embedding -> head-sharded
    attention -> row/col-parallel MLP -> tied vocab-parallel LM head)
    reproduces the dense model's logits on an 8-device mesh."""
    mesh = _mesh()
    cfg = GPTConfig(
        vocab_size=128,
        max_position_embeddings=32,
        dim=64,
        num_layers=2,
        num_heads=8,
        tie_embeddings=tie,
        dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = jax.random.PRNGKey(0)
    B, S = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 128)
    params = model.init(rng, ids)
    dense_logits = model.apply(params, ids)

    tp_fn = jax.jit(
        jax.shard_map(
            lambda p, ids: gpt_tp_apply(cfg, p, ids),
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=P(None, None, "tp"),
            # pallas_call (the flash kernel) does not thread the vma
            # annotation; same setting as parallel/seq_parallel.py.
            check_vma=False,
        )
    )
    tp_logits = tp_fn(params, ids)
    assert tp_logits.shape == dense_logits.shape
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(dense_logits),
        rtol=2e-4, atol=2e-4,
    )


def test_vocab_parallel_logits_matches_tied_head():
    mesh = _mesh()
    rng = np.random.RandomState(3)
    V, D, B, S = 64, 32, 2, 8
    emb = jnp.asarray(rng.randn(V, D), jnp.float32)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    out = jax.jit(
        jax.shard_map(
            lambda x, e: vocab_parallel_logits(x, e),
            mesh=mesh,
            in_specs=(P(), P("tp", None)),
            out_specs=P(None, None, "tp"),
        )
    )(x, emb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x @ emb.T), rtol=1e-5, atol=1e-5
    )
