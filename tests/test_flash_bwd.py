"""Flash backward kernels vs autodiff through the fp32 oracle (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.attention_ref import attention_ref
from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.tile_sizes import BlockSizes

BS = BlockSizes(128, 128)


def _qkv(seed, b, h, s, d, hk=None):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    hk = hk or h
    return (
        jax.random.normal(k1, (b, h, s, d), jnp.float32),
        jax.random.normal(k2, (b, hk, s, d), jnp.float32),
        jax.random.normal(k3, (b, hk, s, d), jnp.float32),
    )


def _loss_flash(q, k, v, causal=False):
    o = flash_attention(q, k, v, causal=causal, block_sizes=BS, interpret=True)
    return jnp.sum(o.astype(jnp.float32) ** 2)


def _loss_ref(q, k, v, causal=False):
    o, _ = attention_ref(q, k, v, causal=causal)
    return jnp.sum(o.astype(jnp.float32) ** 2)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_oracle(causal):
    q, k, v = _qkv(0, 1, 2, 256, 64)
    g1 = jax.grad(_loss_flash, argnums=(0, 1, 2))(q, k, v, causal)
    g2 = jax.grad(_loss_ref, argnums=(0, 1, 2))(q, k, v, causal)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b_),
            atol=2e-3,
            rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_grads_gqa_and_ragged():
    q, k, v = _qkv(1, 1, 4, 300, 64, hk=2)
    g1 = jax.grad(_loss_flash, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        o, _ = attention_ref(
            q, jnp.repeat(k, 2, axis=1), jnp.repeat(v, 2, axis=1)
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b_),
            atol=2e-3,
            rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_grads_with_kv_bound():
    from liteattention_tpu.ops.flash_fwd import flash_attention_masked

    q, k, v = _qkv(2, 2, 2, 256, 64)
    bound = jnp.asarray([100, 200], jnp.int32)

    def loss_masked(q, k, v):
        o = flash_attention_masked(
            q, k, v, kv_bound=bound, block_sizes=BS, interpret=True
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        outs = []
        for i in range(2):
            n = int(bound[i])
            o, _ = attention_ref(
                q[i : i + 1], k[i : i + 1, :, :n], v[i : i + 1, :, :n]
            )
            outs.append(o)
        return jnp.sum(jnp.concatenate(outs).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_masked, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_grads_with_segments():
    from liteattention_tpu.ops.flash_fwd import flash_attention_masked

    q, k, v = _qkv(3, 1, 2, 256, 64)
    seg = jnp.asarray(
        np.concatenate([np.zeros(100), np.ones(156)]), jnp.int32
    )[None]

    def loss_masked(q, k, v):
        o = flash_attention_masked(
            q, k, v, q_segments=seg, kv_segments=seg, block_sizes=BS,
            interpret=True,
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o1, _ = attention_ref(q[:, :, :100], k[:, :, :100], v[:, :, :100])
        o2, _ = attention_ref(q[:, :, 100:], k[:, :, 100:], v[:, :, 100:])
        return jnp.sum(
            jnp.concatenate([o1, o2], axis=2).astype(jnp.float32) ** 2
        )

    g1 = jax.grad(loss_masked, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3,
            err_msg=f"d{name}",
        )
