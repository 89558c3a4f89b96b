"""Ring attention (context parallelism over the mesh ring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from liteattention_tpu.ops.attention_ref import attention_ref
from liteattention_tpu.parallel.ring_attention import ring_self_attention


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_oracle(causal):
    mesh = _mesh(4)
    b, h, s, d = 2, 2, 4 * 128, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    ref, _ = attention_ref(q, k, v, causal=causal)
    out = ring_self_attention(q, k, v, mesh, "sp", causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_grads_match_single_device():
    """d(sum(attn))/d{q,k,v} through the ring (scan + ppermute + kernel
    custom VJP) must match the dense oracle's gradients."""
    mesh = _mesh(4)
    b, h, s, d = 1, 2, 4 * 128, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)

    def loss_ring(q, k, v):
        o = ring_self_attention(q, k, v, mesh, "sp", causal=True)
        return jnp.sum(o * (1.0 + 0.01 * o))

    def loss_ref(q, k, v):
        o, _ = attention_ref(q, k, v, causal=True)
        return jnp.sum(o * (1.0 + 0.01 * o))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=3e-4
        )


def test_ring_gqa_and_uneven_batch():
    """GQA k/v (fewer heads) through the ring."""
    mesh = _mesh(8)
    b, h, hk, s, d = 1, 4, 2, 8 * 128, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hk, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hk, s, d), jnp.float32)
    kx = jnp.repeat(k, h // hk, axis=1)
    vx = jnp.repeat(v, h // hk, axis=1)
    ref, _ = attention_ref(q, kx, vx, causal=True)
    out = ring_self_attention(q, k, v, mesh, "sp", causal=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_oracle(causal):
    """Ulysses head-scatter context parallelism == dense oracle.
    Differentiability comes for free (all_to_all + kernel VJP, no merge
    through lse), checked with a grad spot-check."""
    from liteattention_tpu.parallel.ring_attention import (
        ulysses_self_attention,
    )

    mesh = _mesh(4)
    b, h, s, d = 2, 4, 4 * 128, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    ref, _ = attention_ref(q, k, v, causal=causal)
    out = ulysses_self_attention(q, k, v, mesh, "sp", causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
    if causal:
        g = jax.grad(
            lambda q_: jnp.sum(
                ulysses_self_attention(q_, k, v, mesh, "sp", causal=True)
                ** 2
            )
        )(q)
        gr = jax.grad(
            lambda q_: jnp.sum(attention_ref(q_, k, v, causal=True)[0] ** 2)
        )(q)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), atol=3e-4, rtol=3e-4
        )
