"""Dense Pallas flash-attention parity vs the fp32 oracle.

The TPU analog of the reference's FA3 kernel parity suite
(hopper/tests/test_flash_attn.py vs attention_ref), run through the Pallas
interpreter on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.attention_ref import attention_ref
from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.tile_sizes import BlockSizes


def _rand_qkv(key, b, h, s, d, dtype, hk=None):
    k1, k2, k3 = jax.random.split(key, 3)
    hk = hk or h
    q = jax.random.normal(k1, (b, h, s, d), jnp.float32).astype(dtype)
    k = jax.random.normal(k2, (b, hk, s, d), jnp.float32).astype(dtype)
    v = jax.random.normal(k3, (b, hk, s, d), jnp.float32).astype(dtype)
    return q, k, v


def _tolerance(dtype):
    # bf16 inputs: kernel and oracle round p/out through bf16 at
    # different points; a few output ulps of slack.
    return 2e-2 if dtype == jnp.bfloat16 else 2e-4


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("seqlen", [256, 384, 300])
@pytest.mark.parametrize("d", [64, 128])
def test_dense_parity(dtype, seqlen, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 1, 2, seqlen, d, dtype)
    bs = BlockSizes(128, 128)
    out, lse = flash_attention(
        q, k, v, block_sizes=bs, return_lse=True, interpret=True
    )
    ref, ref_lse = attention_ref(q, k, v)
    tol = _tolerance(dtype)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=1e-2, rtol=1e-4
    )


def test_dense_causal():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 2, 2, 256, 64, jnp.float32)
    out = flash_attention(
        q, k, v, causal=True, block_sizes=BlockSizes(128, 128),
        interpret=True,
    )
    ref, _ = attention_ref(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3
    )


def test_dense_gqa():
    q, k, v = _rand_qkv(
        jax.random.PRNGKey(2), 1, 4, 256, 64, jnp.float32, hk=2
    )
    out = flash_attention(
        q, k, v, block_sizes=BlockSizes(128, 128), interpret=True
    )
    k_rep = jnp.repeat(k, 2, axis=1)
    v_rep = jnp.repeat(v, 2, axis=1)
    ref, _ = attention_ref(q, k_rep, v_rep)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3
    )


def test_dense_custom_scale():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 1, 256, 64, jnp.float32)
    out = flash_attention(
        q, k, v, scale=0.5, block_sizes=BlockSizes(128, 128), interpret=True
    )
    ref, _ = attention_ref(q, k, v, scale=0.5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3
    )
