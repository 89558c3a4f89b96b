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


def test_sliding_window():
    from liteattention_tpu.ops.flash_fwd import flash_attention_masked

    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 2, 384, 64, jnp.float32)
    out = flash_attention_masked(
        q, k, v, window=(64, 0), causal=True, block_sizes=BlockSizes(128, 128),
        interpret=True,
    )
    # Oracle: causal + sliding window of 64.
    sq = q.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 1)
    bias = jnp.where(
        (col <= row) & (col >= row - 64), 0.0, -0.7 * 3.4e38
    )
    ref, _ = attention_ref(q, k, v, bias=bias[None, None])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4, rtol=1e-3
    )


def test_softcap():
    from liteattention_tpu.ops.flash_fwd import flash_attention_masked

    q, k, v = _rand_qkv(jax.random.PRNGKey(6), 1, 2, 256, 64, jnp.float32)
    cap = 5.0
    out = flash_attention_masked(
        q, k, v, softcap=cap, block_sizes=BlockSizes(128, 128),
        interpret=True,
    )
    scale = 1.0 / 8.0
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST
    ) * scale
    s = cap * jnp.tanh(s / cap)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4, rtol=1e-3
    )
    # Differentiability with softcap.
    g = jax.grad(
        lambda q: jnp.sum(
            flash_attention_masked(
                q, k, v, softcap=cap, block_sizes=BlockSizes(128, 128),
                interpret=True,
            ).astype(jnp.float32) ** 2
        )
    )(q)
    g_ref = jax.grad(
        lambda q: jnp.sum(
            jnp.einsum(
                "bhqk,bhkd->bhqd",
                jax.nn.softmax(
                    cap
                    * jnp.tanh(
                        jnp.einsum(
                            "bhqd,bhkd->bhqk", q, k,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        * scale
                        / cap
                    ),
                    axis=-1,
                ),
                v,
                precision=jax.lax.Precision.HIGHEST,
            )
            ** 2
        )
    )(q)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=2e-3, rtol=1e-2
    )


def test_alibi():
    from liteattention_tpu.ops.flash_fwd import flash_attention_masked

    q, k, v = _rand_qkv(jax.random.PRNGKey(7), 1, 2, 256, 64, jnp.float32)
    slopes = jnp.asarray([0.5, 0.25], jnp.float32)
    out = flash_attention_masked(
        q, k, v, alibi_slopes=slopes, causal=True,
        block_sizes=BlockSizes(128, 128), interpret=True,
    )
    sq = q.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 1)
    bias = -slopes[None, :, None, None] * (row - col).astype(jnp.float32)
    ref, _ = attention_ref(q, k, v, causal=True, bias=bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4, rtol=1e-3
    )


def test_causal_bottom_right_alignment():
    """FA >= 2.1 convention: for sq < sk the last query row aligns with
    the last key column (suffix scoring / chunked prefill)."""
    from liteattention_tpu.ops.flash_fwd import flash_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(8), 1, 2, 256, 64, jnp.float32)
    q_tail = q[:, :, -32:]
    out = flash_attention(
        q_tail, k, v, causal=True, block_sizes=BlockSizes(128, 128),
        interpret=True,
    )
    full = flash_attention(
        q, k, v, causal=True, block_sizes=BlockSizes(128, 128),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full[:, :, -32:]), atol=2e-5, rtol=1e-4
    )


def test_fully_masked_rows_zero_output():
    """A q segment with zero kv tokens must produce zero output and -inf
    lse (reference store_zero), not the mean of V."""
    from liteattention_tpu.ops.flash_fwd import flash_attention_masked

    q, k, v = _rand_qkv(jax.random.PRNGKey(9), 2, 1, 128, 64, jnp.float32)
    bound = jnp.asarray([0, 64], jnp.int32)  # batch 0 sees nothing
    out, lse = flash_attention_masked(
        q, k, v, kv_bound=bound, block_sizes=BlockSizes(128, 128),
        return_lse=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out[0]), 0.0)
    assert np.all(np.isneginf(np.asarray(lse[0])))
    assert np.isfinite(np.asarray(out[1])).all()
    # Gradients through the empty batch stay finite (zero).
    g = jax.grad(
        lambda q: jnp.sum(
            flash_attention_masked(
                q, k, v, kv_bound=bound, block_sizes=BlockSizes(128, 128),
                interpret=True,
            ).astype(jnp.float32) ** 2
        )
    )(q)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g[0]), 0.0)


def test_alibi_per_batch_slopes():
    from liteattention_tpu.ops.flash_fwd import flash_attention_masked

    q, k, v = _rand_qkv(jax.random.PRNGKey(10), 2, 2, 128, 64, jnp.float32)
    slopes = jnp.asarray([[0.5, 0.25], [0.1, 0.05]], jnp.float32)
    out = flash_attention_masked(
        q, k, v, alibi_slopes=slopes, causal=True,
        block_sizes=BlockSizes(128, 128), interpret=True,
    )
    sq = q.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 1)
    bias = -slopes[:, :, None, None] * (row - col).astype(jnp.float32)
    ref, _ = attention_ref(q, k, v, causal=True, bias=bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4, rtol=1e-3
    )
