"""Sparse lite kernel: masked-oracle parity + vote semantics.

Config-2/3 checks from BASELINE.json: static skip-mask attention equals
the masked oracle; the fused QK-Skip votes equal the reference-semantics
oracle (:func:`skip_votes_ref`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.attention_ref import attention_ref, skip_votes_ref
from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
from liteattention_tpu.ops.mask import compact_mask, init_mask, update_mask
from liteattention_tpu.ops.tile_sizes import BlockSizes

BS = BlockSizes(128, 128)


def _rand_qkv(seed, b, h, s, d, dtype=jnp.float32, hk=None):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    hk = hk or h
    return (
        jax.random.normal(k1, (b, h, s, d), jnp.float32).astype(dtype),
        jax.random.normal(k2, (b, hk, s, d), jnp.float32).astype(dtype),
        jax.random.normal(k3, (b, hk, s, d), jnp.float32).astype(dtype),
    )


def _run(q, k, v, do_mask, thr=-10.0):
    kv_idx, count = compact_mask(do_mask)
    return lite_flash_attention(
        q,
        k,
        v,
        kv_idx,
        count,
        jnp.float32(thr),
        block_sizes=BS,
        interpret=True,
    )


@pytest.mark.parametrize("seqlen", [256, 300])
def test_full_mask_matches_dense(seqlen):
    q, k, v = _rand_qkv(0, 1, 2, seqlen, 64)
    st = init_mask(1, 2, seqlen, seqlen, 128, 128)
    out, lse, _ = _run(q, k, v, st.do_mask)
    ref, ref_lse = attention_ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=1e-4, rtol=1e-5
    )


def test_static_partial_mask_matches_masked_oracle():
    q, k, v = _rand_qkv(1, 2, 2, 384, 64)
    rng = np.random.RandomState(0)
    do = rng.rand(2, 2, 3, 3) > 0.4
    do[..., 0] = True  # keep anchor
    do_mask = jnp.asarray(do)
    out, lse, _ = _run(q, k, v, do_mask)
    ref, ref_lse = attention_ref(
        q, k, v, tile_mask=do_mask, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=1e-4, rtol=1e-5
    )


def test_votes_match_reference_semantics():
    q, k, v = _rand_qkv(2, 1, 2, 512, 64)
    rng = np.random.RandomState(1)
    do = rng.rand(1, 2, 4, 4) > 0.3
    do[..., 1] = True
    do_mask = jnp.asarray(do)
    thr = -2.0
    _, _, votes = _run(q, k, v, do_mask, thr=thr)
    ref_votes = skip_votes_ref(q, k, do_mask, thr, 128, 128)
    # Compare only at visited positions (unvisited are 1 in both by spec).
    vis = np.asarray(do_mask)
    np.testing.assert_array_equal(
        np.asarray(votes)[vis], np.asarray(ref_votes)[vis]
    )
    np.testing.assert_array_equal(np.asarray(votes)[~vis], 1)


def test_threshold_extremes():
    q, k, v = _rand_qkv(3, 1, 1, 512, 64)
    st = init_mask(1, 1, 512, 512, 128, 128)
    # thr = +inf: every tile after the first visited votes skip.
    _, _, votes = _run(q, k, v, st.do_mask, thr=float("inf"))
    votes = np.asarray(votes)
    assert (votes[..., 0] == 0).all()
    assert (votes[..., 1:] == 1).all()
    # thr = -inf: nothing votes skip.
    _, _, votes = _run(q, k, v, st.do_mask, thr=float("-inf"))
    assert (np.asarray(votes) == 0).all()


def test_mask_evolution_monotone():
    q, k, v = _rand_qkv(4, 1, 2, 512, 64)
    st = init_mask(1, 2, 512, 512, 128, 128)
    prev = np.asarray(st.do_mask)
    for _ in range(3):
        kv_idx, count = compact_mask(st.do_mask)
        _, _, votes = lite_flash_attention(
            q, k, v, kv_idx, count, jnp.float32(-1.0),
            block_sizes=BS, interpret=True,
        )
        st = update_mask(st, votes)
        cur = np.asarray(st.do_mask)
        assert (cur <= prev).all(), "mask must shrink monotonically"
        assert cur.any(axis=-1).all(), "every row keeps >= 1 tile"
        prev = cur


def test_gqa_lite():
    q, k, v = _rand_qkv(5, 1, 4, 256, 64, hk=2)
    st = init_mask(1, 4, 256, 256, 128, 128)
    out, _, _ = _run(q, k, v, st.do_mask)
    ref, _ = attention_ref(
        q, jnp.repeat(k, 2, axis=1), jnp.repeat(v, 2, axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_bf16_lite():
    q, k, v = _rand_qkv(6, 1, 1, 256, 128, dtype=jnp.bfloat16)
    st = init_mask(1, 1, 256, 256, 128, 128)
    out, _, _ = _run(q, k, v, st.do_mask)
    ref, _ = attention_ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        atol=2e-2,
        rtol=2e-2,
    )


def test_votes_match_reference_semantics_gqa():
    q, k, v = _rand_qkv(7, 1, 4, 256, 64, hk=2)
    st = init_mask(1, 4, 256, 256, 128, 128)
    thr = -2.0
    _, _, votes = _run(q, k, v, st.do_mask, thr=thr)
    # Oracle computed against the repeated-KV equivalent.
    ref_votes = skip_votes_ref(
        q, jnp.repeat(k, 2, axis=1), st.do_mask, thr, 128, 128
    )
    np.testing.assert_array_equal(np.asarray(votes), np.asarray(ref_votes))
