"""Paged-KV decode attention vs gathered-cache oracle (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.attention_ref import attention_ref
from liteattention_tpu.ops.paged_attention import paged_attention


@pytest.mark.parametrize("group", [1, 4])
def test_paged_decode_matches_gathered(group):
    b, hk, d = 2, 2, 64
    hq = hk * group
    page_size, num_pages, pages_per_seq = 16, 32, 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (b, hq, d), jnp.float32)
    k_pages = jax.random.normal(
        k2, (hk, num_pages, page_size, d), jnp.float32
    )
    v_pages = jax.random.normal(
        k3, (hk, num_pages, page_size, d), jnp.float32
    )
    lengths = jnp.asarray([100, 37], jnp.int32)
    # Shuffled, non-overlapping page tables per sequence.
    rng = np.random.RandomState(0)
    tbl = rng.permutation(num_pages)[: b * pages_per_seq].reshape(
        b, pages_per_seq
    )
    page_indices = jnp.asarray(tbl, jnp.int32)

    out = paged_attention(
        q, k_pages, v_pages, lengths, page_indices, interpret=True
    )
    assert out.shape == (b, hq, d)

    # Oracle: gather each sequence's pages into a contiguous cache.
    for i in range(b):
        n = int(lengths[i])
        kc = k_pages[:, tbl[i]].reshape(hk, -1, d)[:, :n]
        vc = v_pages[:, tbl[i]].reshape(hk, -1, d)[:, :n]
        kc = jnp.repeat(kc, group, axis=0)
        vc = jnp.repeat(vc, group, axis=0)
        ref, _ = attention_ref(
            q[i][:, None, :][None], kc[None], vc[None]
        )
        np.testing.assert_allclose(
            np.asarray(out[i]),
            np.asarray(ref[0, :, 0]),
            atol=2e-5,
            rtol=1e-4,
            err_msg=f"batch {i}",
        )


@pytest.mark.parametrize(
    "b,hq,hk,sq", [(2, 8, 2, 1), (1, 32, 32, 1), (2, 4, 4, 2)]
)
def test_paged_folded_matches_per_head(b, hq, hk, sq):
    """Round-3 head-folded paged decode (native [np, ps, hk, d] pools,
    no pool transpose) must match the per-head kernel bitwise-close,
    including causal sq>1 and dead-tail page-table entries."""
    from liteattention_tpu.ops.paged_attention import (
        paged_attention_folded,
    )

    d, ps, pps = 128, 64, 6
    rng = np.random.RandomState(11)
    npg = b * pps + 3
    q = jnp.asarray(rng.randn(b, sq, hq, d), jnp.float32)
    kp = jnp.asarray(rng.randn(npg, ps, hk, d), jnp.float32)
    vp = jnp.asarray(rng.randn(npg, ps, hk, d), jnp.float32)
    tbl = jnp.asarray(
        rng.permutation(npg)[: b * pps].reshape(b, pps), jnp.int32
    )
    lens = jnp.asarray(rng.randint(ps, ps * pps, size=(b,)), jnp.int32)
    kpT = jnp.transpose(kp, (2, 0, 1, 3))
    vpT = jnp.transpose(vp, (2, 0, 1, 3))
    o1, l1 = paged_attention(
        q, kpT, vpT, lens, tbl, causal=True, return_lse=True
    )
    o2, l2 = paged_attention_folded(
        q, kp, vp, lens, tbl, causal=True, return_lse=True
    )
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(o2), atol=3e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=3e-5, rtol=1e-5
    )


@pytest.mark.parametrize("pages_per_step", [2, 3, 4])
def test_paged_folded_multi_page_step(pages_per_step):
    """pages_per_step batches N pages into one grid step as parallel
    block streams (DMA-granularity fix for small int8 pages). Any N,
    including non-dividing tails, must match the single-page walk."""
    from liteattention_tpu.ops.paged_attention import (
        paged_attention_folded,
    )

    b, hq, hk, sq, d, ps, pps = 2, 8, 2, 1, 128, 32, 5
    rng = np.random.RandomState(7)
    npg = b * pps + 2
    q = jnp.asarray(rng.randn(b, sq, hq, d), jnp.float32)
    kp = jnp.asarray(rng.randn(npg, ps, hk, d), jnp.float32)
    vp = jnp.asarray(rng.randn(npg, ps, hk, d), jnp.float32)
    tbl = jnp.asarray(
        rng.permutation(npg)[: b * pps].reshape(b, pps), jnp.int32
    )
    lens = jnp.asarray([ps * pps - 7, ps + 3], jnp.int32)
    o1, l1 = paged_attention_folded(
        q, kp, vp, lens, tbl, causal=True, return_lse=True,
        pages_per_step=1,
    )
    oN, lN = paged_attention_folded(
        q, kp, vp, lens, tbl, causal=True, return_lse=True,
        pages_per_step=pages_per_step,
    )
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(oN), atol=2e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(lN), atol=2e-6, rtol=1e-6
    )
