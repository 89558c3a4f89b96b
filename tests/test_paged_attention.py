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
