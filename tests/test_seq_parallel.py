"""Sequence-parallel LiteAttention on a virtual 8-device CPU mesh.

Multi-device coverage the reference lacks entirely (its distributed tests
need real GPUs + NCCL; SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from liteattention_tpu.ops.attention_ref import attention_ref
from liteattention_tpu.ops.combine import combine_attention
from liteattention_tpu.ops.tile_sizes import BlockSizes
from liteattention_tpu.parallel import make_seq_parallel_attention

BS = BlockSizes(128, 128)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("sp",))


def _qkv(seed, b, h, s, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(k1, (b, h, s, d), jnp.float32),
        jax.random.normal(k2, (b, h, s, d), jnp.float32),
        jax.random.normal(k3, (b, h, s, d), jnp.float32),
    )


def test_combine_matches_full_attention():
    q, k, v = _qkv(0, 1, 2, 512, 64)
    outs, lses = [], []
    for i in range(4):
        ks = k[:, :, i * 128 : (i + 1) * 128]
        vs = v[:, :, i * 128 : (i + 1) * 128]
        o, l = attention_ref(q, ks, vs)
        outs.append(o)
        lses.append(l)
    out, lse = combine_attention(jnp.stack(outs), jnp.stack(lses), axis=0)
    ref, ref_lse = attention_ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("n", [2, 4])
def test_seq_parallel_matches_single_device(n):
    mesh = _mesh(n)
    b, h, s, d = 1, 2, 128 * 2 * n, 64
    q, k, v = _qkv(1, b, h, s, d)
    init_fn, step_fn = make_seq_parallel_attention(
        mesh, "sp", block_sizes=BS
    )
    state = init_fn(b, h, s, s, d, 4)
    out, lse, state = step_fn(state, q, k, v, -10.0)
    ref, ref_lse = attention_ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=1e-4, rtol=1e-5
    )
    assert int(state.step) == 1


def test_seq_parallel_mask_evolves_per_shard():
    mesh = _mesh(4)
    b, h, s, d = 1, 1, 128 * 8, 64
    q, k, v = _qkv(2, b, h, s, d)
    init_fn, step_fn = make_seq_parallel_attention(
        mesh, "sp", block_sizes=BS
    )
    state = init_fn(b, h, s, s, d, 4)
    # thr=+inf: each shard keeps exactly its per-shard anchor tile
    # (independent per-split skip state, reference
    # hopper/lite_attention.py:322-345).
    out, lse, state = step_fn(state, q, k, v, float("inf"))
    do = np.asarray(state.do_mask)  # [B, H, Qt, 8]
    per_shard = do.reshape(do.shape[:-1] + (4, 2))
    assert (per_shard.sum(-1) == 1).all()
    assert per_shard[..., 0].all()
    # Next step still numerically valid (anchor-only attention).
    out2, lse2, state2 = step_fn(state, q, k, v, float("inf"))
    assert np.isfinite(np.asarray(out2)).all()
    assert (np.asarray(state2.do_mask) == do).all()
