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


def test_wan_model_sequence_parallel_matches_single_chip():
    """Config 5: Wan model with sp self-attention + ICI-sharded masks
    matches the single-device model."""
    from liteattention_tpu.models.wan import (
        WanConfig,
        WanModel,
        init_skip_states,
    )

    mesh = _mesh(2)
    cfg1 = WanConfig.tiny()
    cfg_sp = WanConfig.tiny()
    import dataclasses

    cfg_sp = dataclasses.replace(cfg_sp, sp_axis="sp")
    model1 = WanModel(cfg1)
    model_sp = WanModel(cfg_sp)
    b, f, h, w = 1, 8, 8, 16  # 256 tokens = 2 k-tiles at block 128
    latents = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg1.in_channels)
    ).astype(jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg1.text_len, cfg1.text_dim)
    ).astype(jnp.float32)
    st1 = init_skip_states(cfg1, b, (f, h, w))
    params = jax.jit(model1.init)(jax.random.PRNGKey(2), latents, t, text, st1)

    out1, new1 = model1.apply(params, latents, t, text, st1, -1.0)

    st_sp = init_skip_states(cfg_sp, b, (f, h, w), mesh=mesh)
    with jax.sharding.set_mesh(mesh):
        out_sp, new_sp = jax.jit(
            lambda p, x, tt, c, s: model_sp.apply(p, x, tt, c, s, -1.0)
        )(params, latents, t, text, st_sp)
    # Per-shard partial outputs quantize through bf16 before the fp32
    # LSE combine; a few bf16 ulps of absolute slack.
    np.testing.assert_allclose(
        np.asarray(out_sp, np.float32),
        np.asarray(out1, np.float32),
        atol=6e-2,
    )
    for i in new1:
        # Per-shard anchors differ from global by construction; compare
        # the vote-driven region (all True at thr=-1 on random init or
        # matching shapes at minimum).
        assert new_sp[i].do_mask.shape == new1[i].do_mask.shape
