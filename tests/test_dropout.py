"""In-kernel attention dropout (reference FA2 dropout semantics:
csrc/flash_attn/src/dropout.h applied to P with 1/(1-p) rescale) and
the split dQ/dKV backward tile tables (VERDICT r2 item 8).

The kernel mask is a counter-based hash of the global position
(ops/flash_fwd.dropout_keep_mask), so the oracle regenerates the exact
mask on the host and tests are exact (not statistical) wherever the
mask enters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.flash_bwd import flash_attention_bwd
from liteattention_tpu.ops.flash_fwd import (
    dropout_keep_mask,
    flash_attention,
    flash_attention_masked,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes

B, H, S, D = 2, 3, 384, 64
P_DROP = 0.25
SEED = jnp.int32(1234)


def _inputs(dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    return [
        jax.random.normal(k, (B, H, S, D), dtype)
        for k in jax.random.split(key, 4)
    ]


def _host_keep(sq=S, sk=S):
    return jnp.stack(
        [
            jnp.stack(
                [
                    dropout_keep_mask(
                        SEED, jnp.int32(bi * H + hi), 0, 0, (sq, sk),
                        P_DROP,
                    )
                    for hi in range(H)
                ]
            )
            for bi in range(B)
        ]
    )


def _ref(q, k, v, keep, scale, causal=False):
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, sc.shape[-2:], 0)
        col = jax.lax.broadcasted_iota(jnp.int32, sc.shape[-2:], 1)
        sc = jnp.where(col <= row, sc, -jnp.inf)
    p = jax.nn.softmax(sc, axis=-1)
    pd = jnp.where(keep, p / (1.0 - P_DROP), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", pd, v)


def test_dropout_fwd_matches_host_mask_oracle():
    q, k, v, _ = _inputs()
    scale = 1.0 / D**0.5
    keep = _host_keep()
    assert 0.70 < float(keep.mean()) < 0.80  # rate ~ 1 - p
    out = flash_attention(
        q, k, v, scale=scale, dropout_p=P_DROP, dropout_seed=SEED,
        block_sizes=BlockSizes(128, 128), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, keep, scale)),
        atol=2e-5, rtol=1e-4,
    )


def test_dropout_mask_is_tile_geometry_invariant():
    q, k, v, _ = _inputs()
    scale = 1.0 / D**0.5
    ref = _ref(q, k, v, _host_keep(), scale)
    for bs in [BlockSizes(256, 384), BlockSizes(384, 128)]:
        out = flash_attention(
            q, k, v, scale=scale, dropout_p=P_DROP, dropout_seed=SEED,
            block_sizes=bs, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4,
        )


def test_dropout_lse_is_dropout_free():
    q, k, v, _ = _inputs()
    scale = 1.0 / D**0.5
    _, lse_d = flash_attention(
        q, k, v, scale=scale, dropout_p=P_DROP, dropout_seed=SEED,
        return_lse=True, interpret=True,
    )
    _, lse = flash_attention(
        q, k, v, scale=scale, return_lse=True, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(lse_d), np.asarray(lse), atol=1e-5, rtol=1e-5
    )


def test_dropout_grads_match_oracle_at_mixed_tiles():
    """Backward regenerates the identical mask even when the bwd tiles
    differ from the fwd tiles AND from each other (dq vs dkv)."""
    q, k, v, do = _inputs()
    scale = 1.0 / D**0.5
    keep = _host_keep()

    out, lse = flash_attention(
        q, k, v, scale=scale, dropout_p=P_DROP, dropout_seed=SEED,
        return_lse=True, block_sizes=BlockSizes(128, 256),
        interpret=True,
    )
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, do, scale, False,
        dq_block_sizes=BlockSizes(256, 128),
        dkv_block_sizes=BlockSizes(128, 384),
        dropout_p=P_DROP, dropout_seed=SEED, interpret=True,
    )
    f = lambda q, k, v: jnp.sum(_ref(q, k, v, keep, scale) * do)
    dq_r, dk_r, dv_r = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for name, a, r in [("dq", dq, dq_r), ("dk", dk, dk_r),
                       ("dv", dv, dv_r)]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=1e-4,
            err_msg=name,
        )


def test_dropout_causal_gqa_autodiff():
    q, k, v, do = _inputs()
    hk = 1
    k, v = k[:, :hk], v[:, :hk]
    scale = 1.0 / D**0.5
    keep = _host_keep()

    f = lambda q, k, v: jnp.sum(
        flash_attention(
            q, k, v, scale=scale, causal=True, dropout_p=P_DROP,
            dropout_seed=SEED, interpret=True,
        )
        * do
    )
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    def ref(q, k, v):
        kk = jnp.repeat(k, H // hk, axis=1)
        vv = jnp.repeat(v, H // hk, axis=1)
        return jnp.sum(_ref(q, kk, vv, keep, scale, causal=True) * do)

    gr = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, r in zip(("dq", "dk", "dv"), g, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=1e-4,
            err_msg=name,
        )


def test_varlen_masked_path_accepts_dropout():
    q, k, v, _ = _inputs()
    scale = 1.0 / D**0.5
    keep = _host_keep()
    out = flash_attention_masked(
        q, k, v, scale=scale, dropout_p=P_DROP, dropout_seed=SEED,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, keep, scale)),
        atol=2e-5, rtol=1e-4,
    )


def test_split_bwd_tiles_match_joint_no_dropout():
    """Regression for the dQ/dKV tile split: different per-kernel tiles
    reproduce the joint-geometry gradients exactly."""
    q, k, v, do = _inputs()
    scale = 1.0 / D**0.5
    out, lse = flash_attention(
        q, k, v, scale=scale, return_lse=True, interpret=True
    )
    joint = flash_attention_bwd(
        q, k, v, out, lse, do, scale, False,
        block_sizes=BlockSizes(128, 128), interpret=True,
    )
    split = flash_attention_bwd(
        q, k, v, out, lse, do, scale, False,
        dq_block_sizes=BlockSizes(256, 128),
        dkv_block_sizes=BlockSizes(128, 256), interpret=True,
    )
    for name, a, r in zip(("dq", "dk", "dv"), split, joint):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-5, rtol=1e-4,
            err_msg=name,
        )


def test_mha_module_dropout_uses_kernel_path():
    """MHA train-mode dropout runs the flash kernel (no [S, S] score
    tensor) and is reproducible from the rng seed."""
    from liteattention_tpu.modules.mha import MHA

    mha = MHA(embed_dim=64, num_heads=4, dropout=0.3, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 64), jnp.float32)
    params = mha.init(jax.random.PRNGKey(2), x)
    det = mha.apply(params, x, deterministic=True)
    rng = jax.random.PRNGKey(3)
    tr1 = mha.apply(params, x, deterministic=False, rngs={"dropout": rng})
    tr2 = mha.apply(params, x, deterministic=False, rngs={"dropout": rng})
    tr3 = mha.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(4)},
    )
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr2))
    assert float(jnp.max(jnp.abs(tr1 - det))) > 1e-3
    assert float(jnp.max(jnp.abs(tr1 - tr3))) > 1e-3


def test_interface_dropout_routing():
    from liteattention_tpu.flash_attn_interface import flash_attn_func

    q = jax.random.normal(jax.random.PRNGKey(5), (2, 128, 4, 64))
    k = jax.random.normal(jax.random.PRNGKey(6), (2, 128, 4, 64))
    v = jax.random.normal(jax.random.PRNGKey(7), (2, 128, 4, 64))
    out = flash_attn_func(q, k, v, dropout_p=0.5, dropout_seed=SEED)
    dense = flash_attn_func(q, k, v)
    assert out.shape == dense.shape
    assert float(jnp.max(jnp.abs(out - dense))) > 1e-3
    # The skip-masked engine is inference-only: dropout must be rejected.
    mask = jnp.ones((2, 4, 1, 1), bool)
    with pytest.raises(AssertionError):
        flash_attn_func(q, k, v, attn_read_list=mask, dropout_p=0.5)
