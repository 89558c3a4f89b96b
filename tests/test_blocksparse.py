"""FA1-era block-sparse API parity (flash_blocksparse_attn_interface).

Oracle: direct masked softmax at the reference's exact 16 x 256 block
granularity (flash_blocksparse_attention.py:76-81)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.flash_blocksparse import (
    FlashBlocksparseAttention,
    convert_blockmask,
    flash_blocksparse_attn_func,
)


def _oracle(q, k, v, blockmask, causal=False, key_valid=None, scale=None):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else d ** -0.5
    el = np.repeat(np.repeat(np.asarray(blockmask) != 0, 16, 0), 256, 1)
    mask = np.broadcast_to(el[:sq, :sk][None, None], (b, h, sq, sk)).copy()
    if causal:
        mask &= np.tril(np.ones((sq, sk), bool), k=sk - sq)[None, None]
    if key_valid is not None:
        mask &= np.asarray(key_valid)[:, None, None, :]
    s = np.einsum("bqhd,bkhd->bhqk", np.float32(q), np.float32(k)) * scale
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = np.where(mask, p, 0.0)
    denom = p.sum(-1, keepdims=True)
    p = np.where(denom > 0, p / np.maximum(denom, 1e-30), 0.0)
    return np.einsum("bhqk,bkhd->bqhd", p, np.float32(v))


def _pack(q, k, v):
    b, s = q.shape[:2]
    qkv = jnp.stack([q, k, v], axis=2).reshape(b * s, 3, *q.shape[2:])
    cu = np.arange(0, (b + 1) * s, s, dtype=np.int32)
    return qkv, cu


def _group_uniform_mask(rng, s, density=0.6):
    """Layout uniform within 8-row groups -> kernel-representable."""
    qt, kc = s // 128, s // 256
    coarse = rng.random((qt, kc)) < density
    coarse[0, 0] = True  # no fully-masked q rows
    return np.repeat(coarse, 8, axis=0)


def test_convert_blockmask_or_expansion():
    rng = np.random.default_rng(0)
    bm = rng.random((32, 2)) < 0.5
    fine = convert_blockmask(bm)
    assert fine.shape == (4, 4)
    for qt in range(4):
        for kt in range(4):
            assert fine[qt, kt] == bm[qt * 8:(qt + 1) * 8, kt // 2].any()


def test_blocksparse_kernel_path_matches_oracle():
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 512, 4, 64
    key = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                 (b, s, h, d), jnp.float32)
               for i in range(3))
    bm = _group_uniform_mask(rng, s)
    qkv, cu = _pack(q, k, v)
    out = flash_blocksparse_attn_func(qkv, cu, bm, max_s=s)
    out = np.asarray(out).reshape(b, s, h, d)
    ref = _oracle(q, k, v, bm)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_blocksparse_fallback_non_uniform_mask():
    rng = np.random.default_rng(2)
    b, s, h, d = 2, 256, 2, 32
    key = jax.random.PRNGKey(2)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                 (b, s, h, d), jnp.float32)
               for i in range(3))
    bm = rng.random((s // 16, s // 256)) < 0.5  # varies inside groups
    bm[0, 0] = True
    qkv, cu = _pack(q, k, v)
    out = flash_blocksparse_attn_func(qkv, cu, bm, max_s=s)
    out = np.asarray(out).reshape(b, s, h, d)
    ref = _oracle(q, k, v, bm)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_blocksparse_causal_and_ragged():
    rng = np.random.default_rng(3)
    h, d = 2, 32
    lens = [192, 256]
    s = max(lens)
    key = jax.random.PRNGKey(3)
    segs = []
    for i, L in enumerate(lens):
        segs.append(jax.random.normal(jax.random.fold_in(key, i),
                                      (L, 3, h, d), jnp.float32))
    qkv = jnp.concatenate(segs, axis=0)
    cu = np.asarray([0, lens[0], lens[0] + lens[1]], np.int32)
    bm = rng.random((s // 16, 1)) < 0.7
    bm[:2] = True
    out = flash_blocksparse_attn_func(qkv, cu, bm, max_s=s, causal=True)
    # per-sequence oracle
    off = 0
    for i, L in enumerate(lens):
        seg = np.asarray(segs[i])
        q, k, v = (seg[None, :, j] for j in range(3))
        ref = _oracle(q, k, v, bm, causal=True)[0]
        got = np.asarray(out[off:off + L])
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
        off += L


def test_blocksparse_module_key_padding():
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 256, 2, 32
    key = jax.random.PRNGKey(4)
    qkv = jax.random.normal(key, (b, s, 3, h, d), jnp.float32)
    layout = _group_uniform_mask(rng, 512)[: 512 // 16, : 512 // 256]
    mod = FlashBlocksparseAttention(layout, max_seq_length=512)
    valid = np.ones((b, s), bool)
    valid[0, 200:] = False
    out, attn_weights = mod(qkv, key_padding_mask=jnp.asarray(valid))
    assert attn_weights is None  # reference forward returns (out, None)
    bm = layout[: s // 16, : s // 256]
    ref = _oracle(np.asarray(qkv[:, :, 0]), np.asarray(qkv[:, :, 1]),
                  np.asarray(qkv[:, :, 2]), bm, key_valid=valid)
    # Padded query rows are zero-filled (reference pad_input semantics).
    ref = ref * valid[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3,
                               rtol=2e-3)


def test_blocksparse_module_kernel_route():
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 512, 2, 64
    key = jax.random.PRNGKey(5)
    qkv = jax.random.normal(key, (b, s, 3, h, d), jnp.float32)
    layout = _group_uniform_mask(rng, 512)
    mod = FlashBlocksparseAttention(layout, max_seq_length=512)
    out, _ = mod(qkv)
    ref = _oracle(np.asarray(qkv[:, :, 0]), np.asarray(qkv[:, :, 1]),
                  np.asarray(qkv[:, :, 2]), layout)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3,
                               rtol=2e-3)


def test_blocksparse_dropout_and_probs():
    """Fallback extras: dropout keeps/normalizes correctly in
    expectation (exact-mask check at p=0 via return_attn_probs), and
    attention probs row-sum to 1 on live rows."""
    rng = np.random.default_rng(6)
    b, s, h, d = 1, 256, 2, 32
    key = jax.random.PRNGKey(6)
    qkv = jax.random.normal(key, (b * s, 3, h, d), jnp.float32)
    cu = np.asarray([0, s], np.int32)
    bm = rng.random((s // 16, 1)) < 0.6
    bm[0] = True
    out, probs, lse = flash_blocksparse_attn_func(
        qkv, cu, bm, max_s=s, return_attn_probs=True)
    p = np.asarray(probs)
    rowsum = p.sum(-1)
    live = rowsum > 0
    np.testing.assert_allclose(rowsum[live], 1.0, atol=1e-5)
    # lse is the natural-log row logsumexp of the masked scores.
    d = qkv.shape[-1]
    scores = np.einsum(
        "qhd,khd->hqk", np.float32(qkv[:, 0]), np.float32(qkv[:, 1]),
    ) * d ** -0.5
    el = np.repeat(np.repeat(np.asarray(bm) != 0, 16, 0), 256, 1)[:s, :s]
    ref_lse = np.log(np.sum(np.where(el[None], np.exp(
        scores - scores.max(-1, keepdims=True)), 0.0), -1)) \
        + scores.max(-1)
    np.testing.assert_allclose(np.asarray(lse)[0], ref_lse,
                               atol=1e-3, rtol=1e-3)
    # Dropout path runs and zeroes ~p of the mass (smoke, not exact).
    out_d = flash_blocksparse_attn_func(
        qkv, cu, bm, dropout_p=0.5, max_s=s,
        dropout_rng=jax.random.PRNGKey(7))
    assert np.asarray(out_d).shape == np.asarray(out).shape
    assert not np.allclose(np.asarray(out_d), np.asarray(out))
    # dropout without an rng is a clear error, not an opaque TypeError.
    with pytest.raises(ValueError, match="dropout_rng"):
        flash_blocksparse_attn_func(qkv, cu, bm, dropout_p=0.5, max_s=s)


def test_blocksparse_trainable_grads():
    """trainable=True routes to the differentiable fallback; gradients
    are finite even when the mask fully masks some q rows (the -1e30
    finite masking keeps the jnp.where NaN-free under autodiff)."""
    b, s, h, d = 1, 256, 2, 32
    key = jax.random.PRNGKey(8)
    qkv = jax.random.normal(key, (b * s, 3, h, d), jnp.float32)
    cu = np.asarray([0, s], np.int32)
    bm = np.zeros((s // 16, 1), bool)
    bm[:8] = True  # rows 128..255 fully masked
    bm8 = np.repeat(bm.reshape(-1, 8, 1).any(1), 8, 0)  # group-uniform

    def loss(x):
        return jnp.sum(flash_blocksparse_attn_func(
            x, cu, bm8, max_s=s, trainable=True) ** 2)

    g = jax.grad(loss)(qkv)
    assert np.isfinite(np.asarray(g)).all()
    # Forward value matches the oracle (fully-masked rows -> 0 output).
    out_t = np.asarray(flash_blocksparse_attn_func(
        qkv, cu, bm8, max_s=s, trainable=True)).reshape(b, s, h, d)
    x = np.asarray(qkv).reshape(b, s, 3, h, d)
    ref = _oracle(x[:, :, 0], x[:, :, 1], x[:, :, 2], bm8)
    np.testing.assert_allclose(out_t, ref, atol=2e-3, rtol=2e-3)
