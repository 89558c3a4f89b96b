"""Round-2 parity extras: rectangular ALiBi, combine guards, varlen
seqused/window/softcap, kvcache rotary/batch_idx/leftpad/window, paged
append + lse, muP/ALiBi model adapters.

Parity targets: reference hopper/_internal/flash_attn_interface.py
(flash_attn_varlen_func :637-683, flash_attn_with_kvcache :688-861),
flash_attn/models/{baichuan,btlm}.py, and the ALiBi bias convention of
reference tests/test_flash_attn.py attn_bias_from_alibi_slopes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.flash_attn_interface import (
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_varlen_qkvpacked_func,
    flash_attn_with_kvcache,
)
from liteattention_tpu.layers.rotary import rotary_freqs
from liteattention_tpu.ops.attention_ref import attention_ref
from liteattention_tpu.ops.combine import (
    combine_attention,
)
from liteattention_tpu.ops.flash_fwd import flash_attention_masked
from liteattention_tpu.ops.tile_sizes import BlockSizes

BS = BlockSizes(128, 128)


def _bhsd(seed, b, h, s, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(k1, (b, h, s, d), jnp.float32),
        jax.random.normal(k2, (b, h, s, d), jnp.float32),
        jax.random.normal(k3, (b, h, s, d), jnp.float32),
    )


def _alibi_bias(slopes, sq, sk, causal):
    """Reference formula: -slope * |i + sk - sq - j| (plain rel when
    causal; reference tests/test_flash_attn.py
    attn_bias_from_alibi_slopes)."""
    row = np.arange(sq)[:, None]
    col = np.arange(sk)[None, :]
    rel = row + sk - sq - col
    dist = rel if causal else np.abs(rel)
    return -np.asarray(slopes)[None, :, None, None] * dist[None, None]


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(96, 256), (256, 96)])
def test_alibi_rectangular(causal, sq, sk):
    b, h, d = 1, 2, 64
    q, _, _ = _bhsd(0, b, h, sq, d)
    _, k, v = _bhsd(1, b, h, sk, d)
    slopes = jnp.asarray([0.05, 0.4], jnp.float32)
    out, lse = flash_attention_masked(
        q, k, v, alibi_slopes=slopes, causal=causal,
        block_sizes=BS, return_lse=True,
    )
    bias = _alibi_bias(slopes, sq, sk, causal)
    row_ok = np.ones((sq,), bool)
    if causal:
        # Bottom-right alignment (flash_attn >= 2.1): fold the causal
        # mask into the bias; attention_ref's built-in causal is
        # top-left and wrong for rectangular shapes.
        rel = (
            np.arange(sq)[:, None] + sk - sq - np.arange(sk)[None, :]
        )
        bias = np.where(rel[None, None] >= 0, bias, -np.inf)
        row_ok = rel.max(axis=1) >= 0  # rows with >= 1 visible key
    bias = jnp.asarray(
        np.where(np.isneginf(bias), -1e30, bias), jnp.float32
    )
    ref, ref_lse = attention_ref(q, k, v, causal=False, bias=bias)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, row_ok], np.asarray(ref)[:, :, row_ok],
        atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(lse)[:, :, row_ok],
        np.asarray(ref_lse)[:, :, row_ok],
        atol=2e-4,
    )
    if causal and not row_ok.all():
        # Fully-masked rows: kernel store-zero semantics.
        assert np.all(np.asarray(out)[:, :, ~row_ok] == 0.0)
        assert np.all(np.isneginf(np.asarray(lse)[:, :, ~row_ok]))


def test_combine_all_empty_rows_no_nan():
    n, b, h, s, d = 3, 1, 2, 8, 16
    outs = jnp.zeros((n, b, h, s, d), jnp.float32)
    lses = jnp.full((n, b, h, s), -jnp.inf, jnp.float32)
    out, lse = combine_attention(outs, lses, axis=0)
    assert not np.isnan(np.asarray(out)).any()
    assert np.all(np.asarray(out) == 0.0)
    assert np.all(np.isneginf(np.asarray(lse)))


def test_varlen_seqused_k_and_q():
    h, d = 2, 32
    lens = [60, 100]
    used_k = [33, 80]
    used_q = [50, 100]
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    key = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(key[0], (total, h, d), jnp.float32)
    k = jax.random.normal(key[1], (total, h, d), jnp.float32)
    v = jax.random.normal(key[2], (total, h, d), jnp.float32)
    out, lse = flash_attn_varlen_func(
        q, k, v, cu, cu,
        seqused_q=jnp.asarray(used_q, jnp.int32),
        seqused_k=jnp.asarray(used_k, jnp.int32),
        return_softmax_lse=True,
        block_sizes=BS,
    )
    off = 0
    for i, n in enumerate(lens):
        qi = jnp.transpose(q[off : off + used_q[i]], (1, 0, 2))[None]
        ki = jnp.transpose(k[off : off + used_k[i]], (1, 0, 2))[None]
        vi = jnp.transpose(v[off : off + used_k[i]], (1, 0, 2))[None]
        ref, _ = attention_ref(qi, ki, vi)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(out[off : off + used_q[i]], (1, 0, 2))),
            np.asarray(ref[0]),
            atol=3e-4,
            err_msg=f"seq {i}",
        )
        # Dead q rows (beyond seqused_q): zero output, -inf lse.
        if used_q[i] < n:
            dead = np.asarray(out[off + used_q[i] : off + n])
            assert np.all(dead == 0.0)
            assert np.all(
                np.isneginf(np.asarray(lse)[:, off + used_q[i] : off + n])
            )
        off += n


def test_varlen_window_and_softcap():
    h, d = 2, 32
    lens = [70, 58]
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    key = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(key[0], (total, h, d), jnp.float32)
    k = jax.random.normal(key[1], (total, h, d), jnp.float32)
    v = jax.random.normal(key[2], (total, h, d), jnp.float32)
    window = (16, 0)
    cap = 5.0
    out = flash_attn_varlen_func(
        q, k, v, cu, cu, causal=True, window_size=window, softcap=cap,
        block_sizes=BS,
    )
    off = 0
    for i, n in enumerate(lens):
        qf = np.asarray(q[off : off + n], np.float64)
        kf = np.asarray(k[off : off + n], np.float64)
        vf = np.asarray(v[off : off + n], np.float64)
        s = np.einsum("qhd,khd->hqk", qf, kf) / np.sqrt(d)
        s = cap * np.tanh(s / cap)
        row = np.arange(n)[:, None]
        col = np.arange(n)[None, :]
        valid = (col <= row) & (col >= row - window[0])
        s = np.where(valid[None], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("hqk,khd->qhd", p, vf)
        np.testing.assert_allclose(
            np.asarray(out[off : off + n], np.float64), ref, atol=3e-4,
            err_msg=f"seq {i}",
        )
        off += n


def test_varlen_packed_wrappers_match():
    h, d = 2, 32
    lens = [40, 24]
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    key = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(key[0], (total, h, d), jnp.float32)
    k = jax.random.normal(key[1], (total, h, d), jnp.float32)
    v = jax.random.normal(key[2], (total, h, d), jnp.float32)
    base = flash_attn_varlen_func(
        q, k, v, cu, cu, causal=True, block_sizes=BS
    )
    qkv = jnp.stack([q, k, v], axis=1)
    out1 = flash_attn_varlen_qkvpacked_func(
        qkv, cu, causal=True, block_sizes=BS
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out1))
    kv = jnp.stack([k, v], axis=1)
    out2 = flash_attn_varlen_kvpacked_func(
        q, kv, cu, cu, causal=True, block_sizes=BS
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out2))


def _kvcache_inputs(seed, b, s_max, h, d, s_new=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    k_cache = jax.random.normal(ks[0], (b, s_max, h, d), jnp.float32)
    v_cache = jax.random.normal(ks[1], (b, s_max, h, d), jnp.float32)
    q = jax.random.normal(ks[2], (b, s_new, h, d), jnp.float32)
    return q, k_cache, v_cache


def test_kvcache_leftpad():
    b, s_max, h, d = 2, 256, 2, 64
    q, k_cache, v_cache = _kvcache_inputs(11, b, s_max, h, d)
    lens = jnp.asarray([200, 120], jnp.int32)
    leftpad = jnp.asarray([16, 0], jnp.int32)
    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, cache_leftpad=leftpad,
        causal=True, block_sizes=BS,
    )
    for i in range(b):
        lo, hi = int(leftpad[i]), int(lens[i])
        ref, _ = attention_ref(
            jnp.transpose(q[i], (1, 0, 2))[None],
            jnp.transpose(k_cache[i, lo:hi], (1, 0, 2))[None],
            jnp.transpose(v_cache[i, lo:hi], (1, 0, 2))[None],
        )
        np.testing.assert_allclose(
            np.asarray(out[i, 0]), np.asarray(ref[0, :, 0]), atol=3e-4,
            err_msg=f"batch {i}",
        )


def test_kvcache_window():
    b, s_max, h, d = 1, 256, 2, 64
    q, k_cache, v_cache = _kvcache_inputs(13, b, s_max, h, d)
    lens = jnp.asarray([180], jnp.int32)
    left = 32
    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, causal=True,
        window_size=(left, 0), block_sizes=BS,
    )
    # Reference: q (the token at position lens-1... decode position is
    # lens) attends [pos - left, pos] where pos = lens - 1 + 1 == lens?
    # FA alignment: q row 0 of s_new=1 sits at position lens - 1 + 1
    # relative window => keys [lens - 1 - left, lens - 1]. Compute via
    # the window predicate directly: pos = 0 + lens - 1.
    pos = int(lens[0]) - 1
    lo = pos - left
    ref, _ = attention_ref(
        jnp.transpose(q[0], (1, 0, 2))[None],
        jnp.transpose(k_cache[0, lo : pos + 1], (1, 0, 2))[None],
        jnp.transpose(v_cache[0, lo : pos + 1], (1, 0, 2))[None],
    )
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(ref[0, :, 0]), atol=3e-4
    )


def test_kvcache_batch_idx():
    b_cache, b, s_max, h, d = 4, 2, 128, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(17), 4)
    k_cache = jax.random.normal(ks[0], (b_cache, s_max, h, d), jnp.float32)
    v_cache = jax.random.normal(ks[1], (b_cache, s_max, h, d), jnp.float32)
    q = jax.random.normal(ks[2], (b, 1, h, d), jnp.float32)
    k_new = jax.random.normal(ks[3], (b, 1, h, d), jnp.float32)
    v_new = k_new * 0.5
    idx = jnp.asarray([3, 1], jnp.int32)
    lens = jnp.asarray([50, 70], jnp.int32)
    out, (k2, v2) = flash_attn_with_kvcache(
        q, k_cache, v_cache, k_new, v_new, cache_seqlens=lens,
        cache_batch_idx=idx, causal=True, block_sizes=BS,
    )
    for i in range(b):
        ci, n = int(idx[i]), int(lens[i])
        kc = jnp.concatenate([k_cache[ci, :n], k_new[i]], axis=0)
        vc = jnp.concatenate([v_cache[ci, :n], v_new[i]], axis=0)
        ref, _ = attention_ref(
            jnp.transpose(q[i], (1, 0, 2))[None],
            jnp.transpose(kc, (1, 0, 2))[None],
            jnp.transpose(vc, (1, 0, 2))[None],
        )
        np.testing.assert_allclose(
            np.asarray(out[i, 0]), np.asarray(ref[0, :, 0]), atol=3e-4,
            err_msg=f"batch {i}",
        )
        # Cache rows at cache_batch_idx were updated; others untouched.
        np.testing.assert_allclose(
            np.asarray(k2[ci, n]), np.asarray(k_new[i, 0])
        )
    untouched = [j for j in range(b_cache) if j not in [3, 1]]
    for j in untouched:
        np.testing.assert_allclose(
            np.asarray(k2[j]), np.asarray(k_cache[j])
        )


def test_kvcache_rotary_matches_manual():
    b, s_max, h, d = 1, 128, 2, 32
    q, k_cache, v_cache = _kvcache_inputs(19, b, s_max, h, d, s_new=4)
    ks = jax.random.split(jax.random.PRNGKey(23), 2)
    k_new = jax.random.normal(ks[0], (b, 4, h, d), jnp.float32)
    v_new = jax.random.normal(ks[1], (b, 4, h, d), jnp.float32)
    lens = jnp.asarray([40], jnp.int32)
    cos, sin = rotary_freqs(s_max, d)
    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, k_new, v_new,
        rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=lens, causal=True, rotary_interleaved=False,
        block_sizes=BS,
    )[0]
    # Manual: rotate q and k_new at positions lens + i, then call the
    # non-rotary path.
    from liteattention_tpu.layers.rotary import apply_rotary_emb

    pos = int(lens[0])
    q_rot = apply_rotary_emb(q, cos[pos : pos + 4], sin[pos : pos + 4])
    k_rot = apply_rotary_emb(
        k_new, cos[pos : pos + 4], sin[pos : pos + 4]
    )
    out2 = flash_attn_with_kvcache(
        q_rot, k_cache, v_cache, k_rot, v_new, cache_seqlens=lens,
        causal=True, block_sizes=BS,
    )[0]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), atol=1e-5
    )


def test_kvcache_noncausal_default_multitoken():
    # causal defaults to False (reference
    # hopper/_internal/flash_attn_interface.py:709): a multi-token
    # append sees the WHOLE post-append cache from every q row.
    b, s_max, h, d = 1, 128, 2, 32
    q, k_cache, v_cache = _kvcache_inputs(29, b, s_max, h, d, s_new=3)
    ks = jax.random.split(jax.random.PRNGKey(31), 2)
    k_new = jax.random.normal(ks[0], (b, 3, h, d), jnp.float32)
    v_new = jax.random.normal(ks[1], (b, 3, h, d), jnp.float32)
    lens = jnp.asarray([20], jnp.int32)
    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, k_new, v_new, cache_seqlens=lens,
        block_sizes=BS,
    )[0]
    kc = jnp.concatenate([k_cache[0, :20], k_new[0]], axis=0)
    vc = jnp.concatenate([v_cache[0, :20], v_new[0]], axis=0)
    ref, _ = attention_ref(
        jnp.transpose(q[0], (1, 0, 2))[None],
        jnp.transpose(kc, (1, 0, 2))[None],
        jnp.transpose(vc, (1, 0, 2))[None],
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out[0], (1, 0, 2))),
        np.asarray(ref[0]),
        atol=3e-4,
    )


def test_paged_append_prefill_and_lse():
    hk, num_pages, psz, d = 2, 16, 16, 64
    b, s_new = 2, 8
    ks = jax.random.split(jax.random.PRNGKey(37), 5)
    k_pages = jax.random.normal(ks[0], (num_pages, psz, hk, d), jnp.float32)
    v_pages = jax.random.normal(ks[1], (num_pages, psz, hk, d), jnp.float32)
    q = jax.random.normal(ks[2], (b, s_new, hk, d), jnp.float32)
    k_new = jax.random.normal(ks[3], (b, s_new, hk, d), jnp.float32)
    v_new = jax.random.normal(ks[4], (b, s_new, hk, d), jnp.float32)
    lens = jnp.asarray([40, 21], jnp.int32)
    tbl = jnp.asarray(
        np.random.RandomState(1).permutation(num_pages)[: b * 4].reshape(
            b, 4
        ),
        jnp.int32,
    )
    out, lse, (k2, v2) = flash_attn_with_kvcache(
        q, k_pages, v_pages, k_new, v_new, cache_seqlens=lens,
        page_table=tbl, causal=True, return_softmax_lse=True,
    )
    assert out.shape == (b, s_new, hk, d)
    assert lse.shape == (b, hk, s_new)
    for i in range(b):
        n = int(lens[i])
        kc = k2[tbl[i]].reshape(-1, hk, d)[: n + s_new]
        vc = v2[tbl[i]].reshape(-1, hk, d)[: n + s_new]
        # The appended tokens landed in their pages.
        np.testing.assert_allclose(
            np.asarray(kc[n:]), np.asarray(k_new[i]), err_msg=f"batch {i}"
        )
        # Bottom-right causal (q row i sees cols <= n + i); encode as a
        # bias because attention_ref's causal flag is top-left.
        sk_i = n + s_new
        rel = (
            np.arange(s_new)[:, None] + n - np.arange(sk_i)[None, :]
        )
        bias = jnp.asarray(
            np.where(rel[None, None] >= 0, 0.0, -1e30), jnp.float32
        )
        ref, ref_lse = attention_ref(
            jnp.transpose(q[i], (1, 0, 2))[None],
            jnp.transpose(kc, (1, 0, 2))[None],
            jnp.transpose(vc, (1, 0, 2))[None],
            bias=bias,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(out[i], (1, 0, 2))),
            np.asarray(ref[0]),
            atol=3e-4,
            err_msg=f"batch {i}",
        )
        np.testing.assert_allclose(
            np.asarray(lse[i]), np.asarray(ref_lse[0]), atol=2e-4,
            err_msg=f"batch {i}",
        )


def test_paged_decode_lse_route():
    # The ADVICE round-1 medium: return_softmax_lse on the page_table
    # path must return a real lse, not silently misbehave.
    hk, num_pages, psz, d = 2, 8, 16, 32
    b = 2
    ks = jax.random.split(jax.random.PRNGKey(41), 3)
    k_pages = jax.random.normal(ks[0], (num_pages, psz, hk, d), jnp.float32)
    v_pages = jax.random.normal(ks[1], (num_pages, psz, hk, d), jnp.float32)
    q = jax.random.normal(ks[2], (b, 1, hk, d), jnp.float32)
    lens = jnp.asarray([30, 17], jnp.int32)
    tbl = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    out, lse = flash_attn_with_kvcache(
        q, k_pages, v_pages, cache_seqlens=lens, page_table=tbl,
        return_softmax_lse=True,
    )
    assert lse.shape == (b, hk, 1)
    for i in range(b):
        n = int(lens[i])
        kc = k_pages[tbl[i]].reshape(-1, hk, d)[:n]
        vc = v_pages[tbl[i]].reshape(-1, hk, d)[:n]
        ref, ref_lse = attention_ref(
            jnp.transpose(q[i], (1, 0, 2))[None],
            jnp.transpose(kc, (1, 0, 2))[None],
            jnp.transpose(vc, (1, 0, 2))[None],
        )
        np.testing.assert_allclose(
            np.asarray(out[i, 0]), np.asarray(ref[0, :, 0]), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(lse[i, :, 0]), np.asarray(ref_lse[0, :, 0]),
            atol=2e-4,
        )


def test_baichuan_btlm_adapters_smoke():
    from liteattention_tpu.models.configs import baichuan_config, btlm_config
    from liteattention_tpu.models.gpt import GPTLMHeadModel

    for cfg in [
        baichuan_config(dim=6144 // 48, num_layers=2, num_heads=2,
                        vocab=128),  # dim 128 < 5000 -> rotary form
        btlm_config(dim=128, num_layers=2, num_heads=2, vocab=128),
    ]:
        model = GPTLMHeadModel(cfg)
        ids = jax.random.randint(
            jax.random.PRNGKey(0), (1, 32), 0, cfg.vocab_size
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
        logits = model.apply(params, ids)
        assert logits.shape == (1, 32, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_baichuan_13b_style_alibi_forward():
    from liteattention_tpu.models.configs import baichuan_config
    from liteattention_tpu.models.gpt import GPTLMHeadModel

    import dataclasses

    cfg = baichuan_config(dim=5120, num_layers=1, num_heads=40, vocab=64)
    assert cfg.use_alibi and cfg.rotary_emb_dim == 0
    # Run a trimmed-width variant with the same flags to keep CPU cost
    # sane (use_alibi path through the kernel).
    cfg2 = dataclasses.replace(
        cfg, dim=128, num_heads=2, num_layers=1, ffn_dim=256
    )
    model = GPTLMHeadModel(cfg2)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 32), 0, 64)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
    logits = model.apply(params, ids)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_kvcache_native_layout_matches_reference_layout():
    # TPU-native head-major cache layout must be numerically identical
    # to the reference [B, S, Hk, D] layout, for decode and append.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from liteattention_tpu.flash_attn_interface import (
        flash_attn_with_kvcache,
    )

    b, s_max, h, hk, d = 2, 512, 8, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(ks[1], (b, s_max, hk, d), jnp.float32)
    vc = jax.random.normal(ks[2], (b, s_max, hk, d), jnp.float32)
    kn = jax.random.normal(ks[3], (b, 1, hk, d), jnp.float32)
    vn = jax.random.normal(ks[4], (b, 1, hk, d), jnp.float32)
    seqlens = jnp.array([300, 137], jnp.int32)

    out_ref, lse_ref, (kc2, vc2) = flash_attn_with_kvcache(
        q, kc, vc, k=kn, v=vn, cache_seqlens=seqlens, causal=True,
        return_softmax_lse=True,
    )
    kc_n = jnp.transpose(kc, (0, 2, 1, 3))
    vc_n = jnp.transpose(vc, (0, 2, 1, 3))
    out_n, lse_n, (kc2_n, vc2_n) = flash_attn_with_kvcache(
        q, kc_n, vc_n, k=kn, v=vn, cache_seqlens=seqlens, causal=True,
        return_softmax_lse=True, kv_cache_layout="bhsd",
    )
    np.testing.assert_allclose(
        np.asarray(out_n), np.asarray(out_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lse_n), np.asarray(lse_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(kc2_n, (0, 2, 1, 3))),
        np.asarray(kc2),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(vc2_n, (0, 2, 1, 3))),
        np.asarray(vc2),
        atol=0,
    )


def test_kvcache_decode_d128_kernel_path():
    """d=128 single-token decode against a reference-layout (bshd)
    cache routes to the kv_bshd :func:`flash_attention_decode` kernel
    (the realistic serving config) -- regression cover for the default
    PackGQA + cache-layout-direct path (ADVICE r2), with GQA,
    cache_seqlens AND cache_leftpad, vs a softmax oracle.
    """
    from unittest import mock

    import liteattention_tpu.flash_attn_interface as fai

    b, s_max, h, hk, d = 2, 256, 8, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(41), 5)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(ks[1], (b, s_max, hk, d), jnp.float32)
    vc = jax.random.normal(ks[2], (b, s_max, hk, d), jnp.float32)
    kn = jax.random.normal(ks[3], (b, 1, hk, d), jnp.float32)
    vn = jax.random.normal(ks[4], (b, 1, hk, d), jnp.float32)
    seqlens = jnp.array([200, 137], jnp.int32)
    leftpad = jnp.array([0, 16], jnp.int32)

    calls = []
    real = fai.flash_attention_decode

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    with mock.patch.object(fai, "flash_attention_decode", spy):
        out, lse, (k2, v2) = fai.flash_attn_with_kvcache(
            q, kc, vc, k=kn, v=vn, cache_seqlens=seqlens,
            cache_leftpad=leftpad, causal=True,
            return_softmax_lse=True,
        )
    assert calls, "d=128 bshd decode must take the kv_bshd kernel path"

    # Oracle over the post-append cache: keys [leftpad, seqlen+1).
    for bi in range(b):
        lo, hi_ = int(leftpad[bi]), int(seqlens[bi]) + 1
        kk = np.asarray(k2[bi, lo:hi_])  # [L, hk, d]
        vv = np.asarray(v2[bi, lo:hi_])
        kk = np.repeat(kk, h // hk, axis=1)
        vv = np.repeat(vv, h // hk, axis=1)
        qq = np.asarray(q[bi, 0])  # [h, d]
        s = np.einsum("hd,lhd->hl", qq, kk) / np.sqrt(d)
        m = s.max(axis=1, keepdims=True)
        p = np.exp(s - m)
        z = p.sum(axis=1, keepdims=True)
        o_ref = np.einsum("hl,lhd->hd", p / z, vv)
        lse_ref = (m[:, 0] + np.log(z[:, 0]))
        np.testing.assert_allclose(
            np.asarray(out[bi, 0]), o_ref, atol=3e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(lse[bi, :, 0]), lse_ref, atol=3e-5, rtol=1e-4
        )
        # The append landed at position seqlen.
        np.testing.assert_allclose(
            np.asarray(k2[bi, int(seqlens[bi])]), np.asarray(kn[bi, 0])
        )
