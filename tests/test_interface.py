"""flash_attn_* API-parity layer tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.flash_attn_interface import (
    flash_attn_combine,
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_qkvpacked_func,
    flash_attn_varlen_func,
    flash_attn_with_kvcache,
    get_scheduler_metadata,
)
from liteattention_tpu.ops.attention_ref import attention_ref
from liteattention_tpu.ops.mask import init_mask
from liteattention_tpu.ops.tile_sizes import BlockSizes

BS = BlockSizes(128, 128)


def _bshd(seed, b, s, h, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(k1, (b, s, h, d), jnp.float32),
        jax.random.normal(k2, (b, s, h, d), jnp.float32),
        jax.random.normal(k3, (b, s, h, d), jnp.float32),
    )


def _ref(q, k, v, causal=False, scale=None):
    return attention_ref(
        *(jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v)),
        causal=causal,
        scale=scale,
    )


def test_flash_attn_func_dense_and_packed():
    q, k, v = _bshd(0, 1, 256, 2, 64)
    out = flash_attn_func(q, k, v, block_sizes=BS)
    ref, _ = _ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (0, 2, 1, 3))), np.asarray(ref),
        atol=2e-4,
    )
    qkv = jnp.stack([q, k, v], axis=2)
    out2 = flash_attn_qkvpacked_func(qkv, block_sizes=BS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    kv = jnp.stack([k, v], axis=2)
    out3 = flash_attn_kvpacked_func(q, kv, block_sizes=BS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3))


def test_flash_attn_func_skip_path_and_scheduler_metadata():
    q, k, v = _bshd(1, 1, 256, 2, 64)
    mask = init_mask(1, 2, 256, 256, 128, 128).do_mask
    out, lse, new_mask = flash_attn_func(
        q, k, v, attn_read_list=mask, thr=float("-inf"),
        return_softmax_lse=True, return_skip_mask=True, block_sizes=BS,
    )
    assert bool(jnp.all(new_mask))  # thr=-inf: nothing newly skipped
    kv_idx, count = get_scheduler_metadata(mask)
    assert kv_idx.shape == mask.shape and count.shape == mask.shape[:-1]
    ref, ref_lse = _ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (0, 2, 1, 3))), np.asarray(ref),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_matches_per_sequence(causal):
    h, d = 2, 64
    lens = [96, 160, 64]
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    total = int(cu[-1])
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (total, h, d), jnp.float32)
    k = jax.random.normal(k2, (total, h, d), jnp.float32)
    v = jax.random.normal(k3, (total, h, d), jnp.float32)
    out = flash_attn_varlen_func(
        q, k, v, cu, cu, causal=causal, block_sizes=BS
    )
    # Per-sequence reference.
    for i, ln in enumerate(lens):
        lo, hi = int(cu[i]), int(cu[i + 1])
        ref, _ = attention_ref(
            jnp.transpose(q[lo:hi], (1, 0, 2))[None],
            jnp.transpose(k[lo:hi], (1, 0, 2))[None],
            jnp.transpose(v[lo:hi], (1, 0, 2))[None],
            causal=causal,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(out[lo:hi], (1, 0, 2))),
            np.asarray(ref[0]),
            atol=3e-4,
            err_msg=f"sequence {i}",
        )


def test_kvcache_decode_matches_full():
    b, s_max, h, d = 2, 256, 2, 64
    prefill = [100, 37]
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    k_cache = jnp.zeros((b, s_max, h, d), jnp.float32)
    v_cache = jnp.zeros((b, s_max, h, d), jnp.float32)
    k_full = jax.random.normal(k1, (b, s_max, h, d), jnp.float32)
    v_full = jax.random.normal(k2, (b, s_max, h, d), jnp.float32)
    for i, p in enumerate(prefill):
        k_cache = k_cache.at[i, :p].set(k_full[i, :p])
        v_cache = v_cache.at[i, :p].set(v_full[i, :p])
    lens = jnp.asarray(prefill, jnp.int32)
    # One new token per batch appended at cache_seqlens.
    q = jax.random.normal(k3, (b, 1, h, d), jnp.float32)
    k_new = jnp.stack([k_full[i, p : p + 1] for i, p in enumerate(prefill)])
    v_new = jnp.stack([v_full[i, p : p + 1] for i, p in enumerate(prefill)])
    out, (k_cache2, v_cache2) = flash_attn_with_kvcache(
        q, k_cache, v_cache, k_new, v_new, cache_seqlens=lens,
        block_sizes=BS,
    )
    for i, p in enumerate(prefill):
        ref, _ = attention_ref(
            jnp.transpose(q[i], (1, 0, 2))[None],
            jnp.transpose(k_full[i, : p + 1], (1, 0, 2))[None],
            jnp.transpose(v_full[i, : p + 1], (1, 0, 2))[None],
        )
        np.testing.assert_allclose(
            np.asarray(out[i, 0]),
            np.asarray(ref[0, :, 0]),
            atol=3e-4,
            err_msg=f"batch {i}",
        )
        np.testing.assert_allclose(
            np.asarray(k_cache2[i, p]), np.asarray(k_full[i, p])
        )


def test_combine_shapes():
    n, b, s, h, d = 3, 1, 64, 2, 32
    outs = jax.random.normal(jax.random.PRNGKey(0), (n, b, s, h, d))
    lses = jax.random.normal(jax.random.PRNGKey(1), (n, b, h, s))
    out = flash_attn_combine(outs, lses)
    assert out.shape == (b, s, h, d)
    out2, lse = flash_attn_combine(outs, lses, return_lse=True)
    assert lse.shape == (b, h, s)


def test_kvcache_split_kv_matches_unsplit():
    b, s_max, h, d = 2, 256, 2, 64
    key = jax.random.PRNGKey(9)
    k1, k2, k3 = jax.random.split(key, 3)
    k_cache = jax.random.normal(k1, (b, s_max, h, d), jnp.float32)
    v_cache = jax.random.normal(k2, (b, s_max, h, d), jnp.float32)
    q = jax.random.normal(k3, (b, 1, h, d), jnp.float32)
    lens = jnp.asarray([200, 37], jnp.int32)
    out1 = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, block_sizes=BS
    )
    out2 = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, num_splits=2,
        block_sizes=BS,
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), atol=2e-5, rtol=1e-5
    )


def test_kvcache_page_table_route():
    hk, num_pages, psz, d = 2, 16, 16, 64
    b = 2
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    k_pages = jax.random.normal(k1, (num_pages, psz, hk, d), jnp.float32)
    v_pages = jax.random.normal(k2, (num_pages, psz, hk, d), jnp.float32)
    q = jax.random.normal(k3, (b, 1, hk, d), jnp.float32)
    lens = jnp.asarray([40, 20], jnp.int32)
    tbl = jnp.asarray(
        np.random.RandomState(0).permutation(num_pages)[: b * 4].reshape(
            b, 4
        ),
        jnp.int32,
    )
    out = flash_attn_with_kvcache(
        q, k_pages, v_pages, cache_seqlens=lens, page_table=tbl
    )
    assert out.shape == (b, 1, hk, d)
    # Oracle: gather the pages contiguously per sequence.
    for i in range(b):
        n = int(lens[i])
        kc = k_pages[tbl[i]].reshape(-1, hk, d)[:n]
        vc = v_pages[tbl[i]].reshape(-1, hk, d)[:n]
        ref, _ = attention_ref(
            jnp.transpose(q[i], (1, 0, 2))[None],
            jnp.transpose(kc, (1, 0, 2))[None],
            jnp.transpose(vc, (1, 0, 2))[None],
        )
        np.testing.assert_allclose(
            np.asarray(out[i, 0]), np.asarray(ref[0, :, 0]),
            atol=2e-5, rtol=1e-4, err_msg=f"batch {i}",
        )


def test_kvcache_decode_d128_gqa_folded_path():
    """ADVICE r2 (medium): the d%128==0, s_new=1, bshd-layout serving
    config routes through flash_attention_decode (now the head-folded
    kernel) -- regression-protect it with GQA + cache_seqlens +
    cache_leftpad against the einsum oracle."""
    b, s_max, h, hk, d = 2, 512, 8, 2, 128
    key = jax.random.PRNGKey(17)
    k1, k2, k3 = jax.random.split(key, 3)
    k_cache = jax.random.normal(k1, (b, s_max, hk, d), jnp.float32)
    v_cache = jax.random.normal(k2, (b, s_max, hk, d), jnp.float32)
    q = jax.random.normal(k3, (b, 1, h, d), jnp.float32)
    lens = jnp.asarray([433, 291], jnp.int32)
    leftpad = jnp.asarray([37, 0], jnp.int32)
    out, lse = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, cache_leftpad=leftpad,
        return_softmax_lse=True,
    )
    group = h // hk
    for i in range(b):
        lo, hi = int(leftpad[i]), int(lens[i])
        kc = jnp.repeat(
            jnp.transpose(k_cache[i, lo:hi], (1, 0, 2)), group, axis=0
        )
        vc = jnp.repeat(
            jnp.transpose(v_cache[i, lo:hi], (1, 0, 2)), group, axis=0
        )
        ref, ref_lse = attention_ref(
            jnp.transpose(q[i], (1, 0, 2))[None], kc[None], vc[None]
        )
        np.testing.assert_allclose(
            np.asarray(out[i, 0]), np.asarray(ref[0, :, 0]),
            atol=2e-5, rtol=1e-4, err_msg=f"batch {i}",
        )
        np.testing.assert_allclose(
            np.asarray(lse[i, :, 0]), np.asarray(ref_lse[0, :, 0]),
            atol=2e-5, rtol=1e-4, err_msg=f"lse batch {i}",
        )


@pytest.mark.parametrize("causal", [False, True])
def test_kvcache_varlen_q_matches_per_sequence(causal):
    # Reference flash_attn_interface.py:688-861 varlen-q kvcache: packed
    # q [total_q, H, D] + cu_seqlens_q, packed new k/v + cu_seqlens_k_new,
    # per-sequence caches. Parity oracle: one fixed-shape kvcache call per
    # sequence.
    b, s_max, h, hk, d = 3, 64, 4, 2, 32
    lq = [5, 1, 3]
    lk = [4, 2, 3]
    prefill = [10, 7, 4]
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 5)
    total_q, total_k = sum(lq), sum(lk)
    q = jax.random.normal(ks[0], (total_q, h, d), jnp.float32)
    k_new = jax.random.normal(ks[1], (total_k, hk, d), jnp.float32)
    v_new = jax.random.normal(ks[2], (total_k, hk, d), jnp.float32)
    k_cache = jax.random.normal(ks[3], (b, s_max, hk, d), jnp.float32)
    v_cache = jax.random.normal(ks[4], (b, s_max, hk, d), jnp.float32)
    cu_q = jnp.asarray(np.cumsum([0] + lq), jnp.int32)
    cu_k = jnp.asarray(np.cumsum([0] + lk), jnp.int32)
    lens = jnp.asarray(prefill, jnp.int32)
    out, lse, (kc2, vc2) = flash_attn_with_kvcache(
        q[None].reshape(total_q, h, d),
        k_cache,
        v_cache,
        k_new,
        v_new,
        cache_seqlens=lens,
        cu_seqlens_q=cu_q,
        cu_seqlens_k_new=cu_k,
        max_seqlen_q=max(lq),
        causal=causal,
        return_softmax_lse=True,
        block_sizes=BS,
    )
    assert out.shape == (total_q, h, d)
    assert lse.shape == (h, total_q)
    for i in range(b):
        qi = q[int(cu_q[i]) : int(cu_q[i + 1])][None]
        ki = k_new[int(cu_k[i]) : int(cu_k[i + 1])][None]
        vi = v_new[int(cu_k[i]) : int(cu_k[i + 1])][None]
        ref_out, ref_lse, (kci, vci) = flash_attn_with_kvcache(
            qi,
            k_cache[i : i + 1],
            v_cache[i : i + 1],
            ki,
            vi,
            cache_seqlens=prefill[i],
            causal=causal,
            return_softmax_lse=True,
            block_sizes=BS,
        )
        lo, hi = int(cu_q[i]), int(cu_q[i + 1])
        np.testing.assert_allclose(
            np.asarray(out[lo:hi]),
            np.asarray(ref_out[0]),
            atol=3e-4,
            err_msg=f"sequence {i}",
        )
        np.testing.assert_allclose(
            np.asarray(lse[:, lo:hi]),
            np.asarray(ref_lse[0]),
            atol=3e-4,
            err_msg=f"lse sequence {i}",
        )
        np.testing.assert_allclose(np.asarray(kc2[i]), np.asarray(kci[0]))
        np.testing.assert_allclose(np.asarray(vc2[i]), np.asarray(vci[0]))


def test_kvcache_varlen_q_paged_and_rotary():
    # Varlen-q over a paged pool with rotary applied to q and new k.
    b, psz, pages_per, h, hk, d = 2, 16, 4, 2, 2, 32
    lq = [3, 2]
    lk = [3, 2]
    prefill = [9, 5]
    npages = b * pages_per
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    total_q, total_k = sum(lq), sum(lk)
    q = jax.random.normal(ks[0], (total_q, h, d), jnp.float32)
    k_new = jax.random.normal(ks[1], (total_k, hk, d), jnp.float32)
    v_new = jax.random.normal(ks[2], (total_k, hk, d), jnp.float32)
    k_pool = jax.random.normal(ks[3], (npages, psz, hk, d), jnp.float32)
    v_pool = jax.random.normal(ks[4], (npages, psz, hk, d), jnp.float32)
    ang = jax.random.uniform(ks[5], (64, d // 2), maxval=3.0)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    page_table = jnp.arange(npages, dtype=jnp.int32).reshape(b, pages_per)
    cu_q = jnp.asarray(np.cumsum([0] + lq), jnp.int32)
    cu_k = jnp.asarray(np.cumsum([0] + lk), jnp.int32)
    lens = jnp.asarray(prefill, jnp.int32)
    out, (kp2, vp2) = flash_attn_with_kvcache(
        q,
        k_pool,
        v_pool,
        k_new,
        v_new,
        rotary_cos=cos,
        rotary_sin=sin,
        cache_seqlens=lens,
        page_table=page_table,
        cu_seqlens_q=cu_q,
        cu_seqlens_k_new=cu_k,
        max_seqlen_q=max(lq),
        causal=True,
    )
    for i in range(b):
        qi = q[int(cu_q[i]) : int(cu_q[i + 1])][None]
        ki = k_new[int(cu_k[i]) : int(cu_k[i + 1])][None]
        vi = v_new[int(cu_k[i]) : int(cu_k[i + 1])][None]
        ref_out, (kpi, vpi) = flash_attn_with_kvcache(
            qi,
            k_pool[i * pages_per : (i + 1) * pages_per],
            v_pool[i * pages_per : (i + 1) * pages_per],
            ki,
            vi,
            rotary_cos=cos,
            rotary_sin=sin,
            cache_seqlens=prefill[i],
            page_table=jnp.arange(pages_per, dtype=jnp.int32)[None],
            causal=True,
        )
        lo, hi = int(cu_q[i]), int(cu_q[i + 1])
        np.testing.assert_allclose(
            np.asarray(out[lo:hi]),
            np.asarray(ref_out[0]),
            atol=3e-4,
            err_msg=f"sequence {i}",
        )
        np.testing.assert_allclose(
            np.asarray(kp2[i * pages_per : (i + 1) * pages_per]),
            np.asarray(kpi),
        )


def _chunk_mask(sq, sk, chunk, causal):
    # Reference mask.h:116-119: row's diagonal position is
    # row + sk - sq; allowed cols are within that position's chunk,
    # intersected with (bottom-right) causality.
    row = np.arange(sq)[:, None]
    col = np.arange(sk)[None, :]
    diag = row + sk - sq
    cstart = (diag // chunk) * chunk
    m = (col >= cstart) & (col < cstart + chunk)
    if causal:
        m &= col <= diag
    return m


def _masked_ref(q, k, v, mask):
    # q,k,v: [B,S,H,D]; mask: [Sq, Sk] bool.
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    s = jnp.where(jnp.asarray(mask)[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(256, 256), (128, 384)])
def test_attention_chunk_dense(causal, sq, sk):
    b, h, d, chunk = 1, 2, 32, 96
    q, k, v = _bshd(5, b, max(sq, sk), h, d)
    q = q[:, :sq]
    k, v = k[:, :sk], v[:, :sk]
    out = flash_attn_func(
        q, k, v, causal=causal, attention_chunk=chunk, block_sizes=BS
    )
    ref = _masked_ref(q, k, v, _chunk_mask(sq, sk, chunk, causal))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4
    )


@pytest.mark.parametrize("causal", [False, True])
def test_attention_chunk_varlen(causal):
    # Packed sequences: the chunk grid restarts at each sequence start.
    lens = [130, 70, 56]
    chunk = 64
    total = sum(lens)
    h, d = 2, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (total, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (total, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (total, h, d), jnp.float32)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    out = flash_attn_varlen_func(
        q, k, v, cu, cu, max(lens), max(lens),
        causal=causal, attention_chunk=chunk, block_sizes=BS,
    )
    for i, L in enumerate(lens):
        lo = int(cu[i])
        qi, ki, vi = (x[lo : lo + L][None] for x in (q, k, v))
        ref = _masked_ref(qi, ki, vi, _chunk_mask(L, L, chunk, causal))
        np.testing.assert_allclose(
            np.asarray(out[lo : lo + L]),
            np.asarray(ref[0]),
            atol=3e-4,
            err_msg=f"sequence {i}",
        )


def test_attention_chunk_kvcache():
    # Append path (generic) and single-token decode (kv_low fold).
    b, s_max, h, d, chunk = 2, 256, 2, 32, 64
    prefill = [100, 37]
    ks = jax.random.split(jax.random.PRNGKey(8), 5)
    k_cache = jax.random.normal(ks[0], (b, s_max, h, d), jnp.float32)
    v_cache = jax.random.normal(ks[1], (b, s_max, h, d), jnp.float32)
    lens = jnp.asarray(prefill, jnp.int32)
    for s_new in (1, 5):
        q = jax.random.normal(ks[2], (b, s_new, h, d), jnp.float32)
        out = flash_attn_with_kvcache(
            q, k_cache, v_cache, cache_seqlens=lens, causal=True,
            attention_chunk=chunk, block_sizes=BS,
        )
        for i, p in enumerate(prefill):
            m = _chunk_mask(s_new, p, chunk, True)
            ref = _masked_ref(
                q[i : i + 1], k_cache[i : i + 1, :p],
                v_cache[i : i + 1, :p], m,
            )
            np.testing.assert_allclose(
                np.asarray(out[i]),
                np.asarray(ref[0]),
                atol=3e-4,
                err_msg=f"batch {i} s_new={s_new}",
            )


@pytest.mark.parametrize("causal", [False, True])
def test_kvcache_dense_q_ragged_k_new(causal):
    """Dense q [B, Sq, H, D] + ragged new-KV (cu_seqlens_k_new WITHOUT
    cu_seqlens_q; round 5 -- the reference accepts this combination,
    hopper/_internal/flash_attn_interface.py:688-861). Oracle: one
    fixed-shape call per sequence."""
    b, s_max, sq, h, hk, d = 3, 64, 4, 4, 2, 32
    lk = [5, 2, 0]
    prefill = [9, 6, 3]
    key = jax.random.PRNGKey(13)
    ks = jax.random.split(key, 5)
    total_k = sum(lk)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32)
    k_new = jax.random.normal(ks[1], (total_k, hk, d), jnp.float32)
    v_new = jax.random.normal(ks[2], (total_k, hk, d), jnp.float32)
    k_cache = jax.random.normal(ks[3], (b, s_max, hk, d), jnp.float32)
    v_cache = jax.random.normal(ks[4], (b, s_max, hk, d), jnp.float32)
    cu_k = jnp.asarray(np.cumsum([0] + lk), jnp.int32)
    lens = jnp.asarray(prefill, jnp.int32)
    out, lse, (kc2, vc2) = flash_attn_with_kvcache(
        q,
        k_cache,
        v_cache,
        k_new,
        v_new,
        cache_seqlens=lens,
        cu_seqlens_k_new=cu_k,
        causal=causal,
        return_softmax_lse=True,
        block_sizes=BS,
    )
    assert out.shape == (b, sq, h, d)
    assert lse.shape == (b, h, sq)
    for i in range(b):
        ki = k_new[int(cu_k[i]) : int(cu_k[i + 1])][None]
        vi = v_new[int(cu_k[i]) : int(cu_k[i + 1])][None]
        ref = flash_attn_with_kvcache(
            q[i : i + 1],
            k_cache[i : i + 1],
            v_cache[i : i + 1],
            ki if lk[i] else None,
            vi if lk[i] else None,
            cache_seqlens=prefill[i],
            causal=causal,
            return_softmax_lse=True,
            block_sizes=BS,
        )
        ref_out, ref_lse = ref[0], ref[1]
        kci, vci = ref[2] if lk[i] else (None, None)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref_out[0]), atol=3e-4,
            err_msg=f"sequence {i}",
        )
        np.testing.assert_allclose(
            np.asarray(lse[i]), np.asarray(ref_lse[0]), atol=3e-4,
            err_msg=f"lse sequence {i}",
        )
        if lk[i]:
            np.testing.assert_allclose(
                np.asarray(kc2[i]), np.asarray(kci[0])
            )
            np.testing.assert_allclose(
                np.asarray(vc2[i]), np.asarray(vci[0])
            )
