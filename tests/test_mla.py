"""MLA/GLA attention tests (CPU, interpret mode).

Coverage for the reference's MLA surface
(hopper/_internal/benchmarks/benchmark_mla_decode.py):
* head_dim_v != head_dim_qk in the dense fwd kernel and the kvcache
  decode path (GLA shapes, benchmark_mla_decode.py:44);
* the ``qv`` extra-query term (scores = q.k + qv.v, has_qv path :45,79);
* the absorbed-MLA latent-cache decode kernel (ops/mla.mla_decode /
  flash_mla_with_kvcache), where K and V are lane slices of ONE cache
  array and the kernel streams it once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.flash_attn_interface import (
    flash_attn_func,
    flash_attn_with_kvcache,
    flash_mla_with_kvcache,
)
from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.mla import mla_decode


def _softmax_ref(q, k, v, scale, qv=None, bound=None, causal_sq=None):
    """Oracle on [B, H, S, D] tensors; bound is per-batch key end."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    if qv is not None:
        s = s + jnp.einsum(
            "bhqd,bhkd->bhqk",
            qv.astype(jnp.float32),
            v.astype(jnp.float32),
        )
    s = s * scale
    sk = k.shape[2]
    col = jnp.arange(sk)[None, None, None, :]
    if bound is not None:
        if causal_sq is not None:
            qi = jnp.arange(q.shape[2])[None, None, :, None]
            lim = bound[:, None, None, None] - causal_sq + qi + 1
        else:
            lim = bound[:, None, None, None]
        s = jnp.where(col < lim, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize(
    "d,dv,use_qv",
    [(576, 512, False), (192, 128, False), (64, 512, True)],
)
def test_dense_fwd_unequal_dv(d, dv, use_qv):
    """flash_attention with V in a different head dim (+ optional qv)."""
    b, h, sq, sk = 2, 3, 192, 320
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, sk, dv), jnp.float32)
    qv = (
        jax.random.normal(ks[3], (b, h, sq, dv), jnp.float32)
        if use_qv
        else None
    )
    scale = (d + (dv if use_qv else 0)) ** -0.5
    out = flash_attention(q, k, v, scale=scale, qv=qv, interpret=True)
    ref = _softmax_ref(q, k, v, scale, qv=qv)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_flash_attn_func_qv_mla_scale_default():
    """qv path through the public API; default scale covers d + dv."""
    b, s, h, d, dv = 1, 256, 2, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, dv), jnp.float32)
    qv = jax.random.normal(ks[3], (b, s, h, dv), jnp.float32)
    out = flash_attn_func(q, k, v, qv=qv)
    ref = _softmax_ref(
        *(jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v)),
        (d + dv) ** -0.5,
        qv=jnp.transpose(qv, (0, 2, 1, 3)),
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (0, 2, 1, 3))),
        np.asarray(ref),
        atol=2e-5,
    )


def test_kvcache_decode_unequal_dv_and_qv():
    """flash_attn_with_kvcache with v_cache in a different head dim."""
    b, s_max, h, d, dv = 2, 384, 4, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(ks[1], (b, s_max, h, d), jnp.float32)
    vc = jax.random.normal(ks[2], (b, s_max, h, dv), jnp.float32)
    qv = jax.random.normal(ks[3], (b, 1, h, dv), jnp.float32)
    lens = jnp.array([s_max, s_max // 2], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, qv=qv, cache_seqlens=lens, causal=True
    )
    ref = _softmax_ref(
        jnp.transpose(q, (0, 2, 1, 3)),
        jnp.transpose(kc, (0, 2, 1, 3)),
        jnp.transpose(vc, (0, 2, 1, 3)),
        (d + dv) ** -0.5,
        qv=jnp.transpose(qv, (0, 2, 1, 3)),
        bound=lens,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (0, 2, 1, 3))),
        np.asarray(ref),
        atol=2e-5,
    )


def _mla_oracle(q, kv, lens, dv, scale, causal):
    b, sq, hq, d = q.shape
    s = (
        jnp.einsum(
            "bqhd,bkd->bhqk",
            q.astype(jnp.float32),
            kv.astype(jnp.float32),
        )
        * scale
    )
    col = jnp.arange(kv.shape[1])[None, None, None, :]
    qi = jnp.arange(sq)[None, None, :, None]
    if causal and sq > 1:
        lim = lens[:, None, None, None] - sq + qi + 1
    else:
        lim = lens[:, None, None, None]
    s = jnp.where(col < lim, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkd->bqhd", p, kv[..., :dv].astype(jnp.float32))


@pytest.mark.parametrize(
    "b,sq,hq,d,dv,s,paged",
    [
        (2, 1, 16, 576, 512, 1024, False),  # DeepSeek absorbed decode
        (2, 2, 32, 576, 512, 512, False),  # MTP 2-token verify, causal
        (1, 1, 8, 256, 128, 320, False),  # odd length tail
        (2, 1, 16, 576, 512, 1024, True),  # paged (page_size 64)
    ],
)
def test_mla_decode_oracle(b, sq, hq, d, dv, s, paged):
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    q = jax.random.normal(ks[0], (b, sq, hq, d), jnp.float32)
    kv = jax.random.normal(ks[1], (b, s, d), jnp.float32)
    lens = jnp.asarray(
        [s, s // 2][:b] if b > 1 else [s - 7], jnp.int32
    )
    scale = 1 / d**0.5
    if paged:
        ps = 64
        pp = s // ps
        pages = kv.reshape(b * pp, ps, d)
        tbl = jnp.arange(b * pp, dtype=jnp.int32).reshape(b, pp)
        out, lse = mla_decode(
            q, pages, lens, dv, page_table=tbl, causal=True,
            return_lse=True, interpret=True,
        )
    else:
        out, lse = mla_decode(
            q, kv, lens, dv, causal=True, return_lse=True, interpret=True
        )
    ref = _mla_oracle(q, kv, lens, dv, scale, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # LSE parity on batch 0 (full length): natural-log logsumexp.
    s0 = jnp.einsum(
        "qhd,kd->hqk", q[0].astype(jnp.float32), kv[0].astype(jnp.float32)
    ) * scale
    col0 = jnp.arange(kv.shape[1])[None, None, :]
    qi0 = jnp.arange(sq)[None, :, None]
    lim0 = (
        lens[0] - sq + qi0 + 1 if sq > 1 else lens[0]
    )
    s0 = jnp.where(col0 < lim0, s0, -1e30)
    ref_lse = jax.scipy.special.logsumexp(s0, axis=-1)  # [H, Sq]
    np.testing.assert_allclose(
        np.asarray(lse[0]), np.asarray(ref_lse), atol=2e-4
    )


def test_flash_mla_with_kvcache_wrapper():
    """Reference flash_mla signature: 4D latent cache, (out, lse)."""
    b, hq, d, dv, s = 2, 16, 576, 512, 256
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
    kv = jax.random.normal(ks[1], (b, s, 1, d), jnp.float32)
    lens = jnp.array([s, s - 100], jnp.int32)
    out, lse = flash_mla_with_kvcache(q, kv, None, lens, dv, causal=True)
    ref = _mla_oracle(q, kv[:, :, 0], lens, dv, 1 / d**0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert lse.shape == (b, hq, 1)


def test_mla_decode_matches_shared_cache_kvcache_api():
    """The absorbed kernel == flash_attn_with_kvcache fed K=latent,
    V=latent[..., :dv] as separate tensors (generic path)."""
    b, hq, d, dv, s = 1, 8, 576, 512, 256
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
    kv = jax.random.normal(ks[1], (b, s, d), jnp.float32)
    lens = jnp.array([s - 13], jnp.int32)
    fast = mla_decode(q, kv, lens, dv, causal=True, interpret=True)
    scale = 1 / d**0.5
    generic = flash_attn_with_kvcache(
        q,
        kv[:, :, None, :],
        kv[:, :, None, :dv],
        cache_seqlens=lens,
        softmax_scale=scale,
        causal=True,
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(generic), atol=2e-5
    )


def test_mla_padded_lane_layout_matches_tight():
    """A cache stored at the kernel's NATIVE 640-lane stride (tail
    lanes garbage) must decode identically to the tight-576 cache
    (q's zero pad nullifies the garbage in QK; V reads only dv)."""
    d, dv, hq, b, s = 576, 512, 8, 2, 256
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
    kv = jax.random.normal(ks[1], (b, s, d), jnp.float32)
    lens = jnp.array([s, 200], jnp.int32)
    out_tight = mla_decode(q, kv, lens, dv, causal=True, interpret=True)
    garbage = jax.random.normal(ks[2], (b, s, 64), jnp.float32) * 50.0
    kv_pad = jnp.concatenate([kv, garbage], axis=-1)
    out_pad = mla_decode(q, kv_pad, lens, dv, causal=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out_tight), np.asarray(out_pad)
    )
