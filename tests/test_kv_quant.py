"""int8 KV-cache decode (ops/kv_quant + the folded decode kernel).

The scales fold exactly outside the kernel, so the kernel path is
tested EXACTLY against an oracle over the dequantized cache (any
mismatch there is a kernel bug, not quantization), and the end-to-end
quantization error against the float cache is bounded separately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.flash_fwd import flash_attention_decode
from liteattention_tpu.ops.kv_quant import (
    dequantize_kv_cache,
    quantize_kv_append,
    quantize_kv_cache,
)

B, S, H, HK, D = 2, 384, 8, 2, 128


def _inputs(seed=0, scale_spread=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, HK, H // HK, D), jnp.float32)
    kc = jax.random.normal(ks[1], (B, S, HK, D), jnp.float32)
    vc = jax.random.normal(ks[2], (B, S, HK, D), jnp.float32)
    if scale_spread:
        # Outlier-channel structure: per-channel magnitudes spanning
        # ~30x, the regime per-channel scales exist for.
        mags = jnp.exp(
            jax.random.uniform(
                jax.random.PRNGKey(seed + 9), (1, 1, HK, D),
                minval=-1.5, maxval=1.5,
            )
        )
        kc = kc * mags
        vc = vc * mags[..., ::-1]
    return q, kc, vc


def _oracle(q, kc, vc, bound):
    # q [B, HK, G, D] packed rows; per batch valid keys [0, bound).
    outs = []
    for bi in range(B):
        kk = np.asarray(kc[bi, : int(bound[bi])], np.float64)
        vv = np.asarray(vc[bi, : int(bound[bi])], np.float64)
        o_h = []
        for hj in range(HK):
            qq = np.asarray(q[bi, hj], np.float64)  # [G, D]
            s = qq @ kk[:, hj].T / np.sqrt(D)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            o_h.append(p @ vv[:, hj])
        outs.append(np.stack(o_h))
    return np.stack(outs)  # [B, HK, G, D]


def test_quantize_roundtrip_error_bound():
    _, kc, vc = _inputs()
    cache = quantize_kv_cache(kc, vc)
    kd, vd = dequantize_kv_cache(cache, jnp.float32)
    # Symmetric per-channel absmax: error <= scale/2 per element.
    for orig, deq, sc in [(kc, kd, cache.k_scale), (vc, vd, cache.v_scale)]:
        err = jnp.abs(orig - deq)
        assert float(jnp.max(err / sc[:, None])) <= 0.5 + 1e-3


def test_int8_decode_matches_dequantized_oracle_exactly():
    """The default dequant path must be EXACT vs the dequantized-cache
    oracle: scale folding is algebraically exact, so any gap is a
    kernel bug. The OPT-IN int8-MMA QK path adds bounded per-row q
    rounding (percent-class on outputs)."""
    q, kc, vc = _inputs()
    cache = quantize_kv_cache(kc, vc)
    kd, vd = dequantize_kv_cache(cache, jnp.float32)
    bound = jnp.array([S, 251], jnp.int32)
    out, _ = flash_attention_decode(
        q, cache.k, cache.v, kv_bound=bound,
        k_scale=cache.k_scale, v_scale=cache.v_scale, interpret=True,
        int8_mma=False,
    )
    ref = _oracle(q, kd, vd, np.asarray(bound))
    np.testing.assert_allclose(
        np.asarray(out), ref, atol=3e-5, rtol=1e-4
    )
    # Opt-in int8-MMA QK (the fp8-precision-mode analog): per-row q
    # rounding lands as absolute logit noise, so the output error is
    # percent-class -- bounded here, exactness is NOT claimed.
    out_mma, _ = flash_attention_decode(
        q, cache.k, cache.v, kv_bound=bound,
        k_scale=cache.k_scale, v_scale=cache.v_scale, interpret=True,
        int8_mma=True,
    )
    rel = np.linalg.norm(np.asarray(out_mma) - ref) / np.linalg.norm(
        ref
    )
    assert rel < 8e-2, rel


def test_int8_decode_close_to_float_cache():
    q, kc, vc = _inputs(seed=1)
    cache = quantize_kv_cache(kc, vc)
    bound = jnp.full((B,), S, jnp.int32)
    out, _ = flash_attention_decode(
        q, cache.k, cache.v, kv_bound=bound,
        k_scale=cache.k_scale, v_scale=cache.v_scale, interpret=True,
    )
    ref = _oracle(q, kc, vc, np.asarray(bound))
    rel = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
    # Per-channel symmetric int8: element err ~ absmax/(127*sqrt(12))
    # ~ 0.8% of a unit-variance channel; k and v contribute ~equally
    # -> ~1.4% rel-L2 on the output (measured 1.42e-2). bf16 cache
    # storage alone is ~0.4%, so int8 costs ~3x the storage rounding
    # for 2x the bandwidth.
    assert rel < 2e-2, rel


def test_quantized_append_then_decode():
    q, kc, vc = _inputs(seed=2)
    lens = jnp.array([200, 137], jnp.int32)
    # Calibrate on the valid prefix only (zeros beyond).
    pos = jnp.arange(S)[None, :, None, None]
    valid = pos < lens[:, None, None, None]
    cache = quantize_kv_cache(
        jnp.where(valid, kc, 0.0), jnp.where(valid, vc, 0.0)
    )
    knew = jax.random.normal(jax.random.PRNGKey(7), (B, 1, HK, D))
    vnew = jax.random.normal(jax.random.PRNGKey(8), (B, 1, HK, D))
    cache2 = quantize_kv_append(cache, knew, vnew, lens)
    bound = lens + 1
    out, _ = flash_attention_decode(
        q, cache2.k, cache2.v, kv_bound=bound,
        k_scale=cache2.k_scale, v_scale=cache2.v_scale, interpret=True,
    )
    # Oracle over the float cache with the new row spliced in.
    bi = jnp.arange(B)[:, None]
    kf = kc.at[bi, lens[:, None]].set(knew[:, 0][:, None])
    vf = vc.at[bi, lens[:, None]].set(vnew[:, 0][:, None])
    ref = _oracle(q, kf, vf, np.asarray(bound))
    rel = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


def test_interface_int8_routing():
    from liteattention_tpu.flash_attn_interface import (
        flash_attn_with_kvcache,
    )

    q, kc, vc = _inputs(seed=3)
    qb = jnp.transpose(q.reshape(B, H, 1, D), (0, 2, 1, 3))  # [B,1,H,D]
    cache = quantize_kv_cache(kc, vc)
    lens = jnp.full((B,), S, jnp.int32)
    out = flash_attn_with_kvcache(
        qb, cache.k, cache.v, cache_seqlens=lens, causal=True,
        k_cache_scale=cache.k_scale, v_cache_scale=cache.v_scale,
    )
    ref = flash_attn_with_kvcache(
        qb, kc, vc, cache_seqlens=lens, causal=True
    )
    rel = float(
        jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    )
    assert rel < 2e-2, rel
    # Scales are mandatory with int8 caches; appends are rejected.
    with pytest.raises(AssertionError):
        flash_attn_with_kvcache(qb, cache.k, cache.v, cache_seqlens=lens)
    with pytest.raises(AssertionError):
        flash_attn_with_kvcache(
            qb, cache.k, cache.v,
            k=jnp.zeros((B, 1, HK, D)), v=jnp.zeros((B, 1, HK, D)),
            cache_seqlens=lens,
            k_cache_scale=cache.k_scale, v_cache_scale=cache.v_scale,
        )


def test_int8_paged_decode_matches_dequantized_pool():
    """int8 paged folded decode must EXACTLY match the bf16 folded
    kernel run on the dequantized pool (scale folding is exact), and be
    close to the float pool."""
    from liteattention_tpu.ops.paged_attention import (
        paged_attention_folded,
    )
    from liteattention_tpu.ops.kv_quant import quantize_kv_pages

    page_size, pages_per_seq = 128, 3
    npages = B * pages_per_seq
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32)
    kp = jax.random.normal(ks[1], (npages, page_size, HK, D), jnp.float32)
    vp = jax.random.normal(ks[2], (npages, page_size, HK, D), jnp.float32)
    table = jnp.arange(npages, dtype=jnp.int32).reshape(B, pages_per_seq)
    lengths = jnp.array([page_size * 3, 200], jnp.int32)

    pool = quantize_kv_pages(kp, vp)
    kd = pool.k.astype(jnp.float32) * pool.k_scale
    vd = pool.v.astype(jnp.float32) * pool.v_scale

    # Legacy dequant path (int8_mma=False): scale folding is EXACT.
    out_i8, lse_i8 = paged_attention_folded(
        q, pool.k, pool.v, lengths, table,
        k_scale=pool.k_scale, v_scale=pool.v_scale,
        return_lse=True, interpret=True, int8_mma=False,
    )
    out_ref, lse_ref = paged_attention_folded(
        q, kd, vd, lengths, table, return_lse=True, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_i8), np.asarray(out_ref), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse_i8), np.asarray(lse_ref), atol=3e-5, rtol=1e-4
    )
    out_f = paged_attention_folded(
        q, kp, vp, lengths, table, interpret=True
    )
    rel = np.linalg.norm(np.asarray(out_i8) - np.asarray(out_f)) / (
        np.linalg.norm(np.asarray(out_f))
    )
    assert rel < 2e-2, rel

    # Opt-in int8-MMA QK (round 5, the fp8-precision-mode analog):
    # per-row q rounding lands as absolute logit noise -> percent-class
    # output error; bounded, not exact. Default stays the exact
    # dequant path.
    out_mma = paged_attention_folded(
        q, pool.k, pool.v, lengths, table,
        k_scale=pool.k_scale, v_scale=pool.v_scale, interpret=True,
        int8_mma=True,
    )
    rel_pair = np.linalg.norm(
        np.asarray(out_mma) - np.asarray(out_i8)
    ) / np.linalg.norm(np.asarray(out_i8))
    assert rel_pair < 8e-2, rel_pair


def test_interface_int8_paged_routing():
    from liteattention_tpu.flash_attn_interface import (
        flash_attn_with_kvcache,
    )
    from liteattention_tpu.ops.kv_quant import (
        quantize_kv_pages,
        quantize_pages_append,
    )

    page_size, pages_per_seq = 128, 2
    npages = B * pages_per_seq
    ks = jax.random.split(jax.random.PRNGKey(12), 5)
    q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32)
    kp = jax.random.normal(ks[1], (npages, page_size, HK, D), jnp.float32)
    vp = jax.random.normal(ks[2], (npages, page_size, HK, D), jnp.float32)
    table = jnp.arange(npages, dtype=jnp.int32).reshape(B, pages_per_seq)
    lens = jnp.array([100, 220], jnp.int32)
    # Zero the invalid tail so pool calibration sees valid rows only.
    pos = (
        jnp.arange(npages * page_size).reshape(npages, page_size)
        % (pages_per_seq * page_size)
    )
    ok = (pos < lens[(jnp.arange(npages) // pages_per_seq)][:, None])
    kp = jnp.where(ok[..., None, None], kp, 0.0)
    vp = jnp.where(ok[..., None, None], vp, 0.0)

    pool = quantize_kv_pages(kp, vp)
    knew = jax.random.normal(ks[3], (B, 1, HK, D), jnp.float32)
    vnew = jax.random.normal(ks[4], (B, 1, HK, D), jnp.float32)
    pool = quantize_pages_append(pool, knew, vnew, table, lens)

    out = flash_attn_with_kvcache(
        q, pool.k, pool.v, cache_seqlens=lens + 1, page_table=table,
        causal=True, k_cache_scale=pool.k_scale,
        v_cache_scale=pool.v_scale,
    )
    # Float reference with the same rows appended.
    bi = jnp.arange(B)
    page_of = jnp.take_along_axis(table, (lens // page_size)[:, None], 1)
    kp2 = kp.at[page_of[:, 0], lens % page_size].set(knew[:, 0])
    vp2 = vp.at[page_of[:, 0], lens % page_size].set(vnew[:, 0])
    ref = flash_attn_with_kvcache(
        q, kp2, vp2, cache_seqlens=lens + 1, page_table=table,
        causal=True,
    )
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_interface_int8_native_layout():
    """int8 also rides the TPU-native bhsd cache layout (the serving
    loop's layout): transposing the same quantized cache must give the
    same output as the bshd route."""
    from liteattention_tpu.flash_attn_interface import (
        flash_attn_with_kvcache,
    )

    q, kc, vc = _inputs(seed=4)
    qb = jnp.transpose(q.reshape(B, H, 1, D), (0, 2, 1, 3))
    cache = quantize_kv_cache(kc, vc)
    lens = jnp.array([S, 251], jnp.int32)
    out_bshd = flash_attn_with_kvcache(
        qb, cache.k, cache.v, cache_seqlens=lens, causal=True,
        k_cache_scale=cache.k_scale, v_cache_scale=cache.v_scale,
    )
    kn = jnp.transpose(cache.k, (0, 2, 1, 3))
    vn = jnp.transpose(cache.v, (0, 2, 1, 3))
    out_n = flash_attn_with_kvcache(
        qb, kn, vn, cache_seqlens=lens, causal=True,
        kv_cache_layout="bhsd",
        k_cache_scale=cache.k_scale, v_cache_scale=cache.v_scale,
    )
    np.testing.assert_allclose(
        np.asarray(out_n), np.asarray(out_bshd), atol=3e-5, rtol=1e-4
    )


def test_generation_with_quantized_cache():
    """greedy_decode(quantize_cache=True): the GPT decode loop runs on
    an int8 cache after prefill and produces the same tokens as the
    float cache on a well-separated logit landscape."""
    from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from liteattention_tpu.utils.generation import greedy_decode

    cfg = GPTConfig(
        vocab_size=128,
        max_position_embeddings=64,
        dim=64,
        num_layers=2,
        num_heads=2,
        dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 128)
    params = model.init(jax.random.PRNGKey(1), prompt)
    apply_fn = lambda p, ids, inf: model.apply(
        p, ids, inference_params=inf
    )
    out_fp = greedy_decode(apply_fn, params, prompt, 6, 64)
    out_q = greedy_decode(
        apply_fn, params, prompt, 6, 64, quantize_cache=True
    )
    assert out_q.shape == out_fp.shape
    # Greedy argmax tokens are robust to the ~1e-2 attention error of
    # int8 KV on random-init logits in the vast majority of steps; the
    # first decoded token must match and overall disagreement is small.
    same = np.mean(np.asarray(out_q) == np.asarray(out_fp))
    assert same >= 0.8, same
