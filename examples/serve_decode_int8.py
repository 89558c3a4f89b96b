"""Serving-shaped decode demo: prefill -> int8-quantize the KV cache ->
per-token decode on the halved HBM stream.

The pattern for a production serving loop (usage.md "int8 KV cache"):

1. Prefill attends the prompt and fills a float cache.
2. `quantize_kv_cache` calibrates per-(batch, head, channel) scales
   once over the prefill region and int8-izes the cache (half the HBM
   bytes; decode is bandwidth-bound, so steps/s nearly double --
   DECODE_BENCH.json: 1.96x on GQA at cache 4096).
3. Each decode step appends the new K/V row with the frozen scales
   (`quantize_kv_append`) and calls `flash_attn_with_kvcache` with the
   int8 cache + scales.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python examples/serve_decode_int8.py
or CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/serve_decode_int8.py
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.flash_attn_interface import (
    flash_attn_func,
    flash_attn_with_kvcache,
)
from liteattention_tpu.ops.kv_quant import (
    quantize_kv_append,
    quantize_kv_cache,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--heads-kv", type=int, default=4)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--prompt-len", type=int, default=1024)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--tokens", type=int, default=16)
    args = ap.parse_args()
    b, h, hk, d = args.batch, args.heads, args.heads_kv, args.head_dim
    s0, smax = args.prompt_len, args.max_len

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16

    # --- 1. Prefill: causal attention over the prompt; keep K/V.
    q = jax.random.normal(kq, (b, s0, h, d), dt)
    k = jax.random.normal(kk, (b, s0, hk, d), dt)
    v = jax.random.normal(kv, (b, s0, hk, d), dt)
    out_prefill = flash_attn_func(q, k, v, causal=True)
    print(f"prefill: {out_prefill.shape} done")

    # --- 2. Calibrate + quantize the cache once (zero padding beyond
    # the prompt never raises the absmax).
    pad = ((0, 0), (0, smax - s0), (0, 0), (0, 0))
    cache = quantize_kv_cache(jnp.pad(k, pad), jnp.pad(v, pad))
    fp_bytes = 2 * b * smax * hk * d * 2
    i8_bytes = fp_bytes // 2
    print(
        f"cache quantized: {fp_bytes/1e6:.0f} MB bf16 -> "
        f"{i8_bytes/1e6:.0f} MB int8 (+{cache.k_scale.size*8} scale B)"
    )

    # --- 3. Decode loop: append with frozen scales, attend int8.
    @jax.jit
    def decode_step(cache_k, cache_v, ksc, vsc, qtok, ktok, vtok, lens):
        from liteattention_tpu.ops.kv_quant import QuantizedKVCache

        c = QuantizedKVCache(cache_k, cache_v, ksc, vsc)
        c = quantize_kv_append(c, ktok, vtok, lens)
        out = flash_attn_with_kvcache(
            qtok, c.k, c.v, cache_seqlens=lens + 1, causal=True,
            k_cache_scale=c.k_scale, v_cache_scale=c.v_scale,
        )
        return out, c.k, c.v

    lens = jnp.full((b,), s0, jnp.int32)
    ck, cv = cache.k, cache.v
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.tokens):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        qtok = jax.random.normal(r1, (b, 1, h, d), dt)
        ktok = jax.random.normal(r2, (b, 1, hk, d), dt)
        vtok = jax.random.normal(r3, (b, 1, hk, d), dt)
        out, ck, cv = decode_step(
            ck, cv, cache.k_scale, cache.v_scale, qtok, ktok, vtok, lens
        )
        lens = lens + 1
    np.asarray(jnp.sum(out.astype(jnp.float32)))  # hard sync
    dt_s = time.perf_counter() - t0
    print(
        f"decoded {args.tokens} tokens x batch {b}: "
        f"{dt_s/args.tokens*1e3:.2f} ms/step (incl. dispatch; see "
        f"tools/decode_bench.py for kernel-attributable timing)"
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()
    print("ok")


if __name__ == "__main__":
    main()
