"""On-chip decode (serving) benchmark: flash_attn_with_kvcache + paged.

Autoregressive decode attention is HBM-bandwidth-bound: each step reads
the whole KV cache once (2 * B * Hk * S * D elements). This measures
the achieved cache-read bandwidth of the kvcache paths -- contiguous,
GQA, split-KV, and paged -- against the v5e HBM peak (~819 GB/s), plus
decode steps/s.

Methodology: sub-millisecond kernels CANNOT be timed per-dispatch here
-- the axon tunnel has a ~1-3.5 ms per-call dispatch floor even for a
no-op (measured). Each configuration therefore runs STEPS decode
iterations inside one jitted lax.fori_loop with a serial q dependence
(out feeds the next step's q), and per-step time = call time / STEPS.

Round-3 finding: EVEN INSIDE one jitted fori_loop, every pallas_call
(tpu_custom_call) on this stack costs a flat ~0.9 ms -- a no-op
(128, 128) copy kernel measures 0.93 ms/step in the identical loop
(tools round-3 experiments; marginal cost of adding cache bytes to the
real kernel is ~65-80% of HBM peak). The floor is launch/dispatch
plumbing of this measurement stack, not kernel work, so the benchmark
now measures it explicitly per run and reports BOTH raw and
floor-corrected (kernel-attributable) bandwidth.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/decode_bench.py
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBPS = 819.0


def sync(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


STEPS = 32


def timeit_loop(step_fn, q0, *args, iters=8, warmup=2):
    """Median per-step seconds of STEPS serialized decode steps in one
    jitted fori_loop (one dispatch; hides the tunnel's ms-scale
    dispatch floor)."""

    @jax.jit
    def run(q, *a):
        def body(i, qq):
            out = step_fn(qq, *a)
            # Serial dependence: the next step's q depends on this
            # step's output, so the loop cannot be collapsed.
            return (qq + out * 1e-6).astype(qq.dtype)

        return jax.lax.fori_loop(0, STEPS, body, q)

    for _ in range(warmup):
        sync(run(q0, *args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(q0, *args)
        sync(out)
        samples.append((time.perf_counter() - t0) / STEPS)
    return float(np.median(samples))


def measure_call_floor():
    """Per-pallas_call flat overhead of this measurement stack: a no-op
    (128, 128) copy kernel timed in the same serialized fori_loop the
    decode configs use."""
    from jax.experimental import pallas as pl

    def tiny_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.000001

    def tiny(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(x)

    x = jnp.ones((128, 128), jnp.float32)

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, STEPS, lambda i, xx: tiny(xx), x)

    for _ in range(2):
        sync(run(x))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        o = run(x)
        sync(o)
        ts.append((time.perf_counter() - t0) / STEPS)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--heads-kv", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--cache-len", type=int, default=4096)
    ap.add_argument("--page-size", type=int, default=256)
    args = ap.parse_args()

    from liteattention_tpu.flash_attn_interface import (
        flash_attn_with_kvcache,
    )

    b, h, hk, d, s = (
        args.batch, args.heads, args.heads_kv, args.head_dim,
        args.cache_len,
    )
    print(f"backend={jax.default_backend()} b={b} h={h} hk={hk} "
          f"d={d} cache={s}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    results = {}

    def cache_gb(hk_):
        return 2 * b * hk_ * s * d * 2 / 1e9

    floor = measure_call_floor()
    print(f"per-pallas_call floor (no-op kernel): {floor*1e3:.3f} ms")

    def report(name, t, hk_):
        bw = cache_gb(hk_) / t
        t_k = max(t - floor, 1e-6)
        bw_k = cache_gb(hk_) / t_k
        results[name] = dict(
            ms=round(t * 1e3, 3),
            steps_per_s=round(1.0 / t, 1),
            cache_read_gbps=round(bw, 1),
            hbm_util=round(bw / V5E_HBM_GBPS, 3),
            ms_minus_floor=round(t_k * 1e3, 3),
            kernel_gbps=round(bw_k, 1),
            kernel_hbm_util=round(bw_k / V5E_HBM_GBPS, 3),
        )
        print(f"{name:22s}: {t*1e3:7.3f} ms  {1.0/t:7.1f} steps/s  "
              f"{bw:6.1f} GB/s ({bw/V5E_HBM_GBPS:.0%} raw) | "
              f"kernel {t_k*1e3:6.3f} ms {bw_k:6.1f} GB/s "
              f"({bw_k/V5E_HBM_GBPS:.0%})")

    # MHA decode (hk == h), full cache valid.
    for label, nheads_kv, num_splits in [
        ("decode_mha", h, 1),
        ("decode_gqa", hk, 1),
        ("decode_gqa_split8", hk, 8),
    ]:
        q = jax.random.normal(ks[0], (b, 1, h, d), jnp.bfloat16)
        kc = jax.random.normal(ks[1], (b, s, nheads_kv, d), jnp.bfloat16)
        vc = jax.random.normal(ks[2], (b, s, nheads_kv, d), jnp.bfloat16)
        seqlens = jnp.full((b,), s, jnp.int32)

        def step(q, kc, vc, sl, ns=num_splits):
            return flash_attn_with_kvcache(
                q, kc, vc, cache_seqlens=sl, causal=True, num_splits=ns
            )

        t = timeit_loop(step, q, kc, vc, seqlens)
        report(label, t, nheads_kv)

        if num_splits == 1:
            # TPU-native head-major cache layout: contiguous per-head
            # streams instead of 256-byte strided bursts.
            kcn = jnp.transpose(kc, (0, 2, 1, 3))
            vcn = jnp.transpose(vc, (0, 2, 1, 3))

            def step_n(q, kc, vc, sl):
                return flash_attn_with_kvcache(
                    q, kc, vc, cache_seqlens=sl, causal=True,
                    kv_cache_layout="bhsd",
                )

            t = timeit_loop(step_n, q, kcn, vcn, seqlens)
            report(label + "_native", t, nheads_kv)

    # Paged decode (page table indirection).
    pages_per_seq = s // args.page_size
    npages = b * pages_per_seq
    kp = jax.random.normal(
        ks[1], (npages, args.page_size, hk, d), jnp.bfloat16
    )
    vp = jax.random.normal(
        ks[2], (npages, args.page_size, hk, d), jnp.bfloat16
    )
    table = jnp.arange(npages, dtype=jnp.int32).reshape(b, pages_per_seq)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.bfloat16)
    seqlens = jnp.full((b,), s, jnp.int32)

    def step_paged(q, kp, vp, tbl, sl):
        return flash_attn_with_kvcache(
            q, kp, vp, cache_seqlens=sl, page_table=tbl, causal=True
        )

    t = timeit_loop(step_paged, q, kp, vp, table, seqlens)
    report("decode_paged", t, hk)

    with open("DECODE_BENCH.json", "w") as f:
        json.dump(
            dict(
                batch=b, heads=h, heads_kv=hk, head_dim=d, cache_len=s,
                page_size=args.page_size,
                per_call_floor_ms=round(floor * 1e3, 3),
                results=results,
            ),
            f,
            indent=1,
        )
    print("wrote DECODE_BENCH.json")


if __name__ == "__main__":
    main()
