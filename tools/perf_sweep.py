"""On-chip perf sweep: dense tile table, stock-kernel comparison, MFU,
and the lite-kernel sparsity->runtime conversion curve.

VERDICT round-1 items 4 and 5. Run on the real TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_sweep.py \
        [--mode dense|lite|stock|all] [--seqlen 73728] [--heads 8]

All comparisons are same-process back-to-back (absolute chip throughput
swings >2x across hours; only ratios are meaningful -- CLAUDE.md).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s (v5e TensorCore peak, bf16)


def sync(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=8, warmup=2, chunk=16):
    """Median per-call seconds, measured over pipelined-dispatch chunks.

    Each remote call through the axon tunnel carries a ~30 ms
    round-trip latency floor (measured: a trivial mask op times at
    30 ms standalone); dispatching ``chunk`` calls back-to-back and
    syncing once amortizes it away so small kernels aren't charged
    the tunnel's latency as if it were compute. Round 5: chunk=4
    still left a ~5 ms/call non-overlapped residue (additive per
    call, so it taxed sparse/short calls relatively hardest);
    chunk=16 is within ~1 ms of the asymptote
    (tools/dispatch_probe.py).
    """
    for _ in range(warmup):
        sync(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(chunk):
            out = fn(*args)
        sync(out)
        samples.append((time.perf_counter() - t0) / chunk)
    return float(np.median(samples))


def attn_flops(b, h, sq, sk, d):
    return 4.0 * b * h * sq * sk * d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all")
    ap.add_argument("--seqlen", type=int, default=73728)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bwd-wide", action="store_true",
                    help="sweep the wide-block_k bwd candidate set")
    args = ap.parse_args()

    from liteattention_tpu.ops.flash_fwd import flash_attention
    from liteattention_tpu.ops.tile_sizes import BlockSizes

    b, h, s, d = 1, args.heads, args.seqlen, args.head_dim
    print(f"backend={jax.default_backend()} shape=({b},{h},{s},{d})")
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    flops = attn_flops(b, h, s, s, d)
    results = {}

    if args.mode in ("dense", "all"):
        for bq, bk in [
            (512, 512), (512, 1024), (1024, 512), (512, 768),
            (768, 512), (256, 512), (1024, 1024),
        ]:
            try:
                fn = jax.jit(
                    lambda q, k, v, bs=BlockSizes(bq, bk): flash_attention(
                        q, k, v, block_sizes=bs
                    )
                )
                t = timeit(fn, q, k, v, iters=args.iters)
                mfu = flops / t / V5E_PEAK_BF16
                results[f"dense_{bq}x{bk}"] = dict(
                    ms=round(t * 1e3, 2), mfu=round(mfu, 4)
                )
                print(f"dense ({bq},{bk}): {t*1e3:8.2f} ms  MFU {mfu:.3f}")
            except Exception as e:
                print(f"dense ({bq},{bk}): FAILED {type(e).__name__}: {e}")

    if args.mode in ("stock", "all"):
        from jax.experimental.pallas.ops.tpu import flash_attention as sfa

        for bs_name, bs in [
            ("default", None),
            (
                "512x1024",
                sfa.BlockSizes(
                    block_q=512, block_k_major=1024, block_k=1024,
                    block_b=1,
                    block_q_major_dkv=512, block_k_major_dkv=512,
                    block_k_dkv=512, block_q_dkv=512,
                    block_k_major_dq=512, block_k_dq=512,
                    block_q_dq=512,
                ),
            ),
        ]:
            try:
                fn = jax.jit(
                    lambda q, k, v, bs=bs: sfa.flash_attention(
                        q, k, v, sm_scale=1.0 / d**0.5, block_sizes=bs
                    )
                )
                t = timeit(fn, q, k, v, iters=args.iters)
                mfu = flops / t / V5E_PEAK_BF16
                results[f"stock_{bs_name}"] = dict(
                    ms=round(t * 1e3, 2), mfu=round(mfu, 4)
                )
                print(f"stock {bs_name}: {t*1e3:8.2f} ms  MFU {mfu:.3f}")
            except Exception as e:
                print(f"stock {bs_name}: FAILED {type(e).__name__}: {e}")

    if args.mode in ("lite_clustered",):
        # Clustered sparsity: whole SUPER-tiles die (the shape real
        # temporally-coherent masks converge to; a random FINE mask at
        # rate s kills a super-tile with prob s^(qsubs*ksubs) ~ 0 and
        # eliminates no compute). Sweep compute-tile geometry too.
        from liteattention_tpu.ops.lite_flash_fwd import (
            lite_flash_attention,
        )
        from liteattention_tpu.ops.mask import (
            SkipMaskState,
            compact_mask_fine,
            update_mask,
        )

        for bq, bk in [(512, 512), (1024, 512), (512, 1024)]:
            bs = BlockSizes(bq, bk)
            qsubs, ksubs = bq // 128, bk // 128
            dense_fn = jax.jit(
                lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, block_sizes=bs
                )
            )
            t_dense = timeit(dense_fn, q, k, v, iters=args.iters)
            best_dense = results.get("best_dense_ms") or t_dense * 1e3
            results["best_dense_ms"] = min(best_dense, t_dense * 1e3)
            print(f"[{bq}x{bk}] dense {t_dense*1e3:.2f} ms")

            @jax.jit
            def lite_step(do_mask, q, k, v, bs=bs, qs_=qsubs, ks_=ksubs):
                kv_idx, count, bits = compact_mask_fine(do_mask, qs_, ks_)
                out, lse, votes = lite_flash_attention(
                    q, k, v, kv_idx, count, jnp.float32(-10.0),
                    kv_bits=bits, block_sizes=bs,
                )
                votes = votes[:, :, : do_mask.shape[2],
                              : do_mask.shape[3]]
                st = update_mask(
                    SkipMaskState(do_mask, jnp.zeros((), jnp.int32)),
                    votes,
                )
                return out, st.do_mask

            rng = np.random.RandomState(0)
            qt_s, kt_s = s // bq, s // bk
            curve = []
            for sparsity in [0.0, 0.21, 0.42, 0.57, 0.77, 0.90]:
                keep_super = rng.rand(b, h, qt_s, kt_s) > sparsity
                keep_super[..., 0] = True
                fine = np.repeat(
                    np.repeat(keep_super, qsubs, 2), ksubs, 3
                )
                do_mask = jnp.asarray(fine)
                actual = 1.0 - float(jnp.mean(do_mask.astype(jnp.float32)))
                t = timeit(lite_step, do_mask, q, k, v, iters=args.iters)
                ideal = 1.0 / max(1.0 - actual, 1e-6)
                speedup = t_dense / t
                curve.append(
                    dict(
                        sparsity=round(actual, 4),
                        ms=round(t * 1e3, 2),
                        speedup=round(speedup, 3),
                        conversion=round(speedup / ideal, 3),
                    )
                )
                print(
                    f"[{bq}x{bk}] lite s={actual:.2f}: {t*1e3:8.2f} ms "
                    f"speedup {speedup:.2f}x / ideal {ideal:.2f}x "
                    f"conv {speedup/ideal:.2f}"
                )
            results[f"lite_clustered_{bq}x{bk}"] = dict(
                dense_ms=round(t_dense * 1e3, 2), curve=curve
            )

    if args.mode in ("lite_finegeo",):
        # Random FINE masks (worst-case clustering) across k-granular
        # geometries: when block_k is small the scheduling granularity
        # IS the fine granularity and conversion needs no clustering.
        from liteattention_tpu.ops.lite_flash_fwd import (
            lite_flash_attention,
        )
        from liteattention_tpu.ops.mask import (
            SkipMaskState,
            compact_mask_fine,
            update_mask,
        )

        for bq, bk in [(512, 128), (512, 256), (512, 512)]:
            bs = BlockSizes(bq, bk)
            qsubs, ksubs = bq // 128, bk // 128

            @jax.jit
            def lite_step(do_mask, q, k, v, bs=bs, qs_=qsubs, ks_=ksubs):
                kv_idx, count, bits = compact_mask_fine(do_mask, qs_, ks_)
                out, lse, votes = lite_flash_attention(
                    q, k, v, kv_idx, count, jnp.float32(-10.0),
                    kv_bits=bits, block_sizes=bs,
                )
                votes = votes[:, :, : do_mask.shape[2],
                              : do_mask.shape[3]]
                st = update_mask(
                    SkipMaskState(do_mask, jnp.zeros((), jnp.int32)),
                    votes,
                )
                return out, st.do_mask

            rng = np.random.RandomState(0)
            ktf = s // 128
            curve = []
            for sparsity in [0.0, 0.42, 0.57, 0.77]:
                keep = rng.rand(b, h, ktf, ktf) > sparsity
                keep[..., 0] = True
                do_mask = jnp.asarray(keep)
                actual = 1.0 - float(
                    jnp.mean(do_mask.astype(jnp.float32))
                )
                t = timeit(lite_step, do_mask, q, k, v, iters=args.iters)
                curve.append(
                    dict(sparsity=round(actual, 4), ms=round(t * 1e3, 2))
                )
                print(f"[{bq}x{bk}] lite rfine s={actual:.2f}: "
                      f"{t*1e3:8.2f} ms")
            results[f"lite_rfine_{bq}x{bk}"] = curve

    if args.mode in ("gather",):
        # The gather schedule on random FINE masks: conversion without
        # clustering -- the round-2 engine default.
        from liteattention_tpu.ops.lite_flash_fwd import (
            lite_flash_attention,
        )
        from liteattention_tpu.ops.mask import (
            SkipMaskState,
            compact_mask_gather,
            update_mask,
        )

        dense_best = jax.jit(
            lambda q, k, v: flash_attention(q, k, v)  # default tiles
        )
        t_best = timeit(dense_best, q, k, v, iters=args.iters)
        results["dense_best"] = dict(
            ms=round(t_best * 1e3, 2),
            mfu=round(flops / t_best / V5E_PEAK_BF16, 4),
        )
        print(f"dense best-default: {t_best*1e3:.2f} ms")

        for bq, bk in [(1024, 1024)]:  # engine default (round 4)
            bs = BlockSizes(bq, bk)

            @jax.jit
            def lite_step(do_mask, q, k, v, bs=bs, qs_=bq // 128):
                fidx, count, qbits = compact_mask_gather(do_mask, qs_)
                out, lse, votes = lite_flash_attention(
                    q, k, v, fidx, count, jnp.float32(-10.0),
                    kv_bits=qbits, block_sizes=bs, fine_schedule=True,
                )
                votes = votes[:, :, : do_mask.shape[2],
                              : do_mask.shape[3]]
                st = update_mask(
                    SkipMaskState(do_mask, jnp.zeros((), jnp.int32)),
                    votes,
                )
                return out, st.do_mask

            rng = np.random.RandomState(0)
            ktf = s // 128
            qsubs_ = bq // 128
            qt = ktf // qsubs_
            # Three mask families: RANDOM fine masks (worst case for the
            # per-q-tile schedule union: scheduled fraction =
            # 1 - s^qsubs), Q-CLUSTERED masks (constant within each
            # compute q-tile: isolates kernel conversion; survivors
            # still scattered along k), and BANDED masks (a contiguous
            # diagonal k-band per q-tile -- the structure evolved video
            # masks actually have, and the one that exercises the
            # run-DMA fast path).
            for style in ("random", "qclust", "banded"):
                curve = []
                for sparsity in [0.0, 0.21, 0.42, 0.57, 0.77, 0.90]:
                    if style == "random":
                        keep = rng.rand(b, h, ktf, ktf) > sparsity
                    elif style == "qclust":
                        keep = np.repeat(
                            rng.rand(b, h, qt, ktf) > sparsity,
                            qsubs_,
                            axis=2,
                        )
                    else:
                        width = max(1, int(round((1 - sparsity) * ktf)))
                        center = np.arange(qt) * qsubs_ + qsubs_ // 2
                        start = np.clip(
                            center - width // 2, 0, ktf - width
                        )[None, None, :, None]
                        kpos = np.arange(ktf)[None, None, None, :]
                        keep = np.repeat(
                            (kpos >= start) & (kpos < start + width),
                            qsubs_,
                            axis=2,
                        ) | np.zeros((b, h, 1, 1), bool)
                    keep[..., 0] = True
                    do_mask = jnp.asarray(keep)
                    actual = 1.0 - float(
                        jnp.mean(do_mask.astype(jnp.float32))
                    )
                    t = timeit(
                        lite_step, do_mask, q, k, v, iters=args.iters
                    )
                    ideal = 1.0 / max(1.0 - actual, 1e-6)
                    speedup = t_best / t
                    curve.append(
                        dict(
                            sparsity=round(actual, 4),
                            ms=round(t * 1e3, 2),
                            speedup_vs_best_dense=round(speedup, 3),
                            conversion=round(speedup / ideal, 3),
                        )
                    )
                    print(
                        f"[gather {bq}x{bk} {style}] s={actual:.2f}: "
                        f"{t*1e3:8.2f} ms vs best dense {speedup:.2f}x "
                        f"(ideal {ideal:.2f}x, conv {speedup/ideal:.2f})"
                    )
                results[f"gather_{bq}x{bk}_{style}"] = curve

    if args.mode in ("bwd",):
        # Backward-kernel (dQ + dKV) tile sweep: the training hot path.
        # FLOPs = 2.5x fwd (dQ: 2 matmuls recompute + 1; dKV: 2); MFU
        # here is over the 10*b*h*s^2*d backward total.
        from liteattention_tpu.ops.flash_fwd import (
            flash_attention as fwd,
        )
        from liteattention_tpu.ops.flash_bwd import flash_attention_bwd

        out, lse = jax.jit(
            lambda q, k, v: fwd(q, k, v, return_lse=True)
        )(q, k, v)
        do = jax.random.normal(
            jax.random.PRNGKey(9), q.shape, jnp.float32
        ).astype(q.dtype)
        # Useful-FLOP convention: bwd = 2.5x fwd = 10 N^2 d (S recomputed
        # once). Each kernel actually re-executes its own S recompute, so
        # executed FLOPs are 6 N^2 d (dQ: S, dP, dQ) + 8 N^2 d (dKV: S,
        # dV, dP, dK) = 14; per-kernel `exec_mfu` is over the executed
        # count (roofline headroom), the combined MFU over the useful 10.
        bwd_flops = 10.0 * b * h * s * s * d
        cands = [
            (256, 1024), (384, 1024), (512, 1024), (640, 1024),
            (768, 1024), (512, 1536), (512, 2048), (384, 2048),
            (1024, 512), (1024, 1024),
        ]
        if args.bwd_wide:
            cands = [
                (512, 2048), (384, 3072), (512, 3072), (256, 4096),
                (384, 4096), (512, 4096), (640, 2048), (768, 2048),
            ]

        def time_part(idx, exec_coeff, tag):
            part = {}
            for bq, bk in cands:
                try:
                    kw = (
                        dict(dq_block_sizes=BlockSizes(bq, bk))
                        if idx == 0
                        else dict(dkv_block_sizes=BlockSizes(bq, bk))
                    )
                    # Unused outputs are DCE'd, so indexing times one
                    # kernel alone.
                    fn = jax.jit(
                        lambda q, k, v, o, lse, do, kw=kw: (
                            flash_attention_bwd(
                                q, k, v, o, lse, do, 1.0 / d**0.5,
                                False, **kw,
                            )[idx]
                        )
                    )
                    t = timeit(
                        fn, q, k, v, out, lse, do, iters=args.iters
                    )
                    em = exec_coeff * b * h * s * s * d / t / V5E_PEAK_BF16
                    part[(bq, bk)] = t
                    results[f"{tag}_{bq}x{bk}"] = dict(
                        ms=round(t * 1e3, 2), exec_mfu=round(em, 4)
                    )
                    print(
                        f"{tag} ({bq},{bk}): {t*1e3:8.2f} ms  "
                        f"exec-MFU {em:.3f}"
                    )
                except Exception as e:
                    print(
                        f"{tag} ({bq},{bk}): FAILED "
                        f"{type(e).__name__}: {str(e)[:120]}"
                    )
            return part

        dq_times = time_part(0, 6.0, "bwd_dq")
        dkv_times = time_part(1, 8.0, "bwd_dkv")
        if dq_times and dkv_times:
            best_dq = min(dq_times, key=dq_times.get)
            best_dkv = min(dkv_times, key=dkv_times.get)
            fn = jax.jit(
                lambda q, k, v, o, lse, do: flash_attention_bwd(
                    q, k, v, o, lse, do, 1.0 / d**0.5, False,
                    dq_block_sizes=BlockSizes(*best_dq),
                    dkv_block_sizes=BlockSizes(*best_dkv),
                )
            )
            t = timeit(fn, q, k, v, out, lse, do, iters=args.iters)
            mfu = bwd_flops / t / V5E_PEAK_BF16
            results["bwd_best_pair"] = dict(
                dq=list(best_dq), dkv=list(best_dkv),
                ms=round(t * 1e3, 2), mfu=round(mfu, 4),
            )
            print(
                f"bwd best pair dq={best_dq} dkv={best_dkv}: "
                f"{t*1e3:8.2f} ms  MFU {mfu:.3f}"
            )

    if args.mode in ("lite", "all"):
        from liteattention_tpu.ops.lite_flash_fwd import (
            lite_flash_attention,
        )
        from liteattention_tpu.ops.mask import (
            SkipMaskState,
            compact_mask_fine,
            init_mask,
            update_mask,
        )

        bs = BlockSizes(512, 512)
        dense_fn = jax.jit(
            lambda q, k, v: flash_attention(q, k, v, block_sizes=bs)
        )
        t_dense = timeit(dense_fn, q, k, v, iters=args.iters)
        results["lite_dense_ref"] = dict(ms=round(t_dense * 1e3, 2))
        print(f"lite: dense ref {t_dense*1e3:.2f} ms")

        @jax.jit
        def lite_step(do_mask, q, k, v):
            kv_idx, count, bits = compact_mask_fine(do_mask, 4, 4)
            out, lse, votes = lite_flash_attention(
                q, k, v, kv_idx, count, jnp.float32(-10.0),
                kv_bits=bits, block_sizes=bs,
            )
            votes = votes[:, :, : do_mask.shape[2], : do_mask.shape[3]]
            st = update_mask(
                SkipMaskState(do_mask, jnp.zeros((), jnp.int32)), votes
            )
            return out, st.do_mask

        rng = np.random.RandomState(0)
        ktf = s // 128
        curve = []
        for sparsity in [0.0, 0.21, 0.42, 0.57, 0.77, 0.90]:
            # Random fine mask at the target sparsity, anchor kept.
            keep = rng.rand(b, h, ktf, ktf) > sparsity
            keep[..., 0] = True
            do_mask = jnp.asarray(keep)
            actual = 1.0 - float(jnp.mean(do_mask.astype(jnp.float32)))
            t = timeit(lite_step, do_mask, q, k, v, iters=args.iters)
            ideal = 1.0 / max(1.0 - actual, 1e-6)
            speedup = t_dense / t
            conv = speedup / ideal
            curve.append(
                dict(
                    sparsity=round(actual, 4),
                    ms=round(t * 1e3, 2),
                    speedup=round(speedup, 3),
                    ideal=round(ideal, 3),
                    conversion=round(conv, 3),
                )
            )
            print(
                f"lite s={actual:.2f}: {t*1e3:8.2f} ms  "
                f"speedup {speedup:.2f}x / ideal {ideal:.2f}x  "
                f"conversion {conv:.2f}"
            )
        results["lite_curve"] = curve

    print(json.dumps(results))
    with open("/tmp/perf_sweep.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
