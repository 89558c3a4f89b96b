"""Round-3 flat-tax ablation: where does the gather kernel's s=0
overhead go?

Measures, same-process back-to-back on the real chip (only ratios are
meaningful -- CLAUDE.md):

* dense kernel at candidate tiles
* the gather kernel at s=0 (identical work to dense) with the vote chain
  compiled in vs compiled OUT (``emit_votes``), across tile candidates
* banded masks at the operating sparsities

``--phase2`` switches to the round-3 phase-2 candidate set (two-stage
vote reduce landed; narrowed tiles, banded sweep over both block_q
choices). One shared harness -- the two phases used to be separate
near-identical scripts (review r3 finding).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site \
            python tools/flat_tax_profile.py [--phase2]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12


def sync(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=6, warmup=2, chunk=4):
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


def banded_mask(b, h, ktf, qsubs, sparsity):
    """Per-q-tile centered band at the fine granularity (center clamped
    into range; first k-tile forced live -- the anchor)."""
    width = max(1, int(round((1 - sparsity) * ktf)))
    qt = -(-ktf // qsubs)
    center = np.minimum(np.arange(qt) * qsubs + qsubs // 2, ktf - 1)
    start = np.clip(center - width // 2, 0, ktf - width)[
        None, None, :, None
    ]
    kpos = np.arange(ktf)[None, None, None, :]
    keep = np.repeat(
        (kpos >= start) & (kpos < start + width), qsubs, axis=2
    )[:, :, :ktf, :] | np.zeros((b, h, 1, 1), bool)
    keep[..., 0] = True
    return jnp.asarray(keep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase2", action="store_true")
    args = ap.parse_args()

    from liteattention_tpu.ops.flash_fwd import flash_attention
    from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
    from liteattention_tpu.ops.mask import compact_mask_gather
    from liteattention_tpu.ops.tile_sizes import BlockSizes

    b, h, s, d = 1, 8, 73728, 128
    print(f"backend={jax.default_backend()} shape=({b},{h},{s},{d})")
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    flops = 4.0 * b * h * s * s * d
    results = {}

    def report(name, t, extra=None):
        mfu = flops / t / V5E_PEAK_BF16
        results[name] = dict(ms=round(t * 1e3, 2), mfu=round(mfu, 4))
        if extra:
            results[name].update(extra)
        print(f"{name:44s} {t*1e3:8.2f} ms  MFU {mfu:.3f}", flush=True)

    dense_tiles = [(640, 1024)] if args.phase2 else [(640, 1024), (512, 1024)]
    for bq, bk in dense_tiles:
        fn = jax.jit(
            lambda q, k, v, bs=BlockSizes(bq, bk): flash_attention(
                q, k, v, block_sizes=bs
            )
        )
        report(f"dense_{bq}x{bk}", timeit(fn, q, k, v))
    t_dense = results["dense_640x1024"]["ms"] / 1e3

    ktf = s // 128

    def gather_fn(bq, bk, ev):
        qsubs = bq // 128

        @jax.jit
        def fn(do_mask, q, k, v):
            fidx, count, qbits = compact_mask_gather(do_mask, qsubs)
            out = lite_flash_attention(
                q, k, v, fidx, count, jnp.float32(-10.0),
                kv_bits=qbits, block_sizes=BlockSizes(bq, bk),
                fine_schedule=True, emit_votes=ev,
            )
            return out[0]

        return fn

    gather_tiles = (
        [(512, 1024), (640, 1024)]
        if args.phase2
        else [(512, 1024), (640, 1024), (512, 2048), (640, 2048)]
    )
    full = jnp.ones((b, h, ktf, ktf), bool)
    for bq, bk in gather_tiles:
        for ev in (True, False):
            name = f"gather_{bq}x{bk}_votes{'ON' if ev else 'OFF'}"
            try:
                t = timeit(gather_fn(bq, bk, ev), full, q, k, v)
                report(name, t, {"overhead_vs_dense": round(t / t_dense, 3)})
                print(f"   -> s=0 overhead vs best dense: {t/t_dense:.3f}x",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    banded_bqs = (512, 640) if args.phase2 else (512,)
    for bq in banded_bqs:
        for sp in (0.42, 0.57, 0.77):
            do_mask = banded_mask(b, h, ktf, bq // 128, sp)
            actual = 1.0 - float(jnp.mean(do_mask.astype(jnp.float32)))
            for ev in (True, False):
                name = (
                    f"gather_{bq}_banded{int(100*sp)}_votes"
                    f"{'ON' if ev else 'OFF'}"
                )
                t = timeit(gather_fn(bq, 1024, ev), do_mask, q, k, v)
                sp_up = t_dense / t
                results[name] = dict(
                    ms=round(t * 1e3, 2), sparsity=round(actual, 3),
                    speedup_vs_dense=round(sp_up, 3),
                )
                print(f"{name:44s} {t*1e3:8.2f} ms  {sp_up:.3f}x vs dense",
                      flush=True)

    out_path = "/tmp/flat_tax_profile%s.json" % ("2" if args.phase2 else "")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
