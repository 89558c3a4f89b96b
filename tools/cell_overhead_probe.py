"""Per-grid-cell fixed-cost fit for the gather kernel (round 5).

scatter_probe showed the thr=-3.5 evolved mask is 99.97% contiguous
single-descriptor steps and times EQUAL to the banded-equivalent mask
at matched per-row counts -- the residual vs the linear ideal is not
scatter. Hypothesis: a fixed per-(b, q-tile, h) grid-cell cost F_c
(Mosaic cell sequencing + prologue/epilogue) that stops amortizing as
steps-per-cell shrink. This probe times band0 masks at 25/50/75/100%
density (same shapes -> zero recompiles) and fits t_cell = F + p * n.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python tools/cell_overhead_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.ops.lite_flash_fwd import (
    lite_flash_attention,
    pack_kv,
)
from liteattention_tpu.ops.schedule_pack import (
    pack_schedule,
    unpack_schedule,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes


def _sync(out):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))


def _timeit(fn, *args, iters=5, warmup=2, chunk=4):
    for _ in range(warmup):
        _sync(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(chunk):
            out = fn(*args)
        _sync(out)
        samples.append((time.perf_counter() - t0) / chunk)
    return float(np.median(samples))


def main():
    b, h, d = 1, 8, 128
    s = 144 * 512
    ktf = s // 128
    bs = BlockSizes(1024, 1024)
    qsubs, gsize = 8, 8

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    kvp = jax.block_until_ready(jax.jit(pack_kv)(k, v))

    def sched_for(mask):
        packed = pack_schedule(mask, qsubs=qsubs, gsize=gsize, seqlen_k=s)
        fidx, count, qbits = unpack_schedule(
            packed, ktf, packed.shape[3] // 3
        )
        return fidx, count, qbits, packed

    @jax.jit
    def step_nv(sc, q, kvp):
        fidx, count, qbits, packed = sc
        out, _, _ = lite_flash_attention(
            q, None, None, fidx, count, jnp.float32(-10.0),
            kv_bits=qbits, block_sizes=bs, fine_schedule=True,
            emit_votes=False, packed_schedule=packed, packed_kv=kvp,
            seqlen_k=s,
        )
        return out

    cells = (s // 1024) * h
    pos = np.arange(ktf)[None, None, None]
    rows = []
    for dens in (0.25, 0.5, 0.75, 1.0):
        n_live = int(round(dens * ktf))
        m = jnp.asarray(
            np.broadcast_to(pos < n_live, (b, h, ktf, ktf))
        )
        sc = jax.block_until_ready(sched_for(m))
        t = _timeit(step_nv, sc, q, kvp)
        n_steps = -(-n_live // gsize)
        rows.append((n_steps, t * 1e6 / cells))
        print(f"density {dens}: {t*1e3:.2f} ms, "
              f"{t*1e6/cells:.2f} us/cell @ {n_steps} steps", flush=True)

    ns = np.array([r[0] for r in rows])
    tc = np.array([r[1] for r in rows])
    p, F = np.polyfit(ns, tc, 1)
    print(json.dumps({
        "fit_us_per_step": round(float(p), 3),
        "fit_fixed_us_per_cell": round(float(F), 2),
        "fixed_total_ms": round(float(F) * cells / 1e3, 2),
        "points": [(int(a), round(float(b_), 2)) for a, b_ in rows],
    }), flush=True)


if __name__ == "__main__":
    main()
