"""Scatter-cost autopsy at the bench operating point (round 5).

The thr=-3.5 evolved mask is q-COHERENT (schedule union == fine live
density), yet novote runs ~3 ms over the linear ideal while a banded
mask at the same live fraction converts IDEALLY. This probe isolates
what the evolved mask pays for:

* census of the packed schedule's per-step flags (run / full /
  descriptor count after buddy decomposition),
* novote time for masks with the SAME per-row live counts but
  (a) contiguous-from-zero (banded-equivalent ceiling: every step is
      one wide DMA, shared KV region across programs),
  (b) contiguous-from-random-offset (contiguity kept, per-program KV
      regions scattered -- separates DMA contiguity from cross-program
      HBM locality),
* the evolved mask again at ring depth 8 (does more DMA lookahead hide
  the scattered-step latency?).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python tools/scatter_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.ops import lite_flash_fwd as lff
from liteattention_tpu.ops.lite_flash_fwd import (
    lite_flash_attention,
    pack_kv,
)
from liteattention_tpu.ops.mask import (
    SkipMaskState,
    compact_mask_gather,
    update_mask,
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


def census(packed, gsize, ktf):
    """Decode per-step flags from the packed schedule (host side)."""
    b, h, qt, rows3, _ = packed.shape
    rows = rows3 // 3
    flat_f = np.asarray(packed[:, :, :, :rows]).reshape(b, h, qt, -1)
    flat_fl = np.asarray(packed[:, :, :, 2 * rows :]).reshape(b, h, qt, -1)
    counts = flat_f[..., 0]
    steps_per = -(-counts // gsize)
    total = int(steps_per.sum())
    run = full = ndesc = 0
    for bi in range(b):
        for hi in range(h):
            for qi in range(qt):
                ns = int(steps_per[bi, hi, qi])
                fl = flat_fl[bi, hi, qi, 1 : 1 + ns]
                run += int((fl & 1).sum())
                full += int(((fl >> 1) & 1).sum())
                for f in fl:
                    if f & 1:
                        ndesc += 1
                        continue
                    # buddy decomposition descriptor count
                    def cnt(blk, g0, base, f=f):
                        if blk == 1:
                            return 1
                        bit = base + g0 // blk
                        if (f >> bit) & 1:
                            return 1
                        return cnt(blk // 2, g0, base + gsize // blk) + cnt(
                            blk // 2, g0 + blk // 2, base + gsize // blk
                        )

                    ndesc += cnt(gsize // 2, 0, 2) + cnt(
                        gsize // 2, gsize // 2, 2
                    )
    return dict(
        steps=total,
        run_frac=round(run / total, 4),
        full_frac=round(full / total, 4),
        desc_per_step=round(ndesc / total, 3),
    )


def main():
    b, h, d = 1, 8, 128
    s = 144 * 512
    ktf = s // 128
    bs = BlockSizes(1024, 1024)
    qsubs, gsize = bs.block_q // 128, bs.block_k // 128

    key = jax.random.PRNGKey(0)
    kq, kk, kv, kb = jax.random.split(key, 4)
    base = jax.random.normal(kb, (b, 1, s, d), jnp.float32)
    q = (base + 0.3 * jax.random.normal(kq, (b, h, s, d))).astype(
        jnp.bfloat16
    )
    k = (base + 0.3 * jax.random.normal(kk, (b, h, s, d))).astype(
        jnp.bfloat16
    )
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    kvp = jax.block_until_ready(jax.jit(pack_kv)(k, v))

    @jax.jit
    def evolve(do_mask, q, k, v, thr):
        fidx, count, qbits = compact_mask_gather(do_mask, qsubs)
        _, _, votes = lite_flash_attention(
            q, k, v, fidx, count, thr, kv_bits=qbits,
            block_sizes=bs, fine_schedule=True,
        )
        votes = votes[:, :, : do_mask.shape[2], : do_mask.shape[3]]
        return update_mask(
            SkipMaskState(do_mask, jnp.zeros((), jnp.int32)), votes
        ).do_mask

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

    mask = jnp.ones((b, h, ktf, ktf), bool)
    for _ in range(3):
        mask = evolve(mask, q, k, v, jnp.float32(-3.5))
    mask = jax.block_until_ready(mask)
    live = float(jnp.mean(mask.astype(jnp.float32)))

    # Matched-count contiguous masks. Per (b, h, fine q-row): same
    # number of live tiles, but consecutive -- from zero (shared KV
    # region) or from a per-(h, q-tile) random offset.
    m_np = np.asarray(mask)
    counts_row = m_np.sum(axis=3)  # [b, h, qtf]
    pos = np.arange(ktf)[None, None, None]
    m_band0 = pos < counts_row[..., None]
    rng = np.random.RandomState(7)
    # one offset per compute q-tile (rows inside a q-tile share it, so
    # the schedule union stays equal to the row count)
    qt = ktf // qsubs
    off_qt = rng.randint(0, ktf, size=(b, h, qt))
    off = np.repeat(off_qt, qsubs, axis=2)[..., None]
    m_bandr = ((pos - off) % ktf) < counts_row[..., None]

    results = {"live": round(live, 4)}
    sched_e = jax.block_until_ready(sched_for(mask))
    results["census_evolved"] = census(sched_e[3], gsize, ktf)
    t_e = _timeit(step_nv, sched_e, q, kvp)
    results["novote_evolved_ms"] = round(t_e * 1e3, 2)

    for name, m in [("band0", m_band0), ("bandr", m_bandr)]:
        sc = jax.block_until_ready(sched_for(jnp.asarray(m)))
        results[f"census_{name}"] = census(sc[3], gsize, ktf)
        t = _timeit(step_nv, sc, q, kvp)
        results[f"novote_{name}_ms"] = round(t * 1e3, 2)
        print(name, results[f"novote_{name}_ms"],
              results[f"census_{name}"], flush=True)

    # Deeper ring on the evolved mask (recompile via cache clear: the
    # ring depth is a module global, not part of the jit key).
    lff.RING_SLOTS = 8
    jax.clear_caches()
    t8 = _timeit(step_nv, sched_e, q, kvp)
    results["novote_evolved_ring8_ms"] = round(t8 * 1e3, 2)
    lff.RING_SLOTS = 4
    jax.clear_caches()

    print(json.dumps(results, indent=1), flush=True)
    with open("/tmp/scatter_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
