"""On-chip check of the scattered-step sub-run buddy decomposition.

Times the no-vote gather step at the bench geometry on evolved masks.
Round-4 baseline (pre-subrun): thr=-6.0 -> 96.97 ms, thr=-3.5 ->
82.99 ms (/tmp/compact_probe round-5 rerun). The sub-run flags should
pull the scattered thr=-6.0 point toward the thr=-3.5 class (VERDICT
weak #3) without touching the run-dominated points.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/subrun_probe.py
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


def main():
    b, h, d = 1, 8, 128
    bs = BlockSizes(1024, 1024)
    s = 144 * 512
    qsubs, gsize = bs.block_q // 128, bs.block_k // 128
    ktf = s // 128

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

    @jax.jit
    def sched(mask):
        packed = pack_schedule(mask, qsubs=qsubs, gsize=gsize, seqlen_k=s)
        return unpack_schedule(packed, ktf, packed.shape[3] // 3) + (
            packed,
        )

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

    rows = []
    for thr in [-6.0, -3.5]:
        mask = jnp.ones((b, h, ktf, ktf), bool)
        for _ in range(3):
            mask = evolve(mask, q, k, v, jnp.float32(thr))
        sparsity = 1.0 - float(jnp.mean(mask.astype(jnp.float32)))
        sc = jax.block_until_ready(sched(mask))
        # Sub-run statistics of the schedule (descriptors per
        # scattered step under the buddy decomposition).
        fidx = np.asarray(sc[0])
        count = np.asarray(sc[1])
        desc, steps_tot, runs = 0, 0, 0
        fl = fidx[0]
        for hh in range(min(2, h)):
            for qt in range(fl.shape[1]):
                n = int(count[0, hh, qt])
                row = fl[hh, qt]
                for p in range(0, max(n, 1), gsize):
                    ent = row[p : p + gsize]
                    if ent.shape[0] < gsize:
                        ent = np.pad(ent, (0, gsize - ent.shape[0]),
                                     mode="edge")
                    steps_tot += 1
                    if all(ent[i + 1] == ent[i] + 1
                           for i in range(gsize - 1)):
                        runs += 1
                        desc += 1
                        continue

                    def cnt(blk, g0):
                        if blk == 1:
                            return 1
                        if all(ent[i + 1] == ent[i] + 1
                               for i in range(g0, g0 + blk - 1)):
                            return 1
                        return cnt(blk // 2, g0) + cnt(
                            blk // 2, g0 + blk // 2
                        )

                    desc += cnt(gsize // 2, 0) + cnt(
                        gsize // 2, gsize // 2
                    )
        t_nv = _timeit(step_nv, sc, q, kvp)
        row = dict(
            thr=thr, sparsity=round(sparsity, 4),
            novote_ms=round(t_nv * 1e3, 2),
            run_frac=round(runs / max(steps_tot, 1), 4),
            desc_per_step=round(desc / max(steps_tot, 1), 3),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("/tmp/subrun_probe.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
