"""On-chip A/B: union-compacted vs plain gather path (round 5).

Replicates the bench harness (73k tokens, evolved masks) and times the
no-vote lite step both ways at several thresholds, including the
thr=-6.0-class scattered mask that round 4 measured at 98.4 ms vs
84.2 ms for thr=-3.5 at equal sparsity (VERDICT weak #3). Also times
the per-call compact_kv relayout and the per-epoch map build.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/compact_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.ops.kv_compact import compact_kv, kv_union_map
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))


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
    def sched_plain(mask):
        packed = pack_schedule(
            mask, qsubs=qsubs, gsize=gsize, seqlen_k=s
        )
        return unpack_schedule(packed, ktf, packed.shape[3] // 3) + (
            packed,
        )

    @jax.jit
    def sched_compact(mask):
        kv_map, inv, _ = kv_union_map(mask)
        packed = pack_schedule(
            mask, qsubs=qsubs, gsize=gsize, seqlen_k=s, kv_map=kv_map
        )
        return unpack_schedule(packed, ktf, packed.shape[3] // 3) + (
            packed, kv_map, inv,
        )

    @jax.jit
    def step_nv(sched, q, kvp):
        fidx, count, qbits, packed = sched[:4]
        out, lse, _ = lite_flash_attention(
            q, None, None, fidx, count, jnp.float32(-10.0),
            kv_bits=qbits, block_sizes=bs, fine_schedule=True,
            emit_votes=False, packed_schedule=packed, packed_kv=kvp,
            seqlen_k=s,
        )
        return out

    compact_kv_j = jax.jit(compact_kv)

    rows = []
    for thr in [-6.0, -4.0, -3.5, -3.0]:
        mask = jnp.ones((b, h, ktf, ktf), bool)
        for _ in range(3):
            mask = evolve(mask, q, k, v, jnp.float32(thr))
        sparsity = 1.0 - float(jnp.mean(mask.astype(jnp.float32)))
        sp = jax.block_until_ready(sched_plain(mask))
        sc = jax.block_until_ready(sched_compact(mask))
        inv = sc[5]
        kvpc = jax.block_until_ready(compact_kv_j(kvp, inv))
        # Correctness spot-check on chip: same outputs both ways.
        o1 = np.asarray(step_nv(sp[:4], q, kvp)).astype(np.float32)
        o2 = np.asarray(step_nv(sc[:4], q, kvpc)).astype(np.float32)
        err = float(np.max(np.abs(o1 - o2)))
        t_plain = _timeit(step_nv, sp[:4], q, kvp)
        t_comp = _timeit(step_nv, sc[:4], q, kvpc)
        t_relayout = _timeit(compact_kv_j, kvp, inv)
        t_sched_p = _timeit(sched_plain, mask)
        t_sched_c = _timeit(sched_compact, mask)
        union = float(jnp.mean((sc[4] >= 0).astype(jnp.float32)))
        row = dict(
            thr=thr, sparsity=round(sparsity, 4),
            union_density=round(union, 4),
            plain_ms=round(t_plain * 1e3, 2),
            compact_ms=round(t_comp * 1e3, 2),
            relayout_ms=round(t_relayout * 1e3, 2),
            sched_plain_ms=round(t_sched_p * 1e3, 2),
            sched_compact_ms=round(t_sched_c * 1e3, 2),
            win=round(t_plain / (t_comp + t_relayout), 4),
            max_abs_err=err,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("/tmp/compact_probe.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
