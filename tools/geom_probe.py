"""On-chip geometry cost model for q-incoherent masks.

thr=-6-class masks are q-INCOHERENT: the qsubs=8 schedule union
inflates 0.518 fine-live to ~0.624 scheduled density (novote 97.4 ms =
0.624 x dense at the bench point), which is the whole residual of
VERDICT weak #3 (descriptor count and the masked-branch VPU cost were
eliminated by measurement). Shorter q-tiles shrink the union but run
the kernel less efficiently; this probe measures both sides:

* gather kernel at FULL schedule (efficiency ceiling) for block_q in
  {1024, 512, 256},
* novote time at the evolved thr=-6.0 / -3.5 masks for each geometry,
* the mask's union density per qsubs (the other half of the model).

Output feeds LiteAttention._pick_geometry's candidate table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/geom_probe.py
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
    s = 144 * 512
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

    evolve_bs = BlockSizes(1024, 1024)

    @jax.jit
    def evolve(do_mask, q, k, v, thr):
        fidx, count, qbits = compact_mask_gather(do_mask, 8)
        _, _, votes = lite_flash_attention(
            q, k, v, fidx, count, thr, kv_bits=qbits,
            block_sizes=evolve_bs, fine_schedule=True,
        )
        votes = votes[:, :, : do_mask.shape[2], : do_mask.shape[3]]
        return update_mask(
            SkipMaskState(do_mask, jnp.zeros((), jnp.int32)), votes
        ).do_mask

    def sched_for(mask, qsubs, gsize):
        packed = pack_schedule(
            mask, qsubs=qsubs, gsize=gsize, seqlen_k=s
        )
        return unpack_schedule(packed, ktf, packed.shape[3] // 3) + (
            packed,
        )

    def step_nv(bs):
        @jax.jit
        def f(sc, q, kvp):
            fidx, count, qbits, packed = sc
            out, _, _ = lite_flash_attention(
                q, None, None, fidx, count, jnp.float32(-10.0),
                kv_bits=qbits, block_sizes=bs, fine_schedule=True,
                emit_votes=False, packed_schedule=packed, packed_kv=kvp,
                seqlen_k=s,
            )
            return out

        return f

    geoms = [BlockSizes(1024, 1024), BlockSizes(1024, 2048),
             BlockSizes(512, 1024), BlockSizes(256, 1024)]
    mask_full = jnp.ones((b, h, ktf, ktf), bool)
    rows = {"full": {}, "thr-6": {}, "thr-3.5": {}, "union": {}}
    masks = {}
    for name, thr in [("thr-6", -6.0), ("thr-3.5", -3.5)]:
        m = mask_full
        for _ in range(3):
            m = evolve(m, q, k, v, jnp.float32(thr))
        masks[name] = m
        dens = {}
        mm = m.astype(jnp.float32)
        for qsubs in (8, 4, 2, 1):
            qt = m.shape[2] // qsubs
            u = jnp.any(
                m[:, :, : qt * qsubs].reshape(
                    b, h, qt, qsubs, ktf
                ),
                axis=3,
            )
            dens[qsubs] = round(float(jnp.mean(u.astype(jnp.float32))), 4)
        rows["union"][name] = dict(
            live=round(float(jnp.mean(mm)), 4), **{
                f"qsubs{k_}": v_ for k_, v_ in dens.items()
            },
        )
        print(name, rows["union"][name], flush=True)

    for bs in geoms:
        qsubs, gsize = bs.block_q // 128, bs.block_k // 128
        f = step_nv(bs)
        sc = jax.block_until_ready(sched_for(mask_full, qsubs, gsize))
        t_full = _timeit(f, sc, q, kvp)
        rows["full"][bs.block_q] = round(t_full * 1e3, 2)
        for name in ("thr-6", "thr-3.5"):
            sc = jax.block_until_ready(
                sched_for(masks[name], qsubs, gsize)
            )
            t = _timeit(f, sc, q, kvp)
            rows[name][bs.block_q] = round(t * 1e3, 2)
        print(bs, rows["full"][bs.block_q],
              rows["thr-6"][bs.block_q], rows["thr-3.5"][bs.block_q],
              flush=True)
    with open("/tmp/geom_probe.json", "w") as fj:
        json.dump(rows, fj, indent=1)


if __name__ == "__main__":
    main()
