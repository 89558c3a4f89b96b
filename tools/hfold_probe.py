"""On-chip A/B for the head-folded gather kernel (round 5).

Parity (bit-exact vs the unfolded kernel on the evolved mask) and
timing at the bench point: novote/vote at thr=-3.5, and the
full-schedule time (the dense-denominator candidate).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python tools/hfold_probe.py
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
    bs = BlockSizes(1024, 1024)
    qsubs, gsize = 8, 8

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

    def make_step(emit, fold):
        @jax.jit
        def f(sc, q, kvp):
            fidx, count, qbits, packed = sc
            out, lse, votes = lite_flash_attention(
                q, None, None, fidx, count, jnp.float32(-3.5),
                kv_bits=qbits, block_sizes=bs, fine_schedule=True,
                emit_votes=emit, packed_schedule=packed, packed_kv=kvp,
                seqlen_k=s, fold_h=fold,
            )
            return (out, lse, votes) if emit else (out, lse)

        return f

    mask = jnp.ones((b, h, ktf, ktf), bool)
    for _ in range(3):
        mask = evolve(mask, q, k, v, jnp.float32(-3.5))
    sched = jax.block_until_ready(sched_for(mask))
    mask_full = jnp.ones((b, h, ktf, ktf), bool)
    sched_full = jax.block_until_ready(sched_for(mask_full))

    results = {
        "live": round(float(jnp.mean(mask.astype(jnp.float32))), 4)
    }
    # Parity first (vote path exercises everything).
    ref = make_step(True, None)(sched, q, kvp)
    new = make_step(True, 8)(sched, q, kvp)
    for name, a, c in [
        ("out", ref[0], new[0]), ("lse", ref[1], new[1]),
        ("votes", ref[2], new[2]),
    ]:
        eq = bool(np.array_equal(np.asarray(a), np.asarray(c)))
        results[f"parity_{name}"] = eq
        print("parity", name, eq, flush=True)
        assert eq, f"hfold {name} mismatch on chip"

    for fold in (None, 8):
        tag = f"fold{fold or 1}"
        nv = make_step(False, fold)
        vt = make_step(True, fold)
        results[f"novote_{tag}_ms"] = round(
            _timeit(nv, sched, q, kvp) * 1e3, 2
        )
        results[f"vote_{tag}_ms"] = round(
            _timeit(vt, sched, q, kvp) * 1e3, 2
        )
        results[f"full_{tag}_ms"] = round(
            _timeit(nv, sched_full, q, kvp) * 1e3, 2
        )
        print(tag, results[f"novote_{tag}_ms"],
              results[f"vote_{tag}_ms"], results[f"full_{tag}_ms"],
              flush=True)

    print(json.dumps(results, indent=1), flush=True)
    with open("/tmp/hfold_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
