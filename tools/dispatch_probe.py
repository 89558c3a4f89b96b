"""Is the gather kernel's 'fixed cost' per-call dispatch, not kernel?

cell_overhead_probe fit t = F + p*steps with F ~ 7.6 ms/call; folding
the grid 8x (hfold) changed nothing, so F is not per-grid-cell. If F is
per-DISPATCH (axon tunnel enqueue that does not fully overlap device
execution), per-call time at LOW density should drop as the pipelined
chunk grows. Times the 25%-density band0 point and the full schedule
at chunk sizes 1/2/4/8/16.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python tools/dispatch_probe.py
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


def _timeit_chunk(fn, *args, chunk, iters=5, warmup=2):
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

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    kvp = jax.block_until_ready(jax.jit(pack_kv)(k, v))

    def sched_for(n_live):
        pos = np.arange(ktf)[None, None, None]
        m = jnp.asarray(np.broadcast_to(pos < n_live, (b, h, ktf, ktf)))
        packed = pack_schedule(m, qsubs=8, gsize=8, seqlen_k=s)
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

    results = {}
    for dens, n_live in [(0.25, ktf // 4), (1.0, ktf)]:
        sc = jax.block_until_ready(sched_for(n_live))
        row = {}
        for chunk in (1, 2, 4, 8, 16):
            t = _timeit_chunk(step_nv, sc, q, kvp, chunk=chunk)
            row[f"chunk{chunk}"] = round(t * 1e3, 2)
        results[f"dens{dens}"] = row
        print(dens, row, flush=True)
    print(json.dumps(results, indent=1))
    with open("/tmp/dispatch_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
