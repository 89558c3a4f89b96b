"""Split the stride-1 vote tax into its three components (round 5).

t_vote - t_novote ~ 4.2 ms/call at the bench point. Components:
  (a) the in-kernel vote chain (threshold compare + two-stage max +
      packed-row store),
  (b) the host-side schedule->fine vote decode (the one-hot einsum
      materializes a [B,H,Qt,Ktf,Ktf] bf16 one-hot = 382 MB of HBM
      traffic at 73k tokens),
  (c) update_mask.
Timed by peeling: kernel+decode+update (full) vs kernel+decode vs
kernel only (votes output dropped -> XLA DCEs the decode) vs novote.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python tools/vote_tax_probe.py
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


def _timeit(fn, *args, iters=5, warmup=2, chunk=16):
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
        fidx, count, qbits = compact_mask_gather(do_mask, 8)
        _, _, votes = lite_flash_attention(
            q, k, v, fidx, count, thr, kv_bits=qbits,
            block_sizes=bs, fine_schedule=True,
        )
        votes = votes[:, :, : do_mask.shape[2], : do_mask.shape[3]]
        return update_mask(
            SkipMaskState(do_mask, jnp.zeros((), jnp.int32)), votes
        ).do_mask

    mask = jnp.ones((b, h, ktf, ktf), bool)
    for _ in range(3):
        mask = evolve(mask, q, k, v, jnp.float32(-3.5))
    packed = pack_schedule(mask, qsubs=8, gsize=8, seqlen_k=s)
    fidx, count, qbits = unpack_schedule(
        packed, ktf, packed.shape[3] // 3
    )
    sched = jax.block_until_ready((fidx, count, qbits, packed))
    mask = jax.block_until_ready(mask)

    def call(emit):
        def f(sc, q, kvp):
            fi, cn, qb, pk = sc
            return lite_flash_attention(
                q, None, None, fi, cn, jnp.float32(-3.5),
                kv_bits=qb, block_sizes=bs, fine_schedule=True,
                emit_votes=emit, packed_schedule=pk, packed_kv=kvp,
                seqlen_k=s,
            )
        return f

    @jax.jit
    def step_full(sc, m, q, kvp):
        out, lse, votes = call(True)(sc, q, kvp)
        votes = votes[:, :, : m.shape[2], : m.shape[3]]
        st = update_mask(
            SkipMaskState(m, jnp.zeros((), jnp.int32)), votes
        )
        return out, st.do_mask

    @jax.jit
    def step_decode(sc, q, kvp):
        out, lse, votes = call(True)(sc, q, kvp)
        return out, votes

    @jax.jit
    def step_kernel_only(sc, q, kvp):
        out, lse, _ = call(True)(sc, q, kvp)
        return out  # votes dropped -> decode einsum is DCE'd

    @jax.jit
    def step_nv(sc, q, kvp):
        out, lse, _ = call(False)(sc, q, kvp)
        return out

    rows = {}
    rows["novote_ms"] = round(_timeit(step_nv, sched, q, kvp) * 1e3, 2)
    rows["kernel_votes_ms"] = round(
        _timeit(step_kernel_only, sched, q, kvp) * 1e3, 2
    )
    rows["kernel_decode_ms"] = round(
        _timeit(step_decode, sched, q, kvp) * 1e3, 2
    )
    rows["full_vote_ms"] = round(
        _timeit(step_full, sched, mask, q, kvp) * 1e3, 2
    )
    rows["tax_kernel"] = round(
        rows["kernel_votes_ms"] - rows["novote_ms"], 2
    )
    rows["tax_decode"] = round(
        rows["kernel_decode_ms"] - rows["kernel_votes_ms"], 2
    )
    rows["tax_update"] = round(
        rows["full_vote_ms"] - rows["kernel_decode_ms"], 2
    )
    print(json.dumps(rows, indent=1), flush=True)
    with open("/tmp/vote_tax_probe.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
