"""Headline benchmark: lite (temporal-sparse) vs dense Pallas attention.

Reproduces the reference's sparsity->runtime ablation point at its
published Wan2.1 operating sparsity (42%, reference README.md:36,79-87)
on a DiT-sized self-attention stack, on one real TPU chip.

Baseline semantics: the reference reports near-linear runtime savings
(42% sparsity -> 40% self-attn time saved, i.e. ~1.66x; README.md:84).
``vs_baseline`` = our measured speedup / the reference's implied 1.66x at
the same sparsity -- >= 1.0 means we convert sparsity to wall-clock at
least as well as the CUDA engine does.

The lite timing includes the FULL per-step engine cost: mask compaction,
the sparse kernel with vote emission, and the mask update -- not just the
kernel.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
from liteattention_tpu.ops.mask import (
    SkipMaskState,
    compact_mask,
    init_mask,
    update_mask,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes

TARGET_SPARSITY = 0.42
REF_SPEEDUP_AT_TARGET = 1.0 / (1.0 - 0.40)  # README.md:84 (42% -> -40% time)


def _sync(out):
    # Hard host sync: block_until_ready can return early through the
    # remote-TPU tunnel; a scalar device->host readback cannot.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def _timeit(fn, *args, iters=10, warmup=2):
    # Per-iteration sync + median: the remote-runtime tunnel adds
    # heavy-tailed noise (~15% run-to-run on block timings), and the
    # median of synced samples is far more stable than a mean of one
    # block.
    for _ in range(warmup):
        _sync(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def main():
    # DiT-shaped self-attention: Wan-like head_dim/seqlen, trimmed head
    # count so the bench completes quickly (ratio is head-count invariant).
    b, h, d = 1, 8, 128
    bs = BlockSizes(512, 512)
    s = 144 * bs.block_k  # ~73.7k tokens, Wan2.1-720p scale
    kt = s // bs.block_k

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)

    dense = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, block_sizes=bs)
    )
    t_dense = _timeit(dense, q, k, v)

    # Evolved skip mask at the reference's published operating sparsity:
    # per-(b,h,qtile) rows keep a random ~58% subset (anchor always kept),
    # the shape the temporal evolution converges to.
    rng = np.random.RandomState(0)
    st = init_mask(b, h, s, s, bs.block_q, bs.block_k)
    keep = rng.rand(*st.do_mask.shape) > TARGET_SPARSITY
    keep[..., 0] = True
    do_mask = jnp.asarray(keep)
    actual_sparsity = 1.0 - float(jnp.mean(do_mask.astype(jnp.float32)))

    @jax.jit
    def lite_step(do_mask, q, k, v):
        kv_idx, count = compact_mask(do_mask)
        out, lse, votes = lite_flash_attention(
            q, k, v, kv_idx, count, jnp.float32(-10.0), block_sizes=bs
        )
        st = update_mask(
            SkipMaskState(do_mask, jnp.zeros((), jnp.int32)), votes
        )
        return out, st.do_mask

    t_lite = _timeit(lite_step, do_mask, q, k, v)

    speedup = t_dense / t_lite
    print(
        json.dumps(
            {
                "metric": "lite_attn_speedup_at_42pct_sparsity",
                "value": round(speedup, 4),
                "unit": "x_vs_dense_pallas",
                "vs_baseline": round(speedup / REF_SPEEDUP_AT_TARGET, 4),
                "detail": {
                    "seqlen": s,
                    "heads": h,
                    "head_dim": d,
                    "sparsity": round(actual_sparsity, 4),
                    "dense_ms": round(t_dense * 1e3, 3),
                    "lite_ms": round(t_lite * 1e3, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
