"""Profile the LiteAttention engine under jax.profiler.

Parity target: the reference's root profiling pair
(profile_lite_attention.py:1-22 + profile_lite_attention.sh driving
Nsight Compute with ``--kernel-name device_kernel``). The TPU
equivalents: a jax.profiler trace (view with TensorBoard/XProf) around
the same two-forward pattern -- step 1 populates the skip mask, step 2
exercises the partially-skipped kernel, which is the interesting capture.

Usage:  python profile_lite_attention.py [--seqlen N] [--trace-dir DIR]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu import LiteAttention
from liteattention_tpu.utils.benchmark import hard_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlen", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--threshold", type=float, default=-3.0)
    ap.add_argument("--trace-dir", default="/tmp/lite-attention-trace")
    args = ap.parse_args()

    b, s, h, d = 1, args.seqlen, args.heads, args.head_dim
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    base = jax.random.normal(jax.random.PRNGKey(9), (b, s, 1, d))
    q = (base + 0.3 * jax.random.normal(kq, (b, s, h, d))).astype(jnp.bfloat16)
    k = (base + 0.3 * jax.random.normal(kk, (b, s, h, d))).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d)).astype(jnp.bfloat16)

    attn = LiteAttention(threshold=args.threshold)

    # Step 1 (untraced): full mask, populates skip votes + compiles.
    hard_sync(attn(q, k, v))
    print(f"step 1 done, skip={attn.get_skip_percentage():.1%}")

    # Step 2 (traced): partially-skipped kernel -- the capture of interest
    # (reference profile_lite_attention.py:16-21 runs 2 forwards for the
    # same reason).
    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        hard_sync(attn(q, k, v))
        dt = time.perf_counter() - t0
    print(
        f"step 2: {dt * 1e3:.2f} ms at skip={attn.get_skip_percentage():.1%};"
        f" trace written to {args.trace_dir}"
    )


if __name__ == "__main__":
    main()
