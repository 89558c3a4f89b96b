"""Multi-chip sequence-parallel LiteAttention demo.

Runs the KV-split engine over all visible devices: the skip mask lives
sharded with its KV shard, partial outputs merge over the mesh, and the
mask evolves across steps exactly as on one chip.

On a CPU host, force virtual devices first:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=4 \
      python examples/seq_parallel_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from liteattention_tpu.ops.tile_sizes import BlockSizes
from liteattention_tpu.parallel import make_seq_parallel_attention


def main():
    n = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("sp",))
    bs = BlockSizes(128, 128)
    b, h, d = 1, 4, 128
    s = 128 * 2 * n  # 2 k-tiles per chip
    print(f"{n} devices, {s} tokens ({s // 128} k-tiles)")

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    base = jax.random.normal(jax.random.PRNGKey(9), (b, h, s, 1))
    q = (base + 0.5 * jax.random.normal(kq, (b, h, s, d))).astype(
        jnp.bfloat16
    )
    k = (base + 0.5 * jax.random.normal(kk, (b, h, s, d))).astype(
        jnp.bfloat16
    )
    v = jax.random.normal(kv, (b, h, s, d)).astype(jnp.bfloat16)

    init_fn, step_fn = make_seq_parallel_attention(mesh, "sp", block_sizes=bs)
    state = init_fn(b, h, s, s, d, 2)
    # Loose final thresholds so the demo's random-ish inputs actually
    # produce visible sparsity (real DiT activations skip at much
    # tighter thresholds).
    for t, thr in enumerate([-10.0, -1.0, 0.2, 0.5]):
        out, lse, state = step_fn(state, q, k, v, thr)
        sp = 1.0 - float(jnp.mean(state.do_mask.astype(jnp.float32)))
        print(f"step {t}: thr={thr} sparsity={sp:.1%} out={out.shape}")


if __name__ == "__main__":
    main()
