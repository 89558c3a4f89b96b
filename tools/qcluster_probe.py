"""Can q-row clustering deflate the thr=-6 schedule union? (round 5)

thr=-6-class evolved masks are q-INCOHERENT: rows inside a 1024-row
compute q-tile disagree, so the qsubs=8 schedule union inflates 0.518
fine-live to ~0.587 scheduled density -- the whole conversion gap at
that threshold (geometry is a net loss; see geom_probe). A PERMUTATION
of q fine-rows that groups rows with similar live sets into the same
compute q-tile shrinks the union without touching kernel efficiency.

Stage 1 (chip): evolve masks at thr=-6 / -3.5, save to /tmp.
Stage 2 (host numpy): score candidate permutations by resulting union
density at qsubs=8:
  * identity (baseline),
  * sort by live-centroid (mean live tile index),
  * sort by (first-live, centroid),
  * greedy agglomerative on Jaccard similarity (expensive upper bound).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
       python tools/qcluster_probe.py [--host-only]
"""

import json
import sys

import numpy as np


def union_density(m, qsubs=8):
    """m: bool [B, H, Qtf, Ktf] -> scheduled density at qsubs."""
    b, h, qtf, ktf = m.shape
    qt = qtf // qsubs
    u = m[:, :, : qt * qsubs].reshape(b, h, qt, qsubs, ktf).any(axis=3)
    # per compute q-tile, the schedule visits ceil(count/8)*8 entries
    cnt = u.sum(axis=3)
    steps = -(-cnt // 8)
    return float((steps * 8).sum() / (b * h * qt * ktf))


def perm_centroid(rows):
    idx = np.arange(rows.shape[1])
    cent = (rows * idx).sum(axis=1) / np.maximum(rows.sum(axis=1), 1)
    return np.argsort(cent, kind="stable")


def perm_firstlive(rows):
    first = np.argmax(rows, axis=1)
    idx = np.arange(rows.shape[1])
    cent = (rows * idx).sum(axis=1) / np.maximum(rows.sum(axis=1), 1)
    return np.lexsort((cent, first))


def perm_greedy(rows, qsubs=8):
    """Greedy seed-and-fill: repeatedly take the densest unassigned row
    as a seed and add the qsubs-1 rows with max Jaccard overlap."""
    n = rows.shape[0]
    r = rows.astype(np.float32)
    sizes = r.sum(axis=1)
    unassigned = np.ones(n, bool)
    order = []
    inter = r @ r.T  # [n, n] intersection sizes
    for _ in range(n // qsubs):
        cand = np.where(unassigned)[0]
        seed = cand[np.argmax(sizes[cand])]
        sim = inter[seed, cand] / np.maximum(
            sizes[seed] + sizes[cand] - inter[seed, cand], 1
        )
        take = cand[np.argsort(-sim)[:qsubs]]
        for t in take:
            unassigned[t] = False
            order.append(t)
    order.extend(np.where(unassigned)[0])
    return np.array(order)


def apply_perm(m, perms):
    out = np.empty_like(m)
    for bi in range(m.shape[0]):
        for hi in range(m.shape[1]):
            out[bi, hi] = m[bi, hi, perms[bi][hi]]
    return out


def evolve_masks():
    import jax
    import jax.numpy as jnp

    from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
    from liteattention_tpu.ops.mask import (
        SkipMaskState,
        compact_mask_gather,
        update_mask,
    )
    from liteattention_tpu.ops.tile_sizes import BlockSizes

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

    for thr in (-6.0, -3.5):
        m = jnp.ones((b, h, ktf, ktf), bool)
        for _ in range(3):
            m = evolve(m, q, k, v, jnp.float32(thr))
        np.save(f"/tmp/mask_thr{thr}.npy", np.asarray(m))
        print("saved", thr, flush=True)


def main():
    if "--host-only" not in sys.argv:
        evolve_masks()
    results = {}
    for thr in (-6.0, -3.5):
        m = np.load(f"/tmp/mask_thr{thr}.npy")
        live = float(m.mean())
        row = {"live": round(live, 4),
               "identity": round(union_density(m), 4)}
        for name, fn in [
            ("centroid", perm_centroid),
            ("firstlive", perm_firstlive),
            ("greedy", perm_greedy),
        ]:
            perms = [
                [fn(m[bi, hi]) for hi in range(m.shape[1])]
                for bi in range(m.shape[0])
            ]
            row[name] = round(union_density(apply_perm(m, perms)), 4)
        results[f"thr{thr}"] = row
        print(thr, row, flush=True)
    with open("/tmp/qcluster_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
