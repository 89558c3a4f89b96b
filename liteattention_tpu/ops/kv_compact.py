"""Union-compacted KV staging for the gather schedule (round 5).

Scattered fine-tile skip masks are the gather kernel's adversarial
case: a pipeline step whose ``gsize`` scheduled tiles are not
consecutive pays ``gsize`` DMA descriptors instead of one contiguous
copy, and the round-4 accounting pinned the whole residual gap on this
scattered-step cost (evolved masks at thr=-6.0 ran 98.4 ms where equal
sparsity banded masks ran ~84 -- the reference's producer walks
do-RANGES and is insensitive to this, mainloop_fwd_sm90_tma_gmma_ws.hpp
:1173-1209).

The fix is a cheap physical relayout: gather the cross-q-tile UNION of
live KV fine tiles into the front of a compact staging buffer, once per
(batch, kv-head) per step, and emit the wire-format schedule in compact
positions (``pack_schedule(kv_map=...)``). Inside the compact buffer
any q-tile whose live set matches the union is fully CONTIGUOUS, so
every step rides the kernel's existing single-wide-DMA run fast path.
Evolved video masks are exactly this shape (mask columns are
near-identical across q rows -- the round-4 union probe measured union
density == live density at every q-tile height), and the map is
monotone, so original contiguous runs stay runs: compaction never makes
a DMA pattern worse.

Cost: one tile-gather pass over the packed K|V buffer per step (~2x KV
bytes of HBM traffic; ~0.7 ms at 73k tokens against a >5 ms
scattered-step saving). The gather kernel itself needs no changes --
compact positions ride the same ``fidx`` wire rows; only the vote
decode must compare schedule entries against ``kv_map`` instead of raw
fine indices (``lite_flash_attention(kv_map=...)``).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VOTE_TILE = 128


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("hk",))
def kv_union_map(
    do_mask: jax.Array, hk: Optional[int] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-(batch, kv-head) union compaction map of a fine skip mask.

    Args:
      do_mask: bool[B, H, Qtf, Ktf] fine mask (True = compute).
      hk: number of KV heads (GQA groups share one compact buffer and
        therefore one map); defaults to H.

    Returns:
      ``(kv_map, inv, count)``:
        kv_map int32[B, Hk, Ktf]: fine tile -> compact position, -1 for
          tiles dead in the union (they are never scheduled, and -1
          never matches a schedule entry in the vote decode).
        inv int32[B, Hk, Ktf]: compact position -> fine tile; positions
          past ``count`` hold the dead fine indices (in order) so every
          entry stays an in-bounds tile index.
        count int32[B, Hk]: live-union tile count.
    """
    b, h, _, ktf = do_mask.shape
    hk = hk or h
    u = jnp.any(do_mask.reshape(b, hk, -1, ktf), axis=2)
    csum = jnp.cumsum(u.astype(jnp.int32), axis=-1)
    kv_map = jnp.where(u, csum - 1, -1)
    iota = jnp.arange(ktf, dtype=jnp.int32)
    # Live fine indices first (ascending), dead after: a tiny per-row
    # sort ([B, Hk, Ktf] ints), nowhere near the minor-dim-gather
    # pathology of the old XLA compaction (round-3 gotcha c).
    inv = jnp.argsort(jnp.where(u, iota, ktf + iota), axis=-1)
    return kv_map, inv.astype(jnp.int32), csum[..., -1]


def _copy_kernel(inv_ref, in_ref, out_ref):
    del inv_ref
    out_ref[...] = in_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_kv(
    kvp: jax.Array,
    inv: jax.Array,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Gather packed K|V tiles into union-compact order.

    ``out[:, :, c*128:(c+1)*128] = kvp[:, :, inv[c]*128:(c+1)*128]`` --
    a scalar-prefetch tile gather (the paged-attention index pattern):
    the block index map reads the compact->fine map directly, so each
    128-row K|V tile moves as one pipelined 64 KB DMA. Positions past
    the union count copy dead tiles (valid garbage; no schedule entry
    ever points there). The output keeps the full static shape -- XLA
    needs static shapes, and the tail copy costs less than the branch
    to avoid it.
    """
    if interpret is None:
        interpret = _default_interpret()
    b, hk, skp, dd = kvp.shape
    assert skp % VOTE_TILE == 0
    ktf = skp // VOTE_TILE
    assert inv.shape == (b, hk, ktf), (inv.shape, (b, hk, ktf))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hk, ktf),
        in_specs=[
            pl.BlockSpec(
                (1, 1, VOTE_TILE, dd),
                lambda bi, hi, ci, inv_ref: (
                    bi, hi, inv_ref[bi, hi, ci], 0
                ),
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, VOTE_TILE, dd),
            lambda bi, hi, ci, inv_ref: (bi, hi, ci, 0),
        ),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kvp.shape, kvp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(inv, kvp)


__all__ = ["kv_union_map", "compact_kv"]
