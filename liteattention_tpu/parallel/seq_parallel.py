"""Mesh-native sequence-parallel LiteAttention (ICI KV-split).

The reference's sequence parallelism is manual: ``SeqParallelLiteAttention``
holds one skip state per KV split, the *user* moves tensors with NCCL and
merges partial outputs with ``flash_attn_combine``
(reference hopper/lite_attention.py:322-345, README.md:199-250).

On TPU the whole pattern is one ``shard_map`` over an ICI mesh axis
(SURVEY.md section 2.4 / section 7 decision 5):

* K/V are sharded on the sequence axis; Q is replicated (the reference's
  KV-split scheme).
* The skip-mask state is sharded on its **k-tile axis with the KV shard**
  -- each chip owns exactly the mask rows for the K-tiles it holds, so
  mask evolution is fully local (``split_idx`` disappears: it is the mesh
  coordinate).
* Partial (out, lse) merge with pmax/psum collectives riding ICI
  (:func:`liteattention_tpu.ops.combine.combine_attention_psum`),
  replacing the user-side gather + combine kernel.

Multi-chip validation runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``); the math is
device-count-independent.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


from liteattention_tpu.ops.combine import combine_attention_psum
from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.lite_flash_fwd import (
    VOTE_TILE,
    lite_flash_attention,
    pack_kv,
)
from liteattention_tpu.ops.mask import (
    SkipMaskState,
    cdiv,
    compact_mask_gather,
    init_mask,
    update_mask,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes


def seq_parallel_spec(axis_name: str = "sp"):
    """PartitionSpecs for (state, q, k, v) under KV-split sequence parallelism."""
    return dict(
        state=SkipMaskState(
            do_mask=P(None, None, None, axis_name), step=P()
        ),
        q=P(None, None, None, None),
        kv=P(None, None, axis_name, None),
        out=P(None, None, None, None),
    )


def make_seq_parallel_attention(
    mesh: Mesh,
    axis_name: str = "sp",
    block_sizes: Optional[BlockSizes] = None,
):
    """Build (init_fn, step_fn) for mesh-sharded LiteAttention.

    ``init_fn(batch, heads, seqlen_q, seqlen_k, head_dim)`` returns a
    :class:`SkipMaskState` whose k-tile axis is sharded over ``axis_name``.

    ``step_fn(state, q, k, v, threshold)`` returns
    ``(out, lse, new_state)`` -- one jitted, shard_mapped call; out/lse are
    replicated, the state shard stays resident on its chip.

    Constraint: the per-chip KV shard length must divide evenly into
    k-tiles (``seqlen_k % (n_devices * block_k) == 0``) so that tile
    geometry is identical on every chip.
    """
    n = mesh.shape[axis_name]

    def init_fn(
        batch: int,
        heads: int,
        seqlen_q: int,
        seqlen_k: int,
        head_dim: int,
        dtype_bytes: int = 2,
    ) -> SkipMaskState:
        bs = block_sizes or get_block_sizes(head_dim, dtype_bytes, kind="lite")
        assert seqlen_k % (n * bs.block_k) == 0, (
            f"seqlen_k={seqlen_k} must divide evenly into {n} shards of "
            f"block_k={bs.block_k} tiles"
        )
        # Fine-granularity mask (matches lite_attention_init); shard
        # constraint above keeps per-chip fine tiles block-aligned.
        st = init_mask(
            batch, heads, seqlen_q, seqlen_k, VOTE_TILE, VOTE_TILE
        )
        spec = seq_parallel_spec(axis_name)["state"]
        return SkipMaskState(
            do_mask=jax.device_put(
                st.do_mask, NamedSharding(mesh, spec.do_mask)
            ),
            step=jax.device_put(st.step, NamedSharding(mesh, spec.step)),
        )

    def _local_step(state_mask, step, q, k_shard, v_shard, thr):
        d = q.shape[-1]
        bs = block_sizes or get_block_sizes(d, q.dtype.itemsize, kind="lite")
        bq = min(bs.block_q, max(128, cdiv(q.shape[2], 128) * 128))
        fidx, count, qbits = compact_mask_gather(
            state_mask, bq // VOTE_TILE
        )
        # Pre-interleaved K|V (pack_kv): the concat fuses into whatever
        # produced the shard, so the kernel's in-call interleave cost
        # disappears (see ops/lite_flash_fwd.pack_kv).
        out_l, lse_l, votes = lite_flash_attention(
            q, None, None, fidx, count, thr, kv_bits=qbits,
            block_sizes=bs, fine_schedule=True,
            packed_kv=pack_kv(k_shard, v_shard),
            seqlen_k=k_shard.shape[2],
        )
        votes = votes[:, :, : state_mask.shape[2], : state_mask.shape[3]]
        out, lse = combine_attention_psum(out_l, lse_l, axis_name)
        new_state = update_mask(SkipMaskState(state_mask, step), votes)
        return out, lse, new_state.do_mask, new_state.step

    specs = seq_parallel_spec(axis_name)

    @jax.jit
    def step_fn(state: SkipMaskState, q, k, v, threshold):
        thr = jnp.asarray(threshold, jnp.float32)
        out, lse, new_mask, new_step = jax.shard_map(
            _local_step,
            mesh=mesh,
            in_specs=(
                specs["state"].do_mask,
                specs["state"].step,
                specs["q"],
                specs["kv"],
                specs["kv"],
                P(),
            ),
            out_specs=(
                specs["out"],
                P(None, None, None),
                specs["state"].do_mask,
                specs["state"].step,
            ),
            check_vma=False,
        )(state.do_mask, state.step, q, k, v, thr)
        return out, lse, SkipMaskState(new_mask, new_step)

    return init_fn, step_fn


def seq_parallel_attention_step(
    state: SkipMaskState,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    threshold,
    axis_name: str = "sp",
    block_sizes: Optional[BlockSizes] = None,
    emit_votes: bool = True,
):
    """One KV-split sequence-parallel lite-attention step, for use inside
    a jitted model whose inputs are already sharded (e.g. WanModel with
    ``sp_axis`` set). Wraps the local step in shard_map over the ambient
    mesh: Q replicated, K/V + mask sharded on ``axis_name``, outputs
    merged with the psum LSE combine.

    Returns (out, new_state) with out replicated and the mask shard left
    on its chip. ``emit_votes=False`` runs the no-vote kernel on the
    frozen shard masks (round-3 vote-stride amortization; each chip's
    mask shard is carried through unchanged).
    """
    mesh = jax.sharding.get_abstract_mesh()

    def local(do_mask, step, q, k_sh, v_sh, thr):
        d = q.shape[-1]
        bs = block_sizes or get_block_sizes(d, q.dtype.itemsize, kind="lite")
        bq = min(bs.block_q, max(128, cdiv(q.shape[2], 128) * 128))
        fidx, count, qbits = compact_mask_gather(
            do_mask, bq // VOTE_TILE
        )
        o_l, lse_l, votes = lite_flash_attention(
            q, None, None, fidx, count, thr, kv_bits=qbits,
            block_sizes=bs, fine_schedule=True, emit_votes=emit_votes,
            packed_kv=pack_kv(k_sh, v_sh), seqlen_k=k_sh.shape[2],
        )
        out, _ = combine_attention_psum(o_l, lse_l, axis_name)
        if not emit_votes:
            return out, do_mask, step
        votes = votes[:, :, : do_mask.shape[2], : do_mask.shape[3]]
        st = update_mask(SkipMaskState(do_mask, step), votes)
        return out, st.do_mask, st.step

    out, new_mask, new_step = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, None, axis_name),
            P(),
            P(None, None, None, None),
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
            P(),
        ),
        out_specs=(
            P(None, None, None, None),
            P(None, None, None, axis_name),
            P(),
        ),
        check_vma=False,
    )(state.do_mask, state.step,
      q, k, v, jnp.asarray(threshold, jnp.float32))
    return out, SkipMaskState(new_mask, new_step)


__all__ = [
    "make_seq_parallel_attention",
    "seq_parallel_attention_step",
    "seq_parallel_spec",
]
