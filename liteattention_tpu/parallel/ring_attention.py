"""Ring attention: context-parallel exact attention over an ICI ring.

Goes beyond the reference's inference KV-split (SURVEY §2.4: "ring
attention absent as an algorithm; the KV-split + LSE-combine primitive
is the building block" -- reference README.md:199-250 only merges
caller-split partials). Here the full algorithm: q/k/v are
sequence-sharded over a mesh axis, each device computes flash attention
of its q shard against one rotating KV shard per step, KV shards travel
the ring with ``ppermute`` (neighbor hops on ICI, never DCN), and the
per-step partials merge with the same online-softmax algebra as
``ops/combine.combine_attention``. n-1 hops stream the whole sequence
past every q shard while only ever holding 2 KV shards per device --
long-context attention whose per-device memory is O(S/n).

Causal masking is block-level exact: a KV shard strictly left of the q
shard attends fully, the diagonal shard runs the causal kernel, and
strictly-right shards are skipped entirely (``lax.switch`` executes one
branch, so skipped blocks cost no FLOPs -- the TPU analog of the
reference's do-range skipping, applied at ring granularity).

Differentiable via a custom VJP on the ring itself: the flash kernels'
own VJP ignores the lse cotangent (lse is diagnostics in the reference
API), but the ring's merge weights DO depend on lse -- naive AD through
the merge silently drops that term (caught by the grad-vs-oracle test).
Instead the backward runs a second ring: per visiting shard, the flash
backward kernel with the GLOBAL (out, lse, do) yields the block's exact
(dq, dk_j, dv_j) -- the same tiling identity the kernel uses internally
across k-blocks -- and the dk/dv accumulators travel the ring with
their shard, arriving home after the full cycle.
"""

from __future__ import annotations

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from liteattention_tpu.ops.flash_fwd import flash_attention


def _merge(acc: Tuple[jax.Array, jax.Array], new):
    """Online-softmax merge of two normalized partials (same algebra as
    ops/combine.combine_attention, pairwise form)."""
    ao, al = acc
    no, nl = new
    nl = nl.astype(jnp.float32)
    m = jnp.maximum(al, nl)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w1 = jnp.exp(al - m_safe)
    w2 = jnp.exp(nl - m_safe)
    den = w1 + w2
    tiny = jnp.finfo(jnp.float32).tiny
    out = (
        ao * w1[..., None] + no.astype(jnp.float32) * w2[..., None]
    ) / jnp.maximum(den, tiny)[..., None]
    lse = jnp.where(den == 0.0, -jnp.inf, m_safe + jnp.log(den))
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _ring_core(axis_name, causal, scale, interpret, q, k, v):
    out, lse = _ring_fwd_pass(
        axis_name, causal, scale, interpret, q, k, v
    )
    return out, lse


def _ring_fwd_pass(axis_name, causal, scale, interpret, q, k, v):
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, sl, d = q.shape

    def attend(kb, vb, diag_causal: bool):
        return flash_attention(
            q,
            kb,
            vb,
            scale=scale,
            causal=diag_causal,
            return_lse=True,
            interpret=interpret,
        )

    def full_blk(kv):
        o, l = attend(kv[0], kv[1], False)
        return o.astype(jnp.float32), l.astype(jnp.float32)

    def diag_blk(kv):
        o, l = attend(kv[0], kv[1], True)
        return o.astype(jnp.float32), l.astype(jnp.float32)

    def empty_blk(kv):
        return (
            jnp.zeros((b, h, sl, d), jnp.float32),
            jnp.full((b, h, sl), -jnp.inf, jnp.float32),
        )

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, step):
        kv, acc = carry
        # After `step` receives from the left neighbor, the resident
        # shard is the one originally owned by (my - step) mod n.
        owner = jax.lax.rem(my - step + n, n)
        if causal:
            # 0: strictly left -> full; 1: diagonal -> causal kernel;
            # 2: strictly right -> skipped (one switch branch executes).
            case = jnp.where(owner < my, 0, jnp.where(owner == my, 1, 2))
            part = jax.lax.switch(
                case, (full_blk, diag_blk, empty_blk), kv
            )
        else:
            part = full_blk(kv)
        acc = _merge(acc, part)
        # The rotation is independent of this step's result, so XLA may
        # overlap the ICI hop with the local kernel.
        kv = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), kv
        )
        return (kv, acc), None

    acc0 = (
        jnp.zeros((b, h, sl, d), jnp.float32),
        jnp.full((b, h, sl), -jnp.inf, jnp.float32),
    )
    (_, (out, lse)), _ = jax.lax.scan(
        body, ((k, v), acc0), jnp.arange(n)
    )
    return out.astype(q.dtype), lse


def _ring_core_fwd(axis_name, causal, scale, interpret, q, k, v):
    out, lse = _ring_fwd_pass(
        axis_name, causal, scale, interpret, q, k, v
    )
    return (out, lse), (q, k, v, out, lse)


def _ring_core_bwd(axis_name, causal, scale, interpret, res, grads):
    """Ring backward: the combined output IS the global attention, so
    per-block flash backward with the GLOBAL (out, lse, do) yields each
    block's exact (dq, dk_j, dv_j) contribution -- the merge weights
    never need differentiating (they are softmax algebra the global lse
    already absorbs). dk/dv accumulators travel the ring WITH their
    shard and arrive home after the full cycle; dq accumulates locally.
    (The lse cotangent is ignored like the flash VJP itself --
    lse is diagnostics, not a differentiable output.)"""
    from liteattention_tpu.ops.flash_bwd import flash_attention_bwd

    q, k, v, out, lse, = res
    do, _ = grads
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)

    def bwd_blk(kb, vb, diag_causal: bool):
        return flash_attention_bwd(
            q, kb, vb, out, lse, do, scale, diag_causal,
            interpret=interpret,
        )

    def full_blk(kv):
        dq, dk, dv = bwd_blk(kv[0], kv[1], False)
        return dq.astype(jnp.float32), dk.astype(jnp.float32), dv.astype(
            jnp.float32
        )

    def diag_blk(kv):
        dq, dk, dv = bwd_blk(kv[0], kv[1], True)
        return dq.astype(jnp.float32), dk.astype(jnp.float32), dv.astype(
            jnp.float32
        )

    def empty_blk(kv):
        return (
            jnp.zeros(q.shape, jnp.float32),
            jnp.zeros(kv[0].shape, jnp.float32),
            jnp.zeros(kv[1].shape, jnp.float32),
        )

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, step):
        (kb, vb, dkb, dvb), dq = carry
        owner = jax.lax.rem(my - step + n, n)
        if causal:
            case = jnp.where(owner < my, 0, jnp.where(owner == my, 1, 2))
            dq_c, dk_c, dv_c = jax.lax.switch(
                case, (full_blk, diag_blk, empty_blk), (kb, vb)
            )
        else:
            dq_c, dk_c, dv_c = full_blk((kb, vb))
        ring = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm),
            (kb, vb, dkb + dk_c, dvb + dv_c),
        )
        return (ring, dq + dq_c), None

    carry0 = (
        (k, v, jnp.zeros(k.shape, jnp.float32),
         jnp.zeros(v.shape, jnp.float32)),
        jnp.zeros(q.shape, jnp.float32),
    )
    ((_, _, dk, dv), dq), _ = jax.lax.scan(
        body, carry0, jnp.arange(n)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = False,
    scale: Optional[float] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Per-shard ring attention body; call inside ``shard_map`` with
    ``q/k/v [B, H, S/n, D]`` (kernel-native layout) sequence-sharded
    over ``axis_name``.

    Returns ``out [B, H, S/n, D]`` (and the natural-log LSE
    ``[B, H, S/n]`` when ``return_lse``).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    out, lse = _ring_core(
        axis_name, causal, float(scale), interpret, q, k, v
    )
    if return_lse:
        return out, lse
    return out


def ulysses_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Ulysses/DeepSpeed-style context parallelism (the other algorithm
    SURVEY §2.4 lists as absent upstream): instead of rotating KV, one
    ``all_to_all`` re-shards from sequence-sharded ``[B, H, S/n, D]`` to
    head-sharded ``[B, H/n, S, D]``, the local flash kernel runs the
    FULL sequence for its head group (exact causality for free -- no
    block scheduling), and a second ``all_to_all`` restores sequence
    sharding. Two collectives total vs the ring's n-1 hops; requires
    ``H % n == 0`` (the ring has no such constraint). Call inside
    ``shard_map``."""
    n = jax.lax.axis_size(axis_name)
    h = q.shape[1]
    assert h % n == 0, f"heads {h} not divisible by |{axis_name}|={n}"
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)

    def seq_to_head(x):
        # [B, Hl, S/n, D] local -> [B, Hl/n, S, D] local.
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    qh, kh, vh = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    out = flash_attention(
        qh, kh, vh, scale=scale, causal=causal, interpret=interpret
    )
    return jax.lax.all_to_all(
        out, axis_name, split_axis=2, concat_axis=1, tiled=True
    )


def ulysses_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Jit-able global entry for :func:`ulysses_attention_local`
    (``q/k/v [B, H, S, D]``, S and H divisible by the axis size)."""

    def local(qs, ks, vs):
        return ulysses_attention_local(
            qs, ks, vs, axis_name, causal=causal, scale=scale,
            interpret=interpret,
        )

    spec = P(None, None, axis_name, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)


def ring_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Jit-able global entry: ``q/k/v [B, H, S, D]`` (kernel-native) with ``S`` divisible
    by the mesh axis size; shards on ``axis_name``, runs the ring, and
    returns the exact global attention output."""

    def local(qs, ks, vs):
        return ring_attention_local(
            qs, ks, vs, axis_name, causal=causal, scale=scale,
            interpret=interpret,
        )

    spec = P(None, None, axis_name, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)


__all__ = ["ring_attention_local", "ring_self_attention",
           "ulysses_attention_local", "ulysses_self_attention"]
