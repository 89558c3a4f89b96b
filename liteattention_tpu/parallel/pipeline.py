"""Pipeline parallelism: GPipe-style microbatch pipeline over a mesh axis.

The reference ships NO pipeline parallelism (SURVEY §2.4: "Pipeline
Parallelism — Absent"); this is a beyond-parity building block for
scaling depth across chips. TPU-native shape: the layer stack is split
into ``n`` stages, one per device along the ``pp`` mesh axis; a
microbatched input streams through, activations hop stage-to-stage with
``ppermute`` (one ICI neighbor hop per tick), and every stage computes
every tick (the classic SPMD pipeline: the warm-up/drain bubble costs
``(n-1)/(M+n-1)`` of the ticks for ``M`` microbatches).

Differentiable end-to-end: the schedule is a ``lax.scan`` whose AD
reverses the ticks, turning forward hops into cotangent hops backward
through the same ring -- no hand-written backward schedule needed.

Usage (inside or outside ``shard_map`` -- the entry wraps it):

    stage_params: pytree whose leaves are stacked on axis 0 with length
      ``n_stages`` (stage i uses leaf[i]);
    stage_fn(params_i, x) -> x: one stage's forward.

    y = pipeline_apply(stage_fn, stage_params, x, mesh, "pp",
                       num_microbatches=M)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply_local(
    stage_fn: Callable,
    params_local,
    x: jax.Array,
    axis_name: str,
    num_microbatches: int,
):
    """Per-device pipeline body; call inside ``shard_map``.

    ``params_local`` is THIS stage's parameter pytree (the stacked
    leading axis already indexed away by the shard_map spec). ``x`` is
    the full batch, replicated; it is split into ``num_microbatches``
    along axis 0. Returns the full output batch (valid on every device;
    the last stage's results are broadcast back through the ring hop).
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
    mb = b // m
    xs = x.reshape(m, mb, *x.shape[1:])
    ticks = m + n - 1

    # perm moves stage i's output to stage i+1; the last stage's output
    # wraps to stage 0, which is where finished microbatches are
    # collected (then psum-broadcast at the end).
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, t):
        buf, ys = carry
        # Stage 0 ingests microbatch t (zeros after the stream ends);
        # other stages take the hopped-in activation.
        feed = jnp.where(
            t < m, xs[jnp.minimum(t, m - 1)], jnp.zeros_like(xs[0])
        )
        inp = jnp.where(my == 0, feed, buf)
        out = stage_fn(params_local, inp)
        nxt = jax.lax.ppermute(out, axis_name, perm)
        # After the hop, stage 0 holds the LAST stage's tick-t output =
        # finished microbatch t-(n-1).
        done_idx = t - (n - 1)
        ys = jnp.where(
            (my == 0) & (done_idx >= 0),
            jax.lax.dynamic_update_index_in_dim(
                ys, nxt, jnp.maximum(done_idx, 0), 0
            ),
            ys,
        )
        return (nxt, ys), None

    # Probe the stage output shape for the collect buffer.
    out_shape = jax.eval_shape(stage_fn, params_local, xs[0])
    assert out_shape.shape == xs[0].shape, (
        "pipeline stages must be shape-preserving (homogeneous stack): "
        f"stage maps {xs[0].shape} -> {out_shape.shape}"
    )
    ys0 = jnp.zeros((m,) + out_shape.shape, out_shape.dtype)
    (_, ys), _ = jax.lax.scan(
        body, (jnp.zeros(out_shape.shape, out_shape.dtype), ys0),
        jnp.arange(ticks),
    )
    # Results live on stage 0 only; broadcast so every device returns
    # the same full batch (out_specs P() replication).
    ys = jax.lax.psum(jnp.where(my == 0, ys, jnp.zeros_like(ys)),
                      axis_name)
    return ys.reshape(b, *ys.shape[2:])


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    axis_name: str = "pp",
    num_microbatches: Optional[int] = None,
):
    """Jit-able global entry. ``stage_params`` leaves are stacked on a
    leading ``n_stages`` axis (sharded one-stage-per-device over
    ``axis_name``); ``x`` is the global batch (replicated). Returns the
    sequential composition ``stage_{n-1}(... stage_0(x))`` computed as a
    microbatched pipeline."""
    n = mesh.shape[axis_name]
    for leaf in jax.tree_util.tree_leaves(stage_params):
        # P(axis_name) would silently SPLIT a larger multiple across
        # devices and p[0] would then drop stages -- require exactly
        # one stage per device.
        assert leaf.shape[0] == n, (
            f"stage_params leaf has {leaf.shape[0]} stages but the "
            f"'{axis_name}' axis has {n} devices"
        )
    if num_microbatches is None:
        num_microbatches = n

    def local(params_stacked, x):
        # in_specs puts leaf[i] on device i with a size-1 leading axis.
        params_local = jax.tree_util.tree_map(
            lambda p: p[0], params_stacked
        )
        return pipeline_apply_local(
            stage_fn, params_local, x, axis_name, num_microbatches
        )

    pspec = jax.tree_util.tree_map(lambda _: P(axis_name), stage_params)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, x)


__all__ = ["pipeline_apply", "pipeline_apply_local"]
