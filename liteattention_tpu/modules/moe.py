"""Mixture-of-Experts FFN with expert parallelism (all_to_all over ICI).

The reference ships no MoE and no expert parallelism (SURVEY §2.4:
"Expert Parallelism — Absent"); this is a beyond-parity building block
completing the parallelism table (dp/ZeRO, tp, sp, ring, pp, ep).

GShard/Switch-style static-shape routing -- the TPU-native form: every
shape is fixed at trace time (top-k routing into a fixed per-expert
``capacity``; overflow tokens are dropped, i.e. pass through with zero
expert contribution), so the whole layer jits with no dynamic shapes.
Dispatch/combine are one-hot einsums that XLA lowers onto the MXU.

Expert parallelism: tokens stay batch-sharded over the ``ep`` axis; each
device routes its local tokens into ``[E, C_local, D]``, an
``all_to_all`` regroups by expert (device i keeps experts
``[i*E/n, (i+1)*E/n)`` and receives every device's slots for them), the
local experts run as one batched einsum, and the reverse ``all_to_all``
brings results home for the local combine. Two ICI collectives per
layer, exactly the GShard schedule.

Functional core (plain param pytree) + a thin flax wrapper for
single-device stacks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def init_moe_params(
    key,
    dim: int,
    hidden: int,
    num_experts: int,
    dtype=jnp.float32,
):
    """Param pytree: router [D, E], wi [E, D, F], wo [E, F, D]."""
    kr, ki, ko = jax.random.split(key, 3)
    s_in = 1.0 / (dim**0.5)
    s_hid = 1.0 / (hidden**0.5)
    return {
        "router": (jax.random.normal(kr, (dim, num_experts)) * s_in
                   ).astype(jnp.float32),
        "wi": (jax.random.normal(ki, (num_experts, dim, hidden)) * s_in
               ).astype(dtype),
        "wo": (jax.random.normal(ko, (num_experts, hidden, dim)) * s_hid
               ).astype(dtype),
    }


def _route(x, router, top_k: int, capacity: int):
    """Static-shape top-k routing.

    Returns (dispatch [T, E, C] 0/1, combine [T, E, C] gate-weighted,
    aux_loss). Positions are slot-major (all first choices before any
    second choice), the GShard priority order.
    """
    t, _ = x.shape
    e = router.shape[1]
    # f32 matmuls need precision=HIGHEST on TPU (default rounds the
    # operands through bf16 -- near-tied router logits would flip
    # top-k routing vs the f32 semantics the tests check).
    logits = jnp.einsum(
        "td,de->te", x.astype(jnp.float32), router,
        precision=jax.lax.Precision.HIGHEST,
    )
    probs = jax.nn.softmax(logits, axis=-1)  # [T, E]
    gates, experts = jax.lax.top_k(probs, top_k)  # [T, k]
    gates = gates / jnp.maximum(gates.sum(-1, keepdims=True), 1e-9)
    de = jax.nn.one_hot(experts, e, dtype=jnp.float32)  # [T, k, E]
    # Position of each (token, slot) within its expert's capacity:
    # count of same-expert assignments strictly before it, slot-major.
    flat = de.transpose(1, 0, 2).reshape(top_k * t, e)
    pos_flat = jnp.cumsum(flat, axis=0) - flat
    pos = (
        (pos_flat * flat).sum(-1).reshape(top_k, t).T
    )  # [T, k] float counts
    keep = pos < capacity
    pe = (
        jax.nn.one_hot(pos.astype(jnp.int32), capacity)
        * keep[..., None]
    )  # [T, k, C]
    dispatch = jnp.einsum("tke,tkc->tec", de, pe)
    combine = jnp.einsum("tk,tke,tkc->tec", gates, de, pe)
    # Switch-Transformer load-balance loss: E * sum_e f_e * p_e with
    # f_e the routed-token fraction (first choice), p_e the mean router
    # probability (arXiv:2101.03961 eq. 4-6).
    f = jnp.mean(de[:, 0, :], axis=0)
    p = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(f * p)
    return dispatch, combine, aux


def _experts_apply(wi, wo, xd):
    """Batched expert FFN: xd [E, C, D] -> [E, C, D]. f32 weights get
    precision=HIGHEST (CLAUDE.md rule); bf16 is fine with default."""
    prec = (
        jax.lax.Precision.HIGHEST
        if wi.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    h = jnp.einsum(
        "ecd,edf->ecf", xd.astype(wi.dtype), wi,
        preferred_element_type=jnp.float32, precision=prec,
    )
    h = jax.nn.gelu(h)
    return jnp.einsum(
        "ecf,efd->ecd", h.astype(wo.dtype), wo,
        preferred_element_type=jnp.float32, precision=prec,
    )


def moe_forward(
    params,
    x: jax.Array,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    capacity: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-device MoE FFN. ``x [T, D]`` -> ``(y [T, D], aux_loss)``."""
    t, d = x.shape
    e = params["router"].shape[1]
    if capacity is None:
        capacity = max(1, int(capacity_factor * top_k * t / e))
    dispatch, combine, aux = _route(x, params["router"], top_k, capacity)
    xd = jnp.einsum("tec,td->ecd", dispatch, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    yd = _experts_apply(params["wi"], params["wo"], xd)
    y = jnp.einsum("tec,ecd->td", combine, yd,
               precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype), aux


def moe_forward_expert_parallel(
    params,
    x: jax.Array,
    axis_name: str,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    capacity: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Expert-parallel body; call inside ``shard_map`` with tokens
    batch-sharded over ``axis_name`` and the expert-stacked ``wi/wo``
    leaves sharded on their leading E axis (router replicated).

    ``x [T_local, D]``; this device holds ``E/n`` experts. Two
    ``all_to_all`` hops move (dispatched slots -> expert homes -> back).
    Aux loss is psum-averaged over the axis.
    """
    n = jax.lax.axis_size(axis_name)
    t, d = x.shape
    e_local = params["wi"].shape[0]
    e = e_local * n
    if capacity is None:
        capacity = max(1, int(capacity_factor * top_k * t / e))
    router = params["router"]
    dispatch, combine, aux = _route(x, router, top_k, capacity)
    xd = jnp.einsum("tec,td->ecd", dispatch, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    # [E, C, D] -> [E/n, n*C, D]: device i receives every device's
    # slots for its own experts.
    xd = jax.lax.all_to_all(
        xd, axis_name, split_axis=0, concat_axis=1, tiled=True
    )
    yd = _experts_apply(params["wi"], params["wo"], xd)
    yd = jax.lax.all_to_all(
        yd, axis_name, split_axis=1, concat_axis=0, tiled=True
    )
    y = jnp.einsum("tec,ecd->td", combine, yd,
               precision=jax.lax.Precision.HIGHEST)
    aux = jax.lax.pmean(aux, axis_name)
    return y.astype(x.dtype), aux


def moe_apply_sharded(
    params,
    x: jax.Array,
    mesh: Mesh,
    axis_name: str = "ep",
    top_k: int = 2,
    capacity_factor: float = 1.25,
    capacity: Optional[int] = None,
):
    """Jit-able global entry: ``x [B, D]`` batch-sharded over
    ``axis_name``; expert weights sharded one-group-per-device.
    The static ``capacity`` is computed from the LOCAL token count so
    single-device and expert-parallel results match exactly when no
    token overflows."""
    n = mesh.shape[axis_name]
    e = params["router"].shape[1]
    assert e % n == 0, f"num_experts {e} not divisible by |{axis_name}|={n}"
    assert x.shape[0] % n == 0, "token count not divisible by the ep axis"
    if capacity is None:
        t_local = x.shape[0] // n
        capacity = max(1, int(capacity_factor * top_k * t_local / e))

    def local(p, xs):
        return moe_forward_expert_parallel(
            p, xs, axis_name, top_k=top_k, capacity=capacity,
        )

    pspec = {
        "router": P(),
        "wi": P(axis_name),
        "wo": P(axis_name),
    }
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, P(axis_name)),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    )(params, x)


class MoEMlp(nn.Module):
    """Flax wrapper for single-device stacks (drop-in for ``Mlp``)."""

    dim: int
    hidden: int
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        params = self.param(
            "moe",
            lambda key: init_moe_params(
                key, self.dim, self.hidden, self.num_experts, self.dtype
            ),
        )
        shape = x.shape
        y, aux = moe_forward(
            params,
            x.reshape(-1, shape[-1]),
            top_k=self.top_k,
            capacity_factor=self.capacity_factor,
        )
        self.sow("losses", "moe_aux", aux)
        return y.reshape(shape)


__all__ = [
    "MoEMlp",
    "init_moe_params",
    "moe_forward",
    "moe_forward_expert_parallel",
    "moe_apply_sharded",
]
