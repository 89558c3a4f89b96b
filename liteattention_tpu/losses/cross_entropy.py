"""Fused cross-entropy loss, with a vocab-sharded tensor-parallel form.

TPU-native counterpart of the reference's Triton fused CE
(reference flash_attn/losses/cross_entropy.py +
flash_attn/ops/triton/cross_entropy.py:330): label smoothing,
z-loss (lse^2 regularization), ignore-index, and the TP variant where
logits are sharded on the vocab dim and only two scalars per token are
all-reduced (never the full logits).

XLA fuses the logsumexp + gather chain into one pass over the logits
row, which is what the Triton kernel hand-writes; the interesting part
to preserve is the *communication* structure of the parallel form.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
    reduction: str = "mean",
) -> jax.Array:
    """CE over [..., V] logits and integer labels (reference arg surface
    of ``CrossEntropyLoss``, losses/cross_entropy.py)."""
    lf = logits.astype(jnp.float32) * logit_scale
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    true_logit = jnp.take_along_axis(
        lf, labels[..., None].clip(0), axis=-1
    )[..., 0]
    loss = lse - true_logit
    if label_smoothing > 0.0:
        smooth = lse - jnp.mean(lf, axis=-1)
        loss = (1.0 - label_smoothing) * loss + label_smoothing * smooth
    if lse_square_scale > 0.0:
        loss = loss + lse_square_scale * lse * lse
    mask = labels != ignore_index
    loss = jnp.where(mask, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    denom = jnp.maximum(mask.sum(), 1)
    return loss.sum() / denom


def parallel_cross_entropy_loss(
    logits_local: jax.Array,
    labels: jax.Array,
    axis_name: str = "tp",
    label_smoothing: float = 0.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
    reduction: str = "mean",
) -> jax.Array:
    """CE with vocab-sharded logits inside ``shard_map``.

    Each rank holds ``logits_local [..., V/tp]`` for vocab slice
    ``[rank*Vl, (rank+1)*Vl)``. Communication: one ``pmax`` (global max)
    + two ``psum`` scalars per token -- the reference's TP CE recipe
    (tests/losses/test_cross_entropy_parallel.py validates the same
    contract against a gathered baseline).
    """
    vl = logits_local.shape[-1]
    rank = jax.lax.axis_index(axis_name)
    lf = logits_local.astype(jnp.float32)
    m_local = jnp.max(lf, axis=-1)
    m = jax.lax.pmax(m_local, axis_name)
    sumexp = jax.lax.psum(
        jnp.sum(jnp.exp(lf - m[..., None]), axis=-1), axis_name
    )
    lse = m + jnp.log(sumexp)

    local_label = labels - rank * vl
    in_shard = (local_label >= 0) & (local_label < vl)
    gathered = jnp.take_along_axis(
        lf, local_label.clip(0, vl - 1)[..., None], axis=-1
    )[..., 0]
    true_logit = jax.lax.psum(
        jnp.where(in_shard, gathered, 0.0), axis_name
    )
    loss = lse - true_logit
    if label_smoothing > 0.0:
        mean_logit = jax.lax.psum(jnp.sum(lf, axis=-1), axis_name) / (
            vl * jax.lax.axis_size(axis_name)
        )
        loss = (1.0 - label_smoothing) * loss + label_smoothing * (
            lse - mean_logit
        )
    if lse_square_scale > 0.0:
        loss = loss + lse_square_scale * lse * lse
    mask = labels != ignore_index
    loss = jnp.where(mask, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    return loss.sum() / jnp.maximum(mask.sum(), 1)


__all__ = ["cross_entropy_loss", "parallel_cross_entropy_loss"]
