"""Model diagnostics: causality monitor and parameter stats.

Reference analogs:
- training/src/callbacks/causality_monitor.py — per-position gradient
  leakage forward in time: for a causal model, d y[k] / d x[s] ≈ 0 for
  every s > k. The reference runs it at epoch end on random
  post-embedding inputs and logs ``stats/causality_{i}``.
- training/src/callbacks/params_log.py — total / trainable /
  non-trainable parameter counts logged at fit start.
- training/src/callbacks/loss_scale_monitor.py — tracks the AMP
  GradScaler's loss scale. NOT ported: JAX-on-TPU trains in bf16
  without dynamic loss scaling, so there is no scale to monitor (the
  descope is structural, not a gap).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["causality_leakage", "check_causal", "param_stats"]


def causality_leakage(
    fn: Callable[[jax.Array], jax.Array],
    seq_len: int = 10,
    input_dim: int = 16,
    batch: int = 2,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-position future-gradient leakage of ``fn: [B,L,D] -> [B,L,*]``.

    Returns a length-``seq_len`` vector whose entry k is
    mean_{s>k} |d mean(y[0, k]) / d x[0, s, :]| — the reference's
    ``stats/causality_{i}`` quantity (causality_monitor.py:53-57); the
    last entry is 0 by construction (no future to leak from). A causal
    model returns ~0 everywhere; any bidirectional mixing shows up as a
    positive leak at the positions that see the future.

    Like the reference, this probes POST-embedding float inputs (int
    token ids carry no gradient) — pass the model's trunk, e.g. a
    closure over blocks+norm with the embedding skipped.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, seq_len, input_dim), jnp.float32)

    def head(z, k):
        return jnp.mean(fn(z)[0, k])

    leaks = []
    for k in range(seq_len):
        g = jax.grad(head)(x, k)  # [B, L, D]
        future = g[0, k + 1:, :]
        leaks.append(
            jnp.mean(jnp.abs(future)) if future.size else jnp.zeros(())
        )
    return jnp.stack(leaks)


def check_causal(
    fn: Callable[[jax.Array], jax.Array],
    seq_len: int = 10,
    input_dim: int = 16,
    tol: float = 1e-6,
) -> bool:
    """True iff ``fn`` leaks no gradient from the future (max leak below
    ``tol``). Convenience wrapper for tests/monitor hooks."""
    return bool(
        jnp.max(causality_leakage(fn, seq_len, input_dim)) < tol
    )


def param_stats(
    params,
    trainable_mask=None,
) -> Dict[str, float]:
    """Parameter-count stats (reference ParamsLog.on_fit_start).

    ``trainable_mask``: optional pytree of bools matching ``params``
    (JAX has no requires_grad; frozen subsets are an optax
    ``masked``/``set_to_zero`` choice, so the mask is explicit). Also
    reports per-top-level-module counts — the norm monitor's module
    split applied to sizes.
    """
    leaves_with_path = jax.tree_util.tree_leaves_with_path(params)
    total = sum(int(np.prod(leaf.shape)) for _, leaf in leaves_with_path)
    out: Dict[str, float] = {"model/params_total": total}
    if trainable_mask is not None:
        mask_leaves = jax.tree_util.tree_leaves(trainable_mask)
        trainable = sum(
            int(np.prod(leaf.shape))
            for (_, leaf), m in zip(leaves_with_path, mask_leaves)
            if m
        )
        out["model/params_trainable"] = trainable
        out["model/params_not_trainable"] = total - trainable
    else:
        out["model/params_trainable"] = total
        out["model/params_not_trainable"] = 0
    per_module: Dict[str, int] = {}
    for path, leaf in leaves_with_path:
        key = None
        for p in path:
            name = getattr(p, "key", None)
            if name is None:
                continue
            if name == "params" and key is None:
                continue
            key = str(name)
            break
        key = key or "root"
        per_module[key] = per_module.get(key, 0) + int(np.prod(leaf.shape))
    for k, v in sorted(per_module.items()):
        out[f"model/params/{k}"] = v
    return out
