"""Running training/eval metrics (reference training/src/metrics/).

The reference ships three torchmetrics classes wired into its Lightning
task via the metrics config group:

- ``Perplexity`` (metrics/perplexity.py): exp(average nll) accumulated
  in float64 — NOT average(exp(nll)); it takes the already-computed
  loss to avoid recomputation.
- ``AccuracyMine`` (metrics/accuracy.py): top-1 accuracy that argmaxes
  soft (Mixup) targets.
- ``NumTokens`` (metrics/num_tokens.py): a monotone token counter whose
  count survives ``reset()`` between epochs (the file comments on
  exactly this hack).

The JAX form keeps the same update/compute/reset protocol with
host-side float accumulators (the per-batch reductions run on device;
crossing to host once per step is the same cost as the reference's
torchmetrics sync). ``update`` signatures match the reference's
``(preds, target, loss=None)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["Perplexity", "Accuracy", "NumTokens", "token_accuracy"]

IGNORE_INDEX = -100


def _count_valid(target: jax.Array, ignore_index: int) -> jax.Array:
    return jnp.sum((target != ignore_index).astype(jnp.int32))


def token_accuracy(
    logits: jax.Array,
    target: jax.Array,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Top-1 token accuracy over non-ignored positions. Soft targets
    (a trailing class dim, e.g. from Mixup) are argmaxed first —
    reference metrics/accuracy.py AccuracyMine.update."""
    if target.ndim == logits.ndim:  # soft / one-hot targets
        target = jnp.argmax(target, axis=-1)
    pred = jnp.argmax(logits, axis=-1)
    valid = target != ignore_index
    hits = jnp.sum((pred == target) & valid)
    return hits / jnp.maximum(jnp.sum(valid), 1)


class Perplexity:
    """exp(sum(nll * count) / sum(count)), accumulated across updates.

    ``update(loss=..., num_tokens=...)`` takes the mean loss the step
    already computed (reference passes the loss in for the same
    reason); alternatively pass logits+target to compute nll here.
    """

    def __init__(self, ignore_index: int = IGNORE_INDEX):
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self.total_log_probs = 0.0
        self.count = 0

    def update(
        self,
        logits: Optional[jax.Array] = None,
        target: Optional[jax.Array] = None,
        loss: Optional[jax.Array] = None,
    ) -> None:
        if loss is None:
            if logits is None or target is None:
                raise ValueError("pass either loss= or (logits, target)")
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = jnp.where(target == self.ignore_index, 0, target)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            valid = (target != self.ignore_index).astype(jnp.float32)
            count = jnp.sum(valid)
            loss = jnp.sum(nll * valid) / jnp.maximum(count, 1.0)
        else:
            if target is not None:
                count = _count_valid(target, self.ignore_index)
            else:
                count = 1
        self.total_log_probs += float(loss) * int(count)
        self.count += int(count)

    def compute(self) -> float:
        import math

        if self.count == 0:
            return float("nan")
        return math.exp(self.total_log_probs / self.count)


class Accuracy:
    """Running top-1 accuracy (reference AccuracyMine semantics)."""

    def __init__(self, ignore_index: int = IGNORE_INDEX):
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self.hits = 0
        self.total = 0

    def update(self, logits: jax.Array, target: jax.Array) -> None:
        if target.ndim == logits.ndim:
            target = jnp.argmax(target, axis=-1)
        pred = jnp.argmax(logits, axis=-1)
        valid = target != self.ignore_index
        self.hits += int(jnp.sum((pred == target) & valid))
        self.total += int(jnp.sum(valid))

    def compute(self) -> float:
        return self.hits / self.total if self.total else float("nan")


class NumTokens:
    """Monotone token counter. ``reset()`` does NOT zero the count —
    the reference overrides reset() so the count persists across epochs
    (metrics/num_tokens.py); use ``hard_reset()`` to actually zero."""

    def __init__(self, ignore_index: int = IGNORE_INDEX):
        self.ignore_index = ignore_index
        self.count = 0

    def update(self, target: jax.Array) -> None:
        self.count += int(_count_valid(target, self.ignore_index))

    def compute(self) -> int:
        return self.count

    def reset(self) -> None:  # persists, by design
        pass

    def hard_reset(self) -> None:
        self.count = 0

    def state_dict(self) -> dict:
        return {"count": self.count}

    def load_state_dict(self, state: dict) -> None:
        self.count = int(state["count"])
