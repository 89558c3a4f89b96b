"""Error-calibrated threshold selection.

The reference's thresholds are "error-calibrated" per timestep: the user
sweeps thresholds offline and picks the per-step values that keep output
quality at parity (reference README.md:93-98,148-153 — calibration is
user-side; the repo ships only `set_threshold`). This module makes the
calibration loop itself part of the framework:

* :func:`calibrate_constant_threshold` — largest constant threshold whose
  full-trajectory deviation from the dense run stays under a budget
  (bisection over the threshold axis using the quality harness).
* :func:`calibrate_schedule` — per-step schedule built from the constant
  solution: tight early (high noise, masks still forming), loosening to
  the calibrated value — the shape of the reference's published
  schedules.

Calibration runs on a prototype prompt/noise sample; the resulting
schedule is then reused for the workload (the same amortization the
reference's users perform).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from liteattention_tpu.models.eval import evaluate_sparsity_quality
from liteattention_tpu.models.wan import WanModel


def calibrate_constant_threshold(
    model: WanModel,
    params,
    noise: jax.Array,
    text: jax.Array,
    target_rel_l2: float = 0.05,
    lo: float = -12.0,
    hi: float = 2.0,
    iters: int = 5,
    num_steps: int = 10,
    **denoise_kwargs,
) -> Dict[str, Any]:
    """Bisection for the loosest constant threshold under the error budget.

    Deviation is monotone (non-decreasing) in the threshold: looser
    thresholds can only remove more tiles, and removal is monotone under
    the mask update, so bisection is sound.
    """
    def deviation(thr: float) -> Tuple[float, float]:
        r = evaluate_sparsity_quality(
            model, params, noise, text, num_steps=num_steps,
            thresholds=jnp.full((num_steps,), thr), **denoise_kwargs,
        )
        return float(r["relative_l2"]), float(r["mean_sparsity"])

    err_hi, sp_hi = deviation(hi)
    if err_hi <= target_rel_l2:
        return {
            "threshold": hi, "relative_l2": err_hi, "mean_sparsity": sp_hi
        }
    err_lo, sp_lo = deviation(lo)
    if err_lo > target_rel_l2:
        return {
            "threshold": lo, "relative_l2": err_lo, "mean_sparsity": sp_lo,
            "warning": "budget unattainable even at the tightest threshold",
        }
    best = (lo, err_lo, sp_lo)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        err, sp = deviation(mid)
        if err <= target_rel_l2:
            best = (mid, err, sp)
            lo = mid
        else:
            hi = mid
    return {
        "threshold": best[0],
        "relative_l2": best[1],
        "mean_sparsity": best[2],
    }


def calibrate_schedule(
    model: WanModel,
    params,
    noise: jax.Array,
    text: jax.Array,
    num_steps: int,
    target_rel_l2: float = 0.05,
    tighten_frac: float = 0.3,
    **kwargs,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Per-step schedule from the calibrated constant threshold.

    The first ``tighten_frac`` of steps ramp from (threshold − 4) up to
    the calibrated value (masks form conservatively while the signal is
    pure noise); the remainder hold it.
    """
    result = calibrate_constant_threshold(
        model, params, noise, text, target_rel_l2=target_rel_l2,
        num_steps=min(num_steps, 10), **kwargs,
    )
    thr = result["threshold"]
    n_ramp = max(int(num_steps * tighten_frac), 1)
    ramp = jnp.linspace(thr - 4.0, thr, n_ramp)
    hold = jnp.full((num_steps - n_ramp,), thr)
    schedule = jnp.concatenate([ramp, hold])
    # Re-evaluate the actual per-step schedule at the full step count:
    # the reported sparsity/quality belong to the schedule that ships,
    # not to the constant-threshold probe. (lo/hi/iters are bisection
    # controls consumed above, not denoise kwargs.)
    denoise_kwargs = {
        k: v for k, v in kwargs.items() if k not in ("lo", "hi", "iters")
    }
    final = evaluate_sparsity_quality(
        model, params, noise, text, num_steps=num_steps,
        thresholds=schedule, **denoise_kwargs,
    )
    sched_result = {
        "threshold": thr,
        "relative_l2": float(final["relative_l2"]),
        "mean_sparsity": float(final["mean_sparsity"]),
        "final_sparsity": float(final["final_sparsity"]),
        "temporal_flicker": float(final["temporal_flicker"]),
        "psnr_db": float(final["psnr_db"]),
    }
    if "warning" in result:
        sched_result["warning"] = result["warning"]
    return schedule, sched_result


__all__ = ["calibrate_constant_threshold", "calibrate_schedule"]
