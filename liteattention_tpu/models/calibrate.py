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
    loosen_frac: float = 0.5,
    loosen_hi: float = 6.0,
    loosen_iters: int = 4,
    probe_steps: Optional[int] = None,
    **kwargs,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Per-step schedule: constant calibration + late-step loosening.

    Three phases, matching the shape of the reference's published
    per-timestep threshold tables (reference README.md:93-98,148-153 —
    later denoising steps tolerate far looser thresholds because the
    signal has converged and attention structure is stable):

    1. the first ``tighten_frac`` of steps ramp from (threshold − 4) up
       to the calibrated constant value (masks form conservatively while
       the signal is pure noise);
    2. a hold at the calibrated constant;
    3. the last ``loosen_frac`` of steps ramp up by an extra ``delta``,
       where ``delta`` ∈ [0, loosen_hi] is bisected to the largest value
       keeping the FULL-schedule trajectory deviation under budget.
       Looser thresholds only remove more tiles (mask update is a
       monotone AND), so deviation is monotone in ``delta`` and
       bisection is sound.
    """
    # Bisect the constant threshold at the FULL step count (not a short
    # probe): trajectory deviation accumulates with steps, so a
    # short-probe solution can land over budget when the shipped
    # schedule runs longer. The shipped ramp starts tighter than the
    # constant, so an in-budget constant implies an in-budget schedule.
    result = calibrate_constant_threshold(
        model, params, noise, text, target_rel_l2=target_rel_l2,
        num_steps=probe_steps or num_steps, **kwargs,
    )
    thr = result["threshold"]
    # (lo/hi/iters are bisection controls consumed above, not denoise
    # kwargs.)
    denoise_kwargs = {
        k: v for k, v in kwargs.items() if k not in ("lo", "hi", "iters")
    }

    n_ramp = max(int(num_steps * tighten_frac), 1)
    n_loose = min(max(int(num_steps * loosen_frac), 1),
                  num_steps - n_ramp)

    def build(delta: float) -> jax.Array:
        n_hold = num_steps - n_ramp - n_loose
        ramp = jnp.linspace(thr - 4.0, thr, n_ramp)
        hold = jnp.full((n_hold,), thr)
        loose = jnp.linspace(thr, thr + delta, n_loose + 1)[1:]
        return jnp.concatenate([ramp, hold, loose])

    def evaluate(delta: float) -> Dict[str, Any]:
        # The reported sparsity/quality belong to the schedule that
        # ships, not to the constant-threshold probe.
        return evaluate_sparsity_quality(
            model, params, noise, text, num_steps=num_steps,
            thresholds=build(delta), **denoise_kwargs,
        )

    final0 = evaluate(0.0)
    best = (0.0, final0)
    if float(final0["relative_l2"]) <= target_rel_l2 and n_loose > 0:
        e_hi = evaluate(loosen_hi)
        if float(e_hi["relative_l2"]) <= target_rel_l2:
            best = (loosen_hi, e_hi)
        else:
            lo_d, hi_d = 0.0, loosen_hi
            for _ in range(loosen_iters):
                mid = 0.5 * (lo_d + hi_d)
                e = evaluate(mid)
                if float(e["relative_l2"]) <= target_rel_l2:
                    best = (mid, e)
                    lo_d = mid
                else:
                    hi_d = mid
    delta, final = best
    schedule = build(delta)
    sched_result = {
        "threshold": thr,
        "loosen_delta": float(delta),
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
