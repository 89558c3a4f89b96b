"""Denoising pipeline: scan-carried skip states, CFG, schedules (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.models.pipeline import (
    denoise,
    flow_timesteps,
    linear_threshold_schedule,
)
from liteattention_tpu.models.wan import WanConfig, WanModel


def test_schedules():
    thr = linear_threshold_schedule(5, -10.0, -2.0)
    assert thr.shape == (5,)
    assert float(thr[0]) == -10.0 and float(thr[-1]) == -2.0
    ts = flow_timesteps(10)
    assert ts.shape == (10,)
    assert float(ts[0]) > float(ts[-1]) > 0.0


def test_denoise_with_cfg_and_skipping():
    cfg = WanConfig.tiny()
    model = WanModel(cfg)
    # 8 x 4 x 8 = 256 tokens -> 2 k-tiles at block 128, so thr=+inf can
    # actually skip something.
    b, f, h, w = 1, 8, 8, 16
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    null = jnp.zeros_like(text)
    t0 = jnp.full((b,), 999.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), noise, t0, text)

    out, tel = jax.jit(
        lambda p, n, t, u: denoise(
            model, p, n, t, u, num_steps=3, thresholds=jnp.array(
                [float("inf")] * 3
            )
        )
    )(params, noise, text, null)
    assert out.shape == noise.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()
    sp = np.asarray(tel["sparsity_per_step"])
    assert sp.shape == (3,)
    # thr=+inf with 2 k-tiles/row: everything but the anchor tile is
    # skipped from the first step on, and stays monotone.
    assert sp[0] == 0.5
    assert sp[2] >= sp[1] >= sp[0] - 1e-6


def test_denoise_dense_baseline():
    cfg = WanConfig.tiny()
    model = WanModel(cfg)
    b, f, h, w = 1, 2, 4, 4
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    t0 = jnp.full((b,), 999.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), noise, t0, text)
    out, tel = jax.jit(
        lambda p, n, t: denoise(
            model, p, n, t, num_steps=2, enable_skipping=False
        )
    )(params, noise, text)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert float(tel["final_sparsity"]) == 0.0


def test_denoise_two_expert_threads_states():
    from liteattention_tpu.models.pipeline import denoise_two_expert

    cfg = WanConfig.tiny()
    model = WanModel(cfg)
    b, f, h, w = 1, 8, 8, 16
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    t0 = jnp.full((b,), 999.0, jnp.float32)
    p_hi = jax.jit(model.init)(jax.random.PRNGKey(2), noise, t0, text)
    p_lo = jax.jit(model.init)(jax.random.PRNGKey(3), noise, t0, text)
    out, tel = jax.jit(
        lambda a, b_, n, t: denoise_two_expert(
            model, a, b_, n, t, num_steps=4, boundary=0.7,
            thresholds=jnp.array([float("inf")] * 4),
        )
    )(p_hi, p_lo, noise, text)
    assert out.shape == noise.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()
    sp = np.asarray(tel["sparsity_per_step"])
    assert sp.shape == (4,)
    # Skip state persists across the expert switch: sparsity stays at the
    # anchor level for the whole trajectory.
    assert (sp == 0.5).all()
    assert 0 < int(tel["num_high_noise_steps"]) < 4


def test_eval_harness_threshold_sweep():
    from liteattention_tpu.models.eval import (
        evaluate_sparsity_quality,
        threshold_sweep,
    )

    cfg = WanConfig.tiny()
    model = WanModel(cfg)
    b, f, h, w = 1, 8, 8, 16
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    t0 = jnp.full((b,), 999.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), noise, t0, text)

    # thr=-inf: sparse == dense exactly (no skipping happens).
    r = evaluate_sparsity_quality(
        model, params, noise, text, num_steps=2,
        thresholds=jnp.array([float("-inf")] * 2),
    )
    assert float(r["relative_l2"]) < 1e-5
    assert float(r["final_sparsity"]) == 0.0
    # All three VBench-analog axes report ~zero deviation at -inf.
    assert float(r["temporal_flicker"]) < 1e-4
    assert float(r["subject_consistency_delta"]) < 1e-5

    # Sweep: looser thresholds monotonically increase sparsity and
    # cannot decrease deviation below the tighter setting's.
    res = threshold_sweep(
        model, params, noise, text,
        thresholds_list=[float("-inf"), float("inf")], num_steps=2,
    )
    assert res[0]["mean_sparsity"] <= res[1]["mean_sparsity"]
    assert res[1]["final_sparsity"] == 0.5  # anchor-only at thr=+inf


def test_threshold_calibration():
    from liteattention_tpu.models.calibrate import (
        calibrate_constant_threshold,
        calibrate_schedule,
    )

    cfg = WanConfig.tiny()
    model = WanModel(cfg)
    b, f, h, w = 1, 8, 8, 16
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    t0 = jnp.full((b,), 999.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), noise, t0, text)

    # Huge budget: bisection should land at the loose end (hi).
    r = calibrate_constant_threshold(
        model, params, noise, text, target_rel_l2=1e9,
        lo=-8.0, hi=0.5, iters=2, num_steps=2,
    )
    assert r["threshold"] == 0.5
    # Tiny budget: tightest end, with a warning if unattainable or a
    # threshold <= lo midpoint otherwise.
    r2 = calibrate_constant_threshold(
        model, params, noise, text, target_rel_l2=0.0,
        lo=-8.0, hi=0.5, iters=2, num_steps=2,
    )
    assert r2["threshold"] <= 0.5

    sched, info = calibrate_schedule(
        model, params, noise, text, num_steps=6, target_rel_l2=1e9,
        lo=-8.0, hi=0.5, iters=1, loosen_iters=1,
    )
    assert sched.shape == (6,)
    # Unlimited budget: the late-step loosening phase takes the whole
    # extra range, so the schedule ends at threshold + loosen_delta.
    assert info["loosen_delta"] == 6.0
    assert float(sched[-1]) == pytest.approx(
        info["threshold"] + info["loosen_delta"]
    )
    assert float(sched[0]) < float(sched[-1])

    # Zero budget: loosening must not engage (delta stays 0) and the
    # schedule tops out at the constant-calibrated threshold.
    sched0, info0 = calibrate_schedule(
        model, params, noise, text, num_steps=6, target_rel_l2=0.0,
        lo=-8.0, hi=0.5, iters=1, loosen_iters=1,
    )
    assert info0["loosen_delta"] == 0.0
    assert float(sched0[-1]) == pytest.approx(info0["threshold"])


def test_denoise_kv_compact_scan_matches_plain():
    """The fully-traced compact-schedule path (denoise(kv_compact=True,
    vote_stride>1): 6-tuple schedules through the scan carry +
    compact_kv in lite_attention_step) must reproduce the plain path's
    outputs and sparsity trace exactly."""
    cfg = WanConfig.tiny()
    model = WanModel(cfg)
    b, f, h, w = 1, 8, 8, 16
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(4), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    t0 = jnp.full((b,), 999.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(5), noise, t0, text)
    thrs = jnp.array([float("inf")] * 4)

    outs = {}
    for flag in (False, True):
        out, tel = jax.jit(
            lambda p, n, t, kvc=flag: denoise(
                model, p, n, t, num_steps=4, thresholds=thrs,
                vote_stride=2, kv_compact=kvc,
            )
        )(params, noise, text)
        outs[flag] = (np.asarray(out, np.float32),
                      np.asarray(tel["sparsity_per_step"]))
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
