"""Denoising pipeline: flow-matching sampler with skip-state carry.

The reference's defining control flow is the user-side denoising loop
holding persistent LiteAttention instances and calling
``set_threshold(t_dependent_thr)`` between steps (reference
README.md:148-172, SURVEY.md section 3.3). Here that loop is a single
``lax.scan``: the per-layer skip-mask states are the scan carry
(SURVEY.md section 7 hard part 2 -- no host round trips), the
per-timestep thresholds are a scanned input, and each step consumes the
mask written by the previous step -- the temporal forward propagation of
skip decisions.

Wan2.x inference uses rectified-flow (velocity) prediction with a
classifier-free-guidance pair; cond and uncond passes keep **separate**
skip states (their attention patterns differ).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.models.wan import WanConfig, WanModel, init_skip_states


def linear_threshold_schedule(
    num_steps: int, start: float = -10.0, end: float = -2.0
) -> jax.Array:
    """Per-timestep skip thresholds, loosening over the trajectory.

    Early (high-noise) steps set the mask conservatively; later steps can
    skip more aggressively because attention patterns have stabilized --
    the calibration pattern of the reference's threshold sweep
    (README.md:93-98).
    """
    return jnp.linspace(start, end, num_steps)


def flow_timesteps(
    num_steps: int, shift: float = 5.0, t_max: float = 1000.0
) -> jax.Array:
    """Wan-style shifted rectified-flow timestep schedule (sigma in
    (0, 1], mapped to the model's [0, 1000] conditioning range)."""
    sigmas = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
    sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return sigmas * t_max


def denoise(
    model: WanModel,
    params,
    noise: jax.Array,
    text: jax.Array,
    null_text: Optional[jax.Array] = None,
    num_steps: int = 50,
    guidance_scale: float = 5.0,
    thresholds: Optional[jax.Array] = None,
    enable_skipping: bool = True,
    timestep_shift: float = 5.0,
    step_range: Optional[Tuple[int, int]] = None,
    initial_states: Optional[Dict[int, Any]] = None,
    initial_states_uncond: Optional[Dict[int, Any]] = None,
    image_ctx: Optional[jax.Array] = None,
    latent_cond: Optional[jax.Array] = None,
    vote_stride: int = 1,
    kv_compact: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Run the full denoising trajectory with LiteAttention state carry.

    Args:
      noise: [B, F, H, W, C] initial latent noise.
      text / null_text: conditioning (and optional CFG negative) encoder
        states [B, L, text_dim]; CFG is applied when ``null_text`` given.
      thresholds: per-step skip thresholds (default linear schedule).
      enable_skipping: False = dense baseline run (same code path with no
        skip state, for speed/quality A-B comparisons).
      vote_stride: emit skip votes (and evolve the masks) only every
        N-th denoising step; intermediate steps run the cheaper no-vote
        kernel on the frozen masks (round-3 amortization; stride 1 =
        the reference's every-step voting). The scan runs over
        stride-cycles, so num_steps % vote_stride trailing steps are
        unrolled as a partial cycle.

    Returns:
      (denoised latents, telemetry dict with per-step sparsity).
    """
    cfg: WanConfig = model.cfg
    b = noise.shape[0]
    grid = noise.shape[1:4]
    if thresholds is None:
        thresholds = linear_threshold_schedule(num_steps)
    ts = flow_timesteps(num_steps, shift=timestep_shift)
    sigmas = ts / 1000.0
    sigma_next = jnp.concatenate([sigmas[1:], jnp.zeros((1,))])

    use_cfg = null_text is not None

    if enable_skipping:
        states_c = initial_states or init_skip_states(cfg, b, grid)
        states_u = (
            (initial_states_uncond or init_skip_states(cfg, b, grid))
            if use_cfg
            else None
        )
    else:
        states_c = states_u = None

    if step_range is not None:
        lo, hi = step_range
        ts = ts[lo:hi]
        sigmas = sigmas[lo:hi]
        sigma_next = sigma_next[lo:hi]
        thresholds = thresholds[lo:hi]

    def sparsity_of(states):
        if states is None:
            return jnp.zeros(())
        per_layer = [
            1.0 - jnp.mean(s.do_mask.astype(jnp.float32))
            for s in states.values()
        ]
        return jnp.stack(per_layer).mean()

    cond_kwargs = dict(image_ctx=image_ctx, latent_cond=latent_cond)

    def step(carry, inp, emit_votes=True):
        x, st_c, st_u = carry
        t, sig, sig_nxt, thr = inp
        tt = jnp.full((b,), t, jnp.float32)
        v_c, st_c = model.apply(
            params, x, tt, text, st_c, thr, emit_votes=emit_votes,
            **cond_kwargs
        )
        if use_cfg:
            # CFG keeps the image conditioning in BOTH branches (the
            # negative branch drops only the text prompt).
            v_u, st_u = model.apply(
                params, x, tt, null_text, st_u, thr,
                emit_votes=emit_votes, **cond_kwargs
            )
            v = v_u + guidance_scale * (v_c - v_u)
        else:
            v = v_c
        # Rectified flow Euler step: x_{t-dt} = x + (sig_next - sig) * v.
        x = (
            x.astype(jnp.float32)
            + (sig_nxt - sig) * v.astype(jnp.float32)
        ).astype(x.dtype)
        return (x, st_c, st_u), sparsity_of(st_c)

    n = ts.shape[0]
    # Clamp the stride to the run length: a stride longer than the run
    # still means "vote once, up front" -- falling through to the plain
    # every-step-vote scan would be the OPPOSITE of what the caller
    # asked for (and measurably slower).
    stride = max(1, min(vote_stride, n)) if enable_skipping else 1
    if stride == 1:
        (x, st_c, st_u), sparsity_trace = jax.lax.scan(
            step,
            (noise, states_c, states_u),
            (ts, sigmas, sigma_next, thresholds),
        )
    else:
        # Stride cycles: one voting step then stride-1 no-vote steps
        # (static unroll inside the cycle body -- emit_votes selects
        # different compiled kernels, so it cannot be a scanned value).
        # The compacted gather SCHEDULES ride the carry: the masks only
        # change on vote steps, so compaction runs once per cycle
        # instead of every step. Round 4: the Pallas packer builds the
        # wire-format schedule in one kernel (the XLA argsort/gather
        # pipeline cost ~15 ms/layer-pass at 73k tokens) and the
        # (fidx, count, qbits) views the vote decode needs are
        # contiguous slices of it -- the whole vote cycle stays
        # on-device inside the scan.
        from liteattention_tpu.lite_attention import effective_blocks
        from liteattention_tpu.ops.kv_compact import kv_union_map
        from liteattention_tpu.ops.lite_flash_fwd import VOTE_TILE
        from liteattention_tpu.ops.schedule_pack import (
            pack_schedule,
            unpack_schedule,
        )

        pt, ph, pw = cfg.patch_size
        n_tok = (grid[0] // pt) * (grid[1] // ph) * (grid[2] // pw)
        bs = cfg.attn_block_sizes("lite")
        bq, bk = effective_blocks(bs, n_tok, n_tok)
        qsubs = bq // VOTE_TILE
        # Union-compact schedules (round 5): the whole cycle is traced
        # (no host readback for the union-density gate the wrapper
        # does), so compaction is gated statically. Default OFF:
        # measured on chip, self-attention video masks have union
        # density 1.0 (every fine k-tile is live for SOME q-tile --
        # /tmp/compact_probe round 5), making the relayout a pure
        # ~8 ms/call cost. Enable only for workloads with per-head
        # localized masks whose cross-q-tile union is sparse.
        use_kvc = kv_compact and n_tok % VOTE_TILE == 0

        def compact_one(st):
            kv_map = None
            if use_kvc:
                kv_map, inv, _ = kv_union_map(st.do_mask)
            packed = pack_schedule(
                st.do_mask, qsubs=qsubs, gsize=bk // VOTE_TILE,
                seqlen_k=n_tok, kv_map=kv_map,
            )
            fidx, count, qbits = unpack_schedule(
                packed, st.do_mask.shape[3], packed.shape[3] // 3
            )
            if use_kvc:
                return fidx, count, qbits, packed, kv_map, inv
            return fidx, count, qbits, packed

        def compact_states(states):
            if states is None:
                return None
            return {i: compact_one(st) for i, st in states.items()}

        def step_sched(carry, inp, emit_votes):
            x, st_c, st_u, sc_c, sc_u = carry
            t, sig, sig_nxt, thr = inp
            tt = jnp.full((b,), t, jnp.float32)
            v_c, st_c = model.apply(
                params, x, tt, text, st_c, thr, emit_votes=emit_votes,
                schedules=sc_c, **cond_kwargs
            )
            if use_cfg:
                v_u, st_u = model.apply(
                    params, x, tt, null_text, st_u, thr,
                    emit_votes=emit_votes, schedules=sc_u, **cond_kwargs
                )
                v = v_u + guidance_scale * (v_c - v_u)
            else:
                v = v_c
            x = (
                x.astype(jnp.float32)
                + (sig_nxt - sig) * v.astype(jnp.float32)
            ).astype(x.dtype)
            if emit_votes:
                # masks changed: recompact once for the rest of the cycle
                sc_c = compact_states(st_c)
                sc_u = compact_states(st_u) if use_cfg else None
            return (x, st_c, st_u, sc_c, sc_u), sparsity_of(st_c)

        ncyc = n // stride
        main = ncyc * stride

        def cycle(carry, inp):
            traces = []
            for j in range(stride):
                sub = tuple(a[j] for a in inp)
                carry, sp = step_sched(carry, sub, emit_votes=(j == 0))
                traces.append(sp)
            return carry, jnp.stack(traces)

        def split(a):
            return a[:main].reshape(ncyc, stride)

        carry0 = (
            noise, states_c, states_u,
            compact_states(states_c),
            compact_states(states_u) if use_cfg else None,
        )
        (x, st_c, st_u, sc_c, sc_u), tr = jax.lax.scan(
            cycle,
            carry0,
            tuple(split(a) for a in (ts, sigmas, sigma_next, thresholds)),
        )
        sparsity_trace = tr.reshape(main)
        # Trailing partial cycle (unrolled; first tail step votes).
        carry = (x, st_c, st_u, sc_c, sc_u)
        tails = []
        for j in range(main, n):
            carry, sp = step_sched(
                carry,
                (ts[j], sigmas[j], sigma_next[j], thresholds[j]),
                emit_votes=(j == main),
            )
            tails.append(sp)
        x, st_c, st_u = carry[:3]
        if tails:
            sparsity_trace = jnp.concatenate(
                [sparsity_trace, jnp.stack(tails)]
            )
    telemetry = {
        "sparsity_per_step": sparsity_trace,
        "final_sparsity": sparsity_trace[-1],
        "final_states": st_c,
        "final_states_uncond": st_u,
    }
    return x, telemetry


def denoise_two_expert(
    model: WanModel,
    params_high,
    params_low,
    noise: jax.Array,
    text: jax.Array,
    null_text: Optional[jax.Array] = None,
    num_steps: int = 50,
    boundary: float = 0.875,
    guidance_scale: float = 5.0,
    guidance_scale_low: Optional[float] = None,
    thresholds: Optional[jax.Array] = None,
    enable_skipping: bool = True,
    timestep_shift: float = 5.0,
    image_ctx: Optional[jax.Array] = None,
    latent_cond: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Wan2.2-A14B-style two-expert denoising.

    Wan2.2 swaps between a high-noise and a low-noise expert of the SAME
    architecture at a sigma boundary (t >= boundary * 1000 -> high-noise
    expert). Skip-mask states persist ACROSS the expert switch -- the
    attention maps stay temporally coherent even when weights change,
    which is exactly what the reference exploits to hit 32% sparsity on
    Wan2.2 (reference README.md:37,64-69).

    Implemented as two chained :func:`denoise` segments over a split
    timestep schedule, threading the final skip states of the high-noise
    segment into the low-noise one.
    """
    # The expert-switch step index is schedule math, not data: compute it
    # in numpy so the whole two-segment pipeline stays jittable.
    sig = np.linspace(1.0, 1.0 / num_steps, num_steps)
    sig = timestep_shift * sig / (1.0 + (timestep_shift - 1.0) * sig)
    n_high = int(np.sum(sig >= boundary))
    if thresholds is None:
        thresholds = linear_threshold_schedule(num_steps)
    if guidance_scale_low is None:
        guidance_scale_low = guidance_scale

    # Segment 1: high-noise expert.
    x, tel_hi = denoise(
        model,
        params_high,
        noise,
        text,
        null_text,
        num_steps=num_steps,
        guidance_scale=guidance_scale,
        thresholds=thresholds,
        enable_skipping=enable_skipping,
        timestep_shift=timestep_shift,
        step_range=(0, n_high),
        image_ctx=image_ctx,
        latent_cond=latent_cond,
    )
    # Segment 2: low-noise expert, resuming the skip states.
    x, tel_lo = denoise(
        model,
        params_low,
        x,
        text,
        null_text,
        num_steps=num_steps,
        guidance_scale=guidance_scale_low,
        thresholds=thresholds,
        enable_skipping=enable_skipping,
        timestep_shift=timestep_shift,
        step_range=(n_high, num_steps),
        initial_states=tel_hi["final_states"],
        initial_states_uncond=tel_hi.get("final_states_uncond"),
        image_ctx=image_ctx,
        latent_cond=latent_cond,
    )
    telemetry = {
        "sparsity_per_step": jnp.concatenate(
            [tel_hi["sparsity_per_step"], tel_lo["sparsity_per_step"]]
        ),
        "final_sparsity": tel_lo["final_sparsity"],
        "final_states": tel_lo["final_states"],
        "num_high_noise_steps": n_high,
    }
    return x, telemetry


__all__ = [
    "denoise",
    "denoise_two_expert",
    "linear_threshold_schedule",
    "flow_timesteps",
]
