"""Sparsity/quality calibration on STRUCTURED (trained) attention.

VERDICT round-1 item 2: every round-1 quality number was computed on
random-init weights, where attention is near-uniform -- the easiest case
for the skip criterion. Real Wan weights are unreachable here (zero
egress; `utils/pretrained.remap_state_dict_wan` is ready for when they
are), so this script follows the prescribed fallback: **train a small
Wan-architecture DiT on synthetic video until its attention develops
temporal structure, then calibrate thresholds on that**.

Pipeline:
  1. Synthetic latent videos: bouncing anisotropic Gaussian blobs with
     per-sample velocities -- strong spatial locality + temporal
     coherence, the structure the skip criterion exploits in real video
     models (reference README.md:12-27).
  2. Rectified-flow training of a tiny WanModel (same architecture as
     the flagship; `models/wan.py`) until loss plateaus.
  3. `models/eval.threshold_sweep` on the trained weights: constant
     thresholds -> (sparsity, rel-L2, PSNR) curve, the reference's
     threshold table (README.md:93-98).
  4. `models/calibrate.calibrate_schedule`: loosest schedule under the
     error budget; report achieved sparsity.

Emits CALIBRATION.json with the full curve + the calibrated schedule.

Usage: python examples/structured_calibration.py
         [--train-steps 1200] [--frames 12] [--size 32] [--out PATH]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from liteattention_tpu.models.calibrate import calibrate_schedule
from liteattention_tpu.models.eval import threshold_sweep
from liteattention_tpu.models.wan import WanConfig, WanModel
from liteattention_tpu.ops.tile_sizes import BlockSizes


def make_videos(rng: np.random.RandomState, batch, frames, size, channels):
    """Bouncing-blob synthetic latent videos [B, F, S, S, C]."""
    b = batch
    vids = np.zeros((b, frames, size, size, channels), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for i in range(b):
        n_blobs = rng.randint(2, 5)
        for _ in range(n_blobs):
            pos = rng.rand(2) * size
            vel = (rng.rand(2) - 0.5) * size / frames * 2.0
            sig = 1.5 + 3.0 * rng.rand(2)
            amp = rng.randn(channels) * 1.5
            for f in range(frames):
                p = pos + vel * f
                # reflect off walls
                p = np.abs(np.mod(p, 2 * size) - size)
                g = np.exp(
                    -(((yy - p[0]) / sig[0]) ** 2)
                    - (((xx - p[1]) / sig[1]) ** 2)
                )
                vids[i, f] += g[:, :, None] * amp[None, None]
    vids += 0.05 * rng.randn(*vids.shape)
    return vids


def small_config(size: int) -> WanConfig:
    return WanConfig(
        dim=256,
        ffn_dim=768,
        num_heads=4,
        head_dim=64,
        num_layers=4,
        in_channels=8,
        out_channels=8,
        text_dim=64,
        text_len=16,
        freq_dim=64,
        patch_size=(1, 2, 2),
        block_sizes=BlockSizes(512, 512),
        dtype=jnp.bfloat16,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--eval-steps", type=int, default=24)
    ap.add_argument("--rel-l2-budget", type=float, default=0.05)
    ap.add_argument("--out", default="CALIBRATION.json")
    ap.add_argument("--seed", type=int, default=0)
    # Attention-structure regularization (VERDICT r2 item 3 sanctions
    # "attention-entropy regularization if needed"): the tiny proxy's
    # attention stays near-uniform under the task loss alone, which is
    # the WORST case for the skip criterion; converged video models are
    # strongly localized (reference README.md:12-27). The entropy term
    # penalizes per-row attention entropy above a target support size;
    # the tile term penalizes 128-key-tile maxes above the skip
    # threshold in the kernel's log2 domain. Both act only on the
    # training objective -- every quality number is still sparse-vs-
    # dense of the SAME final weights.
    ap.add_argument("--entropy-reg", type=float, default=0.0)
    ap.add_argument("--entropy-target", type=float, default=5.55,
                    help="target row entropy in nats (~ln(support))")
    ap.add_argument("--tile-reg", type=float, default=0.0)
    ap.add_argument("--probe-rows", type=int, default=64)
    # Round 5 (VERDICT items 3+6): schedule-transfer check across
    # workload scales, and an organic E2E speed row on the calibrated
    # trained proxy (at 16k tokens the proxy is ~93% attention FLOPs,
    # so its lite-vs-dense wall clock is a legitimate organic E2E
    # measurement, unlike random-init weights whose masks are
    # degenerate).
    ap.add_argument("--eval-schedule", default=None,
                    help="CALIBRATION.json whose calibrated schedule "
                    "is re-evaluated on THIS workload (transfer check)")
    ap.add_argument("--e2e", action="store_true",
                    help="time dense vs calibrated-lite denoising")
    ap.add_argument("--e2e-vote-stride", type=int, default=8)
    args = ap.parse_args()

    cfg = small_config(args.size)
    tokens = args.frames * (args.size // 2) ** 2
    print(
        f"backend={jax.default_backend()} tokens={tokens} "
        f"dim={cfg.dim} layers={cfg.num_layers}"
    )
    model = WanModel(cfg)
    rng = np.random.RandomState(args.seed)
    text = jnp.zeros((args.batch, cfg.text_len, cfg.text_dim), jnp.bfloat16)

    lat0 = jnp.asarray(
        make_videos(rng, args.batch, args.frames, args.size,
                    cfg.in_channels)
    ).astype(jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), lat0, jnp.ones((args.batch,)), text
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
    )
    print(f"params: {n_params/1e6:.2f}M")

    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, 3e-4, 100, max(101, args.train_steps)
        ),
        weight_decay=0.01,
    )
    opt_state = opt.init(params)

    use_probe = args.entropy_reg > 0 or args.tile_reg > 0
    train_model = (
        WanModel(
            dataclasses.replace(cfg, attn_probe_rows=args.probe_rows)
        )
        if use_probe
        else model
    )

    def _collect(tree, name):
        """Flatten every sowed leaf named ``name`` out of a nested
        intermediates dict (one entry per self-attention layer)."""
        out = []
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == name:
                    out.extend(jax.tree_util.tree_leaves(v))
                else:
                    out.extend(_collect(v, name))
        return out

    @jax.jit
    def train_step(params, opt_state, x0, key):
        kn, kt = jax.random.split(key)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        sig = jax.random.uniform(kt, (x0.shape[0], 1, 1, 1, 1))
        xt = ((1.0 - sig) * x0.astype(jnp.float32) + sig * noise).astype(
            jnp.bfloat16
        )
        v_target = noise - x0.astype(jnp.float32)
        tt = sig[:, 0, 0, 0, 0] * 1000.0

        def loss_fn(p):
            if use_probe:
                (v, _), inter = train_model.apply(
                    p, xt, tt, text[: x0.shape[0]],
                    mutable=["intermediates"],
                )
            else:
                v, _ = model.apply(p, xt, tt, text[: x0.shape[0]])
                inter = {}
            main = jnp.mean((v.astype(jnp.float32) - v_target) ** 2)
            ent = jnp.float32(0.0)
            reg = jnp.float32(0.0)
            ents = _collect(inter, "attn_entropy")
            if ents:
                ent = jnp.mean(jnp.stack(ents))
                if args.entropy_reg > 0:
                    reg += args.entropy_reg * jnp.mean(
                        jnp.stack(
                            [
                                jnp.maximum(e - args.entropy_target, 0.0)
                                for e in ents
                            ]
                        )
                    )
            tiles = _collect(inter, "attn_tile_excess")
            if tiles and args.tile_reg > 0:
                reg += args.tile_reg * jnp.mean(jnp.stack(tiles))
            return main + reg, (main, ent)

        (loss, (main, ent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, main, ent

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    loss0 = None
    for step in range(args.train_steps):
        if step % 50 == 0:
            x0 = jnp.asarray(
                make_videos(rng, args.batch, args.frames, args.size,
                            cfg.in_channels)
            ).astype(jnp.bfloat16)
        key, sub = jax.random.split(key)
        params, opt_state, loss, ent = train_step(
            params, opt_state, x0, sub
        )
        if step % 100 == 0 or step == args.train_steps - 1:
            lv = float(loss)
            loss0 = loss0 or lv
            print(
                f"step {step} loss {lv:.4f} entropy {float(ent):.3f} "
                f"({time.time()-t0:.0f}s)"
            )
    print(f"train done: loss {loss0:.3f} -> {float(loss):.3f}")

    # --- calibration on the TRAINED (structured) attention ---
    eval_noise = jax.random.normal(
        jax.random.PRNGKey(7),
        (1, args.frames, args.size, args.size, cfg.in_channels),
    ).astype(jnp.bfloat16)
    eval_text = text[:1]
    sweep_thrs = [-10.0, -6.0, -4.0, -3.0, -2.0, -1.0, -0.5]
    curve = threshold_sweep(
        model, params, eval_noise, eval_text,
        thresholds_list=sweep_thrs, num_steps=args.eval_steps,
    )
    for r in curve:
        print(
            f"thr {r['threshold']:6.1f}: sparsity "
            f"{float(r['mean_sparsity']):.3f} "
            f"rel_l2 {float(r['relative_l2']):.4f} "
            f"flicker {float(r['temporal_flicker']):.4f} "
            f"psnr {float(r['psnr_db']):.1f}"
        )

    schedule, sched = calibrate_schedule(
        model, params, eval_noise, eval_text,
        num_steps=args.eval_steps, target_rel_l2=args.rel_l2_budget,
    )
    print(
        f"calibrated schedule (budget rel_l2<={args.rel_l2_budget}): "
        f"thr*={sched['threshold']:.2f} "
        f"+delta={sched.get('loosen_delta', 0.0):.2f} "
        f"sparsity={sched['mean_sparsity']:.3f} "
        f"final_sparsity={sched.get('final_sparsity', 0.0):.3f} "
        f"rel_l2={sched['relative_l2']:.4f}"
    )

    transfer = None
    if args.eval_schedule:
        # Scale-transfer check: does the OTHER workload's calibrated
        # schedule keep sparsity and quality in band here? Schedules
        # are per-step threshold curves; resample by step fraction if
        # the step counts differ.
        from liteattention_tpu.models.eval import (
            evaluate_sparsity_quality,
        )

        with open(args.eval_schedule) as f:
            src_art = json.load(f)
        src_sched = np.asarray(
            src_art["calibrated"]["schedule"], np.float32
        )
        if src_sched.shape[0] != args.eval_steps:
            xi = np.linspace(0.0, 1.0, args.eval_steps)
            xs = np.linspace(0.0, 1.0, src_sched.shape[0])
            src_sched = np.interp(xi, xs, src_sched).astype(np.float32)
        tr = evaluate_sparsity_quality(
            model, params, eval_noise, eval_text,
            num_steps=args.eval_steps,
            thresholds=jnp.asarray(src_sched),
        )
        transfer = {
            "source": args.eval_schedule,
            "source_tokens": src_art["workload"]["tokens"],
            "mean_sparsity": float(tr["mean_sparsity"]),
            "final_sparsity": float(tr["final_sparsity"]),
            "relative_l2": float(tr["relative_l2"]),
            "psnr_db": float(tr["psnr_db"]),
        }
        print(
            f"transfer({src_art['workload']['tokens']} tok -> {tokens}"
            f" tok): sparsity={transfer['mean_sparsity']:.3f} "
            f"rel_l2={transfer['relative_l2']:.4f}"
        )

    e2e = None
    if args.e2e:
        from liteattention_tpu.models.pipeline import denoise

        def _sync(x):
            np.asarray(
                jnp.sum(
                    jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)
                )
            )

        attn_core = 4.0 * cfg.dim * tokens * tokens
        linear = (
            6.0 * tokens * cfg.dim * cfg.dim
            + 4.0 * tokens * cfg.dim * cfg.ffn_dim
        )
        frac = attn_core / (attn_core + linear)
        sched_arr = jnp.asarray(np.asarray(schedule, np.float32))
        dense_fn = jax.jit(
            lambda p, n, t: denoise(
                model, p, n, t, num_steps=args.eval_steps,
                enable_skipping=False,
            )
        )
        lite_fn = jax.jit(
            lambda p, n, t, thr: denoise(
                model, p, n, t, num_steps=args.eval_steps,
                thresholds=thr, enable_skipping=True,
                vote_stride=args.e2e_vote_stride,
            )
        )

        def _time(fn, *a):
            _sync(fn(*a))  # compile + mask warmup
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = fn(*a)
                _sync(out)
                best = min(best, (time.time() - t0) / args.eval_steps)
            return best

        dense_s = _time(dense_fn, params, eval_noise, eval_text)
        lite_s = _time(lite_fn, params, eval_noise, eval_text, sched_arr)
        _, tel = lite_fn(params, eval_noise, eval_text, sched_arr)
        e2e = {
            "tokens": tokens,
            "attention_flop_fraction": round(frac, 4),
            "dense_ms_per_step": round(dense_s * 1e3, 2),
            "lite_ms_per_step": round(lite_s * 1e3, 2),
            "e2e_speedup": round(dense_s / lite_s, 3),
            "vote_stride": args.e2e_vote_stride,
            "final_sparsity": float(tel["final_sparsity"]),
        }
        print(
            f"organic E2E at {tokens} tok (attn {frac:.0%}): dense "
            f"{dense_s*1e3:.1f} -> lite {lite_s*1e3:.1f} ms/step = "
            f"{dense_s/lite_s:.2f}x at "
            f"{e2e['final_sparsity']:.1%} final sparsity"
        )

    artifact = {
        "workload": {
            "tokens": tokens,
            "frames": args.frames,
            "train_steps": args.train_steps,
            "final_train_loss": float(loss),
            "entropy_reg": args.entropy_reg,
            "entropy_target": args.entropy_target,
            "tile_reg": args.tile_reg,
            "final_attn_entropy": float(ent),
            "model": dataclasses.asdict(
                dataclasses.replace(cfg, dtype=None, block_sizes=None)
            ),
        },
        "curve": [
            {
                "threshold": float(r["threshold"]),
                "mean_sparsity": float(r["mean_sparsity"]),
                "final_sparsity": float(r["final_sparsity"]),
                "relative_l2": float(r["relative_l2"]),
                "temporal_flicker": float(r["temporal_flicker"]),
                "subject_consistency_delta": float(
                    r["subject_consistency_delta"]
                ),
                "psnr_db": float(r["psnr_db"]),
            }
            for r in curve
        ],
        "calibrated": {
            "threshold": float(sched["threshold"]),
            "loosen_delta": float(sched.get("loosen_delta", 0.0)),
            "final_sparsity": float(sched.get("final_sparsity", 0.0)),
            "mean_sparsity": float(sched["mean_sparsity"]),
            "relative_l2": float(sched["relative_l2"]),
            "temporal_flicker": float(sched["temporal_flicker"]),
            "subject_consistency_delta": float(
                sched.get("subject_consistency_delta", 0.0)
            ),
            "schedule": [float(x) for x in np.asarray(schedule)],
        },
        "budget_rel_l2": args.rel_l2_budget,
    }
    if transfer is not None:
        artifact["transfer"] = transfer
    if e2e is not None:
        artifact["e2e"] = e2e
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
