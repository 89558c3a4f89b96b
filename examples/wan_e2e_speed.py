"""End-to-end Wan-geometry denoising: lite vs dense wall clock.

The north-star measurement shape (BASELINE.json config 4): Wan2.1-14B
block geometry (dim 5120, 40 heads x 128, ffn 13824, umT5 text) at
720p-scale token count (73 728 = 18 frames x 64 x 64 latents), trimmed
to a few blocks/steps so one chip finishes in minutes.

Attention-FLOP fraction at this geometry (per block, N tokens):
self-attention core 4*5120*N^2 vs linear terms ~4.4e8*N (QKV/O + FFN)
-> 77% of FLOPs at N=73 728, 63% at N=36 864. (The round-1 docs said
"~85%" here and "~40%" in the README -- both wrong; this script now
prints the computed fraction for its geometry.)

Random weights give near-uniform attention, so the sweep drives the
mask with explicit thresholds (including debug thresholds > 0 for the
skip-heavy end) rather than relying on learned structure; with real
Wan weights (utils/pretrained.remap_state_dict_wan) the same script
measures true calibrated sparsity. Emits E2E_ABLATION.json: the
sparsity -> step-time curve (>= 5 points, the reference's ablation
shape, README.md:79-87).

Usage: python examples/wan_e2e_speed.py [--layers 2] [--steps 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.models.pipeline import denoise
from liteattention_tpu.models.wan import WanConfig, WanModel


def sync(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=18)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--vote-stride", type=int, default=4)
    ap.add_argument(
        "--modes", default="thr,band",
        help="comma list: thr (organic threshold sweep), band "
        "(forced banded-mask ablation)",
    )
    args = ap.parse_args()
    modes = set(args.modes.split(","))

    cfg = WanConfig(num_layers=args.layers)
    model = WanModel(cfg)
    b = 1
    f, hh, ww = args.frames, args.height, args.width
    tokens = f * (hh // 2) * (ww // 2)
    print(f"wan geometry: {args.layers} blocks, {tokens} tokens")

    noise = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, hh, ww, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    t0 = jnp.full((b,), 999.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), noise, t0, text)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )
    print(f"params: {n_params / 1e9:.2f}B")

    dense_fn = jax.jit(
        lambda p, n, t: denoise(
            model, p, n, t, num_steps=args.steps, enable_skipping=False
        )
    )
    t = time.perf_counter()
    sync(dense_fn(params, noise, text))
    print(f"dense compile+first: {time.perf_counter() - t:.1f}s")
    t = time.perf_counter()
    out_d, _ = dense_fn(params, noise, text)
    sync(out_d)
    dense_s = (time.perf_counter() - t) / args.steps
    print(f"dense: {dense_s * 1e3:.0f} ms/step")

    lite_fn = jax.jit(
        lambda p, n, t, thr: denoise(
            model, p, n, t, num_steps=args.steps, thresholds=thr,
            enable_skipping=True, vote_stride=args.vote_stride,
        )
    )
    # Attention-FLOP fraction for this geometry.
    n_tok = tokens
    attn_core = 4.0 * cfg.dim * n_tok * n_tok
    linear = (
        6.0 * n_tok * cfg.dim * cfg.dim  # self QKV/O + cross Q/O
        + 4.0 * n_tok * cfg.dim * cfg.ffn_dim  # FFN up+down
    )
    frac = attn_core / (attn_core + linear)
    print(f"attention FLOP fraction at {n_tok} tokens: {frac:.1%}")

    curve = []
    for thr in (
        [-10.0, -3.0, 0.1, 0.5, 1.0, 2.0] if "thr" in modes else []
    ):
        thrs = jnp.full((args.steps,), thr, jnp.float32)
        sync(lite_fn(params, noise, text, thrs))  # compile + mask warmup
        t = time.perf_counter()
        (out_l, tel) = lite_fn(params, noise, text, thrs)
        sync(out_l)
        lite_s = (time.perf_counter() - t) / args.steps
        sp = float(tel["final_sparsity"])
        print(
            f"lite thr={thr}: {lite_s * 1e3:.0f} ms/step, "
            f"sparsity={sp:.1%}, e2e speedup={dense_s / lite_s:.2f}x"
        )
        curve.append(
            dict(
                threshold=thr,
                final_sparsity=round(sp, 4),
                ms_per_step=round(lite_s * 1e3, 1),
                e2e_speedup=round(dense_s / lite_s, 3),
            )
        )
    # --- Forced-sparsity ablation at the reference's 5 points ---
    # Random-init weights have near-uniform attention, so the organic
    # threshold sweep above jumps straight from 0% to ~80% sparsity and
    # its masks are SCATTERED (the adversarial case for any tiled
    # engine: with 512-row compute tiles the per-q-tile schedule union
    # keeps 1-s^4 of tiles live). Real video attention converges to
    # diagonally-banded masks (reference README.md:12-27); this section
    # pins per-layer masks to that structure at the reference ablation's
    # sparsity points (README.md:79-87) with a frozen threshold, giving
    # the sparsity -> E2E-runtime curve at the true operating geometry.
    from liteattention_tpu.models.wan import init_skip_states

    states0 = init_skip_states(cfg, b, (f, hh, ww))
    ktf = next(iter(states0.values())).do_mask.shape[-1]
    qtf = next(iter(states0.values())).do_mask.shape[-2]
    heads = cfg.num_heads

    def banded_mask(s_target):
        width = max(1, int(round((1.0 - s_target) * ktf)))
        center = (np.arange(qtf) * (ktf - 1)) // max(qtf - 1, 1)
        start = np.clip(center - width // 2, 0, ktf - width)
        kpos = np.arange(ktf)[None, :]
        keep = (kpos >= start[:, None]) & (kpos < start[:, None] + width)
        keep[:, 0] = True
        return jnp.asarray(
            np.broadcast_to(keep, (b, heads, qtf, ktf)).copy()
        )

    frozen = jnp.full((args.steps,), -10.0, jnp.float32)
    band_fn = jax.jit(
        lambda p, n, t, st: denoise(
            model, p, n, t, num_steps=args.steps, thresholds=frozen,
            enable_skipping=True, initial_states=st,
            vote_stride=args.vote_stride,
        )
    )
    banded_curve = []
    for s_target in (
        [0.0, 0.21, 0.42, 0.57, 0.77] if "band" in modes else []
    ):
        m = banded_mask(s_target)
        st = {i: s0._replace(do_mask=m) for i, s0 in states0.items()}
        sync(band_fn(params, noise, text, st))
        t = time.perf_counter()
        out_b, tel = band_fn(params, noise, text, st)
        sync(out_b)
        band_s = (time.perf_counter() - t) / args.steps
        sp = float(tel["final_sparsity"])
        print(
            f"banded s={sp:.1%}: {band_s * 1e3:.0f} ms/step, "
            f"e2e speedup={dense_s / band_s:.2f}x"
        )
        banded_curve.append(
            dict(
                sparsity=round(sp, 4),
                ms_per_step=round(band_s * 1e3, 1),
                e2e_speedup=round(dense_s / band_s, 3),
            )
        )

    artifact = {
        "tokens": tokens,
        "layers": args.layers,
        "steps": args.steps,
        "dense_ms_per_step": round(dense_s * 1e3, 1),
        "vote_stride": args.vote_stride,
        "attention_flop_fraction": round(frac, 4),
        "threshold_curve": curve,
        "banded_curve": banded_curve,
    }
    out_path = "E2E_ABLATION.json"
    if os.path.exists(out_path) and (len(modes) < 2):
        # Partial rerun: merge into the existing artifact.
        with open(out_path) as fh:
            prev = json.load(fh)
        for key in ("threshold_curve", "banded_curve"):
            if not artifact[key] and prev.get(key):
                artifact[key] = prev[key]
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
