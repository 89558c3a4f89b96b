"""GPT decode demo: prefill + per-token generation with the KV cache.

Shows the inference stack: flash prefill, fixed-shape cached decode
(compile once, replay), and sampling.

Usage: python examples/gpt_generate.py [--tokens 32] [--temperature 0.8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from liteattention_tpu.utils.generation import greedy_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--speculative", action="store_true",
                    help="also run draft-model speculative decoding")
    ap.add_argument("--lookahead", type=int, default=3)
    args = ap.parse_args()

    cfg = GPTConfig(
        vocab_size=1024,
        max_position_embeddings=512,
        dim=args.dim,
        num_layers=args.layers,
        num_heads=args.heads,
    )
    model = GPTLMHeadModel(cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (1, 16), 0, 1024)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), prompt)

    apply_fn = lambda p, ids, inf: model.apply(p, ids, inference_params=inf)
    rng = (
        jax.random.PRNGKey(2) if args.temperature > 0 else None
    )
    t0 = time.perf_counter()
    out = greedy_decode(
        apply_fn,
        params,
        prompt,
        max_new_tokens=args.tokens,
        max_seqlen=512,
        rng=rng,
        temperature=args.temperature,
        top_k=50,
    )
    dt = time.perf_counter() - t0
    print(f"generated {args.tokens} tokens in {dt:.1f}s "
          f"({args.tokens / dt:.1f} tok/s incl. compile)")
    print("token ids:", out[0, 16:].tolist())

    if args.speculative:
        from liteattention_tpu.utils.generation import decode_speculative

        # Draft: a 1-layer model (fresh init here; in practice a small
        # distilled model). Greedy speculative output is guaranteed
        # identical to the main model's greedy output.
        dcfg = GPTConfig(
            vocab_size=1024, max_position_embeddings=512,
            dim=args.dim, num_layers=1, num_heads=args.heads,
        )
        draft = GPTLMHeadModel(dcfg)
        dparams = jax.jit(draft.init)(jax.random.PRNGKey(3), prompt)
        draft_fn = lambda p, ids, inf: draft.apply(
            p, ids, inference_params=inf
        )
        t0 = time.perf_counter()
        sp, stats = decode_speculative(
            apply_fn, params, draft_fn, dparams, prompt,
            max_new_tokens=args.tokens, max_seqlen=512,
            speculative_lookahead=args.lookahead, rng=rng,
            temperature=args.temperature, top_k=50, return_stats=True,
        )
        dt = time.perf_counter() - t0
        acc = stats["accepted_per_round"]
        print(f"speculative: {args.tokens} tokens in {dt:.1f}s, "
              f"{stats['rounds']} rounds, "
              f"mean accepted {sum(acc) / len(acc):.2f}/"
              f"{args.lookahead + 1}")
        if args.temperature == 0:
            match = bool(jnp.all(sp == out))
            print("greedy outputs identical:", match)


if __name__ == "__main__":
    main()
