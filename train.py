"""Training entry point (reference training/run.py + train.py parity).

The reference wires Hydra configs into a PyTorch-Lightning trainer
(reference training/src/train.py:32-101). The TPU-native form is a flat
CLI over the same pieces: model config -> Trainer (optax + orbax) ->
fault-tolerant data -> metrics log.

Example:
  python train.py --model gpt2 --dim 256 --layers 4 --heads 4 \
      --steps 200 --batch-size 8 --seqlen 256 --ckpt-dir /tmp/ckpt
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.losses.cross_entropy import cross_entropy_loss
from liteattention_tpu.models.configs import gpt2_config, llama_config
from liteattention_tpu.models.gpt import GPTLMHeadModel
from liteattention_tpu.training.data import synthetic_lm_batches
from liteattention_tpu.training.trainer import TrainConfig, Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["gpt2", "llama"], default="gpt2")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the batch over all local devices")
    ap.add_argument("--data", default=None,
                    help="token memmap file (uint16) to train on; "
                         "default: synthetic batches")
    ap.add_argument("--metrics-jsonl", default=None,
                    help="append metric records to this JSONL file")
    args = ap.parse_args()

    if args.model == "gpt2":
        cfg = gpt2_config(
            dim=args.dim, num_layers=args.layers, num_heads=args.heads,
            vocab=args.vocab, max_pos=max(args.seqlen, 1024),
        )
    else:
        cfg = llama_config(
            dim=args.dim, num_layers=args.layers, num_heads=args.heads,
            vocab=args.vocab,
        )
    model = GPTLMHeadModel(cfg)
    ids0 = jnp.zeros((args.batch_size, args.seqlen), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids0)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )
    print(f"model: {args.model} {n_params / 1e6:.1f}M params")

    def loss_fn(p, batch):
        logits = model.apply(p, batch)
        return cross_entropy_loss(logits[:, :-1], batch[:, 1:])

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("dp",))
        print(f"data parallel over {len(jax.devices())} devices")

    tcfg = TrainConfig(
        learning_rate=args.lr,
        warmup_steps=max(args.steps // 10, 1),
        total_steps=args.steps,
        checkpoint_dir=args.ckpt_dir,
    )
    if args.metrics_jsonl:
        from liteattention_tpu.training.logging import (
            JsonlLogger,
            TeeLogger,
        )

        log_fn = TeeLogger(JsonlLogger(args.metrics_jsonl), printer=True)
    else:
        log_fn = lambda m: print(json.dumps(m))

    trainer = Trainer(loss_fn, tcfg, mesh=mesh)
    state = trainer.restore_or_init(params)
    if args.data:
        from liteattention_tpu.training.data import memmap_lm_batches

        tokens = np.memmap(args.data, dtype=np.uint16, mode="r")
        batches = memmap_lm_batches(
            tokens, args.batch_size, args.seqlen
        )
        print(f"data: {args.data} ({len(tokens) / 1e6:.1f}M tokens)")
    else:
        batches = synthetic_lm_batches(
            cfg.vocab_size, args.batch_size, args.seqlen
        )
    state = trainer.fit(
        state,
        batches,
        num_steps=args.steps,
        tokens_per_batch=args.batch_size * args.seqlen,
        log_fn=log_fn,
    )
    trainer.finalize_checkpoints()
    print(f"done at step {int(state['step'])}")


if __name__ == "__main__":
    main()
