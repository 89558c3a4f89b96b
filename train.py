"""Training entry point (reference training/run.py + train.py parity).

The reference wires Hydra configs into a PyTorch-Lightning trainer
(reference training/src/train.py:32-101). The TPU-native form is a flat
CLI over the same pieces: model config -> Trainer (optax + orbax) ->
fault-tolerant data -> metrics log.

Example (flat CLI):
  python train.py --model gpt2 --dim 256 --layers 4 --heads 4 \
      --steps 200 --batch-size 8 --seqlen 256 --ckpt-dir /tmp/ckpt

Example (config tree, the reference's Hydra tier — composition +
group/dotlist overrides via training/config_tree.py):
  python train.py --config configs/config.yaml \
      model=llama-tiny optimizer.learning_rate=1e-4 run.steps=500 \
      experiment=gpt2s-moe
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
    ap.add_argument("--config", default=None,
                    help="YAML config tree root (configs/config.yaml); "
                         "positional args become Hydra-style overrides")
    ap.add_argument("overrides", nargs="*",
                    help="group=name / key.path=value / +key=value / ~key")
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

    if args.config:
        import dataclasses

        from liteattention_tpu.training.config_tree import (
            load_config,
            to_flat_kwargs,
        )

        cfg_tree = load_config(args.config, args.overrides)
        m = cfg_tree.get("model", {})
        args.model = m.get("family", args.model)
        args.dim = m.get("dim", args.dim)
        args.layers = m.get("num_layers", args.layers)
        args.heads = m.get("num_heads", args.heads)
        args.vocab = m.get("vocab", args.vocab)
        r = cfg_tree.get("run", {})
        args.steps = r.get("steps", args.steps)
        args.batch_size = r.get("batch_size", args.batch_size)
        args.seqlen = r.get("seqlen", args.seqlen)
        args.data = r.get("data", args.data)
        args.metrics_jsonl = r.get("metrics_jsonl", args.metrics_jsonl)
        args.data_parallel = r.get("data_parallel", args.data_parallel)
        fields = [f.name for f in dataclasses.fields(TrainConfig)]
        tcfg_kwargs = {
            **to_flat_kwargs(cfg_tree.get("optimizer"), fields),
            **to_flat_kwargs(cfg_tree.get("trainer"), fields),
        }
        args.lr = tcfg_kwargs.pop("learning_rate", args.lr)
        args.ckpt_dir = tcfg_kwargs.pop("checkpoint_dir", args.ckpt_dir)
        args.moe_experts = m.get("moe_experts", 0)
    else:
        tcfg_kwargs = {}
        args.moe_experts = 0

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
    if args.moe_experts:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, moe_experts=args.moe_experts)
    model = GPTLMHeadModel(cfg)
    ids0 = jnp.zeros((args.batch_size, args.seqlen), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids0)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )
    print(f"model: {args.model} {n_params / 1e6:.1f}M params")

    def loss_fn(p, batch):
        if cfg.moe_experts > 0:
            from liteattention_tpu.models.gpt import gpt_loss_fn

            return gpt_loss_fn(model, p, batch, batch)
        logits = model.apply(p, batch)
        return cross_entropy_loss(logits[:, :-1], batch[:, 1:])

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("dp",))
        print(f"data parallel over {len(jax.devices())} devices")

    tcfg = TrainConfig(
        learning_rate=args.lr,
        warmup_steps=tcfg_kwargs.pop(
            "warmup_steps", max(args.steps // 10, 1)
        ),
        total_steps=args.steps,
        checkpoint_dir=args.ckpt_dir,
        **tcfg_kwargs,
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
