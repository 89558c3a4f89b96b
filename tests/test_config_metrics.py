"""Config-tree composition, running metrics, and the causality monitor
(reference: training/configs/ Hydra tree, training/src/metrics/*,
training/src/callbacks/{causality_monitor,params_log}.py)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.training.config_tree import (
    apply_overrides,
    load_config,
    merge_trees,
    resolve_interpolations,
    select,
)
from liteattention_tpu.training.diagnostics import (
    causality_leakage,
    check_causal,
    param_stats,
)
from liteattention_tpu.training.metrics import (
    Accuracy,
    NumTokens,
    Perplexity,
    token_accuracy,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT_CFG = os.path.join(REPO, "configs", "config.yaml")


# ---------------------------------------------------------------- config

def test_config_compose_defaults():
    cfg = load_config(ROOT_CFG)
    # groups landed under their keys
    assert cfg["optimizer"]["learning_rate"] == pytest.approx(3e-4)
    assert cfg["trainer"]["ema_decay"] == 0.0
    assert cfg["model"]["family"] == "gpt2"
    # root body survived composition
    assert cfg["run"]["steps"] == 100


def test_config_dotlist_and_group_overrides():
    cfg = load_config(
        ROOT_CFG,
        [
            "optimizer.learning_rate=1e-4",   # leaf set (typed)
            "run.steps=7",
            "+run.note=hello",                # add
            "~trainer.max_checkpoints",       # delete
            "model=llama-tiny",               # group swap
        ],
    )
    assert cfg["optimizer"]["learning_rate"] == pytest.approx(1e-4)
    assert cfg["run"]["steps"] == 7
    assert cfg["run"]["note"] == "hello"
    assert "max_checkpoints" not in cfg["trainer"]
    assert cfg["model"]["family"] == "llama"


def test_config_missing_key_requires_plus():
    cfg = load_config(ROOT_CFG)
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["run.does_not_exist=1"])
    apply_overrides(cfg, ["+run.does_not_exist=1"])  # ok with +
    assert cfg["run"]["does_not_exist"] == 1


def test_config_global_package_experiment():
    # experiment/gpt2s-moe.yaml carries "# @package _global_" and must
    # patch keys ACROSS groups, not nest under cfg["experiment"].
    cfg = load_config(ROOT_CFG, ["experiment=gpt2s-moe"])
    assert cfg["model"]["moe_experts"] == 4
    assert cfg["optimizer"]["learning_rate"] == pytest.approx(6e-4)
    assert cfg["run"]["steps"] == 50
    assert "experiment" not in cfg or not isinstance(
        cfg.get("experiment"), dict
    )


def test_config_interpolation_and_merge():
    tree = {
        "a": {"x": 4, "name": "run-${a.x}"},
        "b": "${a.x}",
        "keep": "${not.there}",
    }
    resolve_interpolations(tree)
    assert tree["b"] == 4  # full-string ref keeps the int type
    assert tree["a"]["name"] == "run-4"
    assert tree["keep"] == "${not.there}"  # unresolvable stays literal
    dst = {"m": {"a": 1, "b": 2}, "l": [1, 2]}
    merge_trees(dst, {"m": {"b": 3}, "l": [9]})
    assert dst == {"m": {"a": 1, "b": 3}, "l": [9]}
    assert select(dst, "m.b") == 3
    assert select(dst, "m.zz", default="d") == "d"


# --------------------------------------------------------------- metrics

def test_perplexity_matches_exp_avg_nll():
    rng = np.random.default_rng(0)
    ppl = Perplexity()
    total, count = 0.0, 0
    for _ in range(3):
        logits = jnp.asarray(rng.normal(size=(2, 8, 11)), jnp.float32)
        target = jnp.asarray(rng.integers(0, 11, size=(2, 8)))
        target = target.at[0, 6:].set(-100)  # ignore_index tail
        ppl.update(logits=logits, target=target)
        logp = jax.nn.log_softmax(logits, -1)
        for b in range(2):
            for t in range(8):
                if int(target[b, t]) == -100:
                    continue
                total += -float(logp[b, t, int(target[b, t])])
                count += 1
    # exp(average nll), not average(exp(nll)) — reference perplexity.py
    assert ppl.compute() == pytest.approx(math.exp(total / count), rel=1e-5)


def test_perplexity_from_loss_weighted_by_tokens():
    ppl = Perplexity()
    t1 = jnp.zeros((1, 4), jnp.int32)
    t2 = jnp.zeros((1, 12), jnp.int32)
    ppl.update(loss=jnp.asarray(2.0), target=t1)
    ppl.update(loss=jnp.asarray(1.0), target=t2)
    want = math.exp((2.0 * 4 + 1.0 * 12) / 16)
    assert ppl.compute() == pytest.approx(want)


def test_accuracy_soft_targets_and_ignore():
    logits = jnp.asarray(
        [[[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]]], jnp.float32
    )
    hard = jnp.asarray([[1, 0, 0]])
    hard = hard.at[0, 2].set(-100)
    assert float(token_accuracy(logits, hard)) == pytest.approx(1.0)
    acc = Accuracy()
    soft = jax.nn.one_hot(jnp.asarray([[1, 1, 1]]), 2)  # Mixup-style
    acc.update(logits, soft)
    assert acc.compute() == pytest.approx(2 / 3)


def test_num_tokens_survives_reset():
    nt = NumTokens()
    nt.update(jnp.zeros((2, 5), jnp.int32))
    nt.reset()  # epoch boundary: count must persist (reference hack)
    nt.update(jnp.zeros((2, 5), jnp.int32))
    assert nt.compute() == 20
    st = nt.state_dict()
    nt2 = NumTokens()
    nt2.load_state_dict(st)
    assert nt2.compute() == 20
    nt.hard_reset()
    assert nt.compute() == 0


# ------------------------------------------------------------ causality

def test_causality_monitor_on_attention():
    from liteattention_tpu.modules.mha import MHA

    def make(causal):
        m = MHA(embed_dim=16, num_heads=2, causal=causal,
                dtype=jnp.float32)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 16)))
        return lambda x: m.apply(p, x)

    leaks = causality_leakage(make(True), seq_len=10, input_dim=16)
    assert float(jnp.max(leaks)) < 1e-7
    assert check_causal(make(True), seq_len=10, input_dim=16)
    # a bidirectional mixer must trip the monitor
    bi = causality_leakage(make(False), seq_len=10, input_dim=16)
    assert float(jnp.max(bi[:-1])) > 1e-4
    assert not check_causal(make(False), seq_len=10, input_dim=16)


def test_param_stats():
    params = {
        "params": {
            "wte": {"embedding": jnp.zeros((10, 4))},
            "block0": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
        }
    }
    stats = param_stats(params)
    assert stats["model/params_total"] == 40 + 16 + 4
    assert stats["model/params_trainable"] == 60
    assert stats["model/params/wte"] == 40
    assert stats["model/params/block0"] == 20
    mask = {
        "params": {
            "wte": {"embedding": False},
            "block0": {"w": True, "b": True},
        }
    }
    stats = param_stats(params, trainable_mask=mask)
    assert stats["model/params_trainable"] == 20
    assert stats["model/params_not_trainable"] == 40
