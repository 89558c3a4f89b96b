"""Training harness: loss descends, DP sharding, checkpoint resume,
fault-tolerant sampler (CPU, 8 virtual devices)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from liteattention_tpu.losses.cross_entropy import cross_entropy_loss
from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from liteattention_tpu.training.data import (
    FaultTolerantSampler,
    synthetic_lm_batches,
)
from liteattention_tpu.training.trainer import TrainConfig, Trainer


def _setup(tmp=None):
    cfg = GPTConfig(
        vocab_size=128, max_position_embeddings=64, dim=64,
        num_layers=1, num_heads=2,
    )
    model = GPTLMHeadModel(cfg)
    ids = jnp.zeros((4, 32), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)

    def loss_fn(p, batch):
        logits = model.apply(p, batch)
        return cross_entropy_loss(logits[:, :-1], batch[:, 1:])

    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=50,
        checkpoint_dir=tmp, checkpoint_every=5,
    )
    return cfg, model, params, loss_fn, tcfg


def test_loss_descends():
    cfg, model, params, loss_fn, tcfg = _setup()
    trainer = Trainer(loss_fn, tcfg)
    state = trainer.init_state(params)
    # One fixed batch repeated: the model must memorize it, so the loss
    # has to fall (random fresh tokens have no learnable signal).
    import itertools
    fixed = next(synthetic_lm_batches(cfg.vocab_size, 4, 32, seed=1))
    batches = itertools.repeat(fixed)
    logs = []
    state = trainer.fit(
        state, batches, num_steps=30, log_every=10,
        log_fn=logs.append, tokens_per_batch=4 * 32,
    )
    assert int(state["step"]) == 30
    assert logs[-1]["loss"] < logs[0]["loss"] - 0.5
    assert "tokens_per_s" in logs[-1]


def test_data_parallel_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg, model, params, loss_fn, tcfg = _setup()
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    batches = list(
        b for b, _ in zip(synthetic_lm_batches(cfg.vocab_size, 4, 32), range(3))
    )
    t_dp = Trainer(loss_fn, tcfg, mesh=mesh)
    t_1 = Trainer(loss_fn, tcfg)
    s_dp, s_1 = t_dp.init_state(params), t_1.init_state(params)
    logs_dp, logs_1 = [], []
    s_dp = t_dp.fit(s_dp, iter(batches), 3, log_every=1,
                    log_fn=logs_dp.append)
    s_1 = t_1.fit(s_1, iter(batches), 3, log_every=1,
                  log_fn=logs_1.append)
    # bf16 grads + Adam normalization amplify reduction-order noise in
    # raw params; the loss/grad-norm trajectory must agree closely.
    for a, b in zip(logs_dp, logs_1):
        np.testing.assert_allclose(a["loss"], b["loss"], atol=2e-3)
        np.testing.assert_allclose(
            a["grad_norm"], b["grad_norm"], rtol=2e-2
        )


def test_checkpoint_resume():
    with tempfile.TemporaryDirectory() as tmp:
        cfg, model, params, loss_fn, tcfg = _setup(tmp)
        trainer = Trainer(loss_fn, tcfg)
        state = trainer.restore_or_init(params)
        batches = synthetic_lm_batches(cfg.vocab_size, 4, 32)
        state = trainer.fit(state, batches, num_steps=10)
        trainer.finalize_checkpoints()
        # New trainer resumes from the newest saved step.
        trainer2 = Trainer(loss_fn, tcfg)
        state2 = trainer2.restore_or_init(params)
        assert int(state2["step"]) == 10
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(state2["params"])[0]),
            np.asarray(jax.tree_util.tree_leaves(state["params"])[0]),
        )


def test_fault_tolerant_sampler_resume():
    s = FaultTolerantSampler(num_samples=10, seed=3)
    it = iter(s)
    first = [next(it) for _ in range(7)]
    saved = s.state_dict()
    rest = [next(it) for _ in range(3)]
    # Fresh sampler restored mid-epoch continues identically.
    s2 = FaultTolerantSampler(num_samples=10, seed=0)
    s2.load_state_dict(saved)
    it2 = iter(s2)
    rest2 = [next(it2) for _ in range(3)]
    assert rest == rest2
    # One epoch covers every sample exactly once.
    assert sorted(first + rest) == list(range(10))
    # Sharded variant partitions the permutation.
    sh0 = FaultTolerantSampler(10, seed=3, shard=0, num_shards=2)
    sh1 = FaultTolerantSampler(10, seed=3, shard=1, num_shards=2)
    a = [next(iter(sh0)) for _ in range(1)]
    b = [next(iter(sh1)) for _ in range(1)]
    assert a != b


def test_zero1_opt_state_sharding():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg, model, params, loss_fn, _ = _setup()
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=50,
        shard_opt_state=True,
    )
    trainer = Trainer(loss_fn, tcfg, mesh=mesh)
    state = trainer.init_state(params)
    # Adam moments of dp-divisible leaves must actually be sharded.
    mu_leaves = [
        x for x in jax.tree_util.tree_leaves(state["opt_state"])
        if hasattr(x, "sharding") and x.ndim >= 1 and x.shape[0] % 4 == 0
    ]
    assert any(
        not l.sharding.is_fully_replicated for l in mu_leaves
    ), "no optimizer-state leaf is sharded"
    batches = synthetic_lm_batches(cfg.vocab_size, 4, 32)
    logs = []
    state = trainer.fit(state, batches, 3, log_every=1, log_fn=logs.append)
    assert np.isfinite(logs[-1]["loss"])
    # Trajectory matches the unsharded trainer.
    t_ref = Trainer(loss_fn, TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=50))
    s_ref = t_ref.init_state(params)
    logs_ref = []
    s_ref = t_ref.fit(
        s_ref, synthetic_lm_batches(cfg.vocab_size, 4, 32), 3,
        log_every=1, log_fn=logs_ref.append,
    )
    for a, b in zip(logs, logs_ref):
        np.testing.assert_allclose(a["loss"], b["loss"], atol=2e-3)


def test_zero2_grad_sharding_matches_unsharded():
    """ZeRO-2 (VERDICT r2 item 6): gradients reduce-scattered over dp +
    sharded optimizer update must track the unsharded trajectory.
    Bar: reference training/src/utils/ddp_zero2.py."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg, model, params, loss_fn, _ = _setup()
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=50,
        shard_grads=True,
    )
    trainer = Trainer(loss_fn, tcfg, mesh=mesh)
    state = trainer.init_state(params)
    # shard_grads implies opt-state sharding (ZeRO-2 superset of ZeRO-1)
    mu_leaves = [
        x for x in jax.tree_util.tree_leaves(state["opt_state"])
        if hasattr(x, "sharding") and x.ndim >= 1 and x.shape[0] % 4 == 0
    ]
    assert any(not l.sharding.is_fully_replicated for l in mu_leaves)
    logs = []
    state = trainer.fit(
        state, synthetic_lm_batches(cfg.vocab_size, 4, 32), 3,
        log_every=1, log_fn=logs.append,
    )
    t_ref = Trainer(loss_fn, TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=50))
    s_ref = t_ref.init_state(params)
    logs_ref = []
    s_ref = t_ref.fit(
        s_ref, synthetic_lm_batches(cfg.vocab_size, 4, 32), 3,
        log_every=1, log_fn=logs_ref.append,
    )
    for a, b in zip(logs, logs_ref):
        np.testing.assert_allclose(a["loss"], b["loss"], atol=2e-3)
    # params converge to the same point (reduce-scatter vs all-reduce
    # reduction order diverges at float rounding, and Adam's normalized
    # update amplifies it on near-zero grads -- loose tolerance)
    pa = jax.tree_util.tree_leaves(state["params"])[0]
    pb = jax.tree_util.tree_leaves(s_ref["params"])[0]
    np.testing.assert_allclose(
        np.asarray(pa), np.asarray(pb), atol=5e-3
    )


def test_ema_and_speed_monitor():
    """EMA params + MFU/speed monitoring (VERDICT r2 item 9; reference
    training/src/callbacks/{ema,speed_monitor}.py)."""
    cfg, model, params, loss_fn, _ = _setup()
    tcfg = TrainConfig(
        learning_rate=1e-2, warmup_steps=2, total_steps=50,
        ema_decay=0.9,
    )
    trainer = Trainer(loss_fn, tcfg)
    state = trainer.init_state(params)
    assert "ema_params" in state
    import itertools
    fixed = next(synthetic_lm_batches(cfg.vocab_size, 4, 32, seed=1))
    logs = []
    state = trainer.fit(
        state, itertools.repeat(fixed), 5, log_every=5,
        tokens_per_batch=128, flops_per_batch=1e9, log_fn=logs.append,
    )
    assert "mfu" in logs[-1] and logs[-1]["mfu"] > 0
    assert "tokens_per_s" in logs[-1]
    # EMA lags the raw params (decay 0.9, 5 steps) but is not equal
    p = jax.tree_util.tree_leaves(state["params"])[0]
    e = jax.tree_util.tree_leaves(state["ema_params"])[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))
    # EMA is a convex combination converging toward params: distance to
    # params is bounded by distance of the init to params
    p0 = jax.tree_util.tree_leaves(params)[0]
    assert float(jnp.max(jnp.abs(e - p))) <= float(
        jnp.max(jnp.abs(p0 - p))
    ) + 1e-6


def test_norm_monitor():
    """Per-module param/grad norms in the log record (reference
    training/src/callbacks/norm_monitor.py)."""
    import itertools

    cfg, model, params, loss_fn, _ = _setup()
    tcfg = TrainConfig(
        learning_rate=1e-2, warmup_steps=2, total_steps=50,
        norm_monitor=True,
    )
    trainer = Trainer(loss_fn, tcfg)
    state = trainer.init_state(params)
    fixed = next(synthetic_lm_batches(cfg.vocab_size, 4, 32, seed=2))
    logs = []
    trainer.fit(
        state, itertools.repeat(fixed), 2, log_every=2,
        log_fn=logs.append,
    )
    rec = logs[-1]
    assert rec["param_norms"] and rec["grad_norms"]
    for v in {**rec["param_norms"], **rec["grad_norms"]}.values():
        assert np.isfinite(v) and v >= 0
    # Norms are per TOP-LEVEL module and consistent with the global norm.
    total = sum(v**2 for v in rec["grad_norms"].values()) ** 0.5
    assert abs(total - rec["grad_norm"]) / max(rec["grad_norm"], 1e-9) < 1e-4


def test_grad_comm_dtype_compression():
    """fp16-compress comm-hook analog (reference
    training/src/distributed/ddp_comm_hooks.py): the dp gradient
    all-reduce runs in a compressed dtype. float32 "compression" must
    reproduce the stock dp path; bfloat16 must track it closely."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg, model, params, loss_fn, tcfg = _setup()
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    batches = list(
        b for b, _ in zip(synthetic_lm_batches(cfg.vocab_size, 4, 32), range(3))
    )
    import dataclasses

    def run(**kw):
        t = Trainer(
            loss_fn, dataclasses.replace(tcfg, **kw), mesh=mesh
        )
        s = t.init_state(params)
        logs = []
        t.fit(s, iter(batches), 3, log_every=1, log_fn=logs.append)
        return logs

    stock = run()
    f32 = run(grad_comm_dtype="float32")
    bf16 = run(grad_comm_dtype="bfloat16")
    # The shard_map path evaluates the model per-shard (batch 1 vs 4),
    # so bf16 matmul rounding differs from the stock path even at f32
    # wire precision — same tolerance as the dp-vs-single-device test.
    for a, b in zip(stock, f32):
        np.testing.assert_allclose(a["loss"], b["loss"], atol=2e-3)
        np.testing.assert_allclose(
            a["grad_norm"], b["grad_norm"], rtol=2e-2
        )
    for a, b in zip(stock, bf16):
        np.testing.assert_allclose(a["loss"], b["loss"], atol=2e-2)
        np.testing.assert_allclose(
            a["grad_norm"], b["grad_norm"], rtol=5e-2
        )


def test_jsonl_logger_roundtrip(tmp_path):
    """JSONL metrics sink (reference: Lightning W&B/CSV loggers):
    records survive a round-trip, appends resume, truncation tolerated."""
    import itertools

    from liteattention_tpu.training.logging import (
        JsonlLogger,
        read_jsonl,
    )

    path = str(tmp_path / "m.jsonl")
    cfg, model, params, loss_fn, _ = _setup()
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=20)
    trainer = Trainer(loss_fn, tcfg)
    state = trainer.init_state(params)
    fixed = next(synthetic_lm_batches(cfg.vocab_size, 4, 32, seed=3))
    with JsonlLogger(path) as logger:
        trainer.fit(state, itertools.repeat(fixed), 4, log_every=2,
                    log_fn=logger, tokens_per_batch=128,
                    flops_per_batch=1e9)
    recs = read_jsonl(path)
    assert len(recs) == 2
    assert {"step", "loss", "grad_norm", "mfu", "tokens_per_s"} <= set(recs[0])
    # Append-resume + truncated-tail tolerance.
    with JsonlLogger(path) as logger:
        logger({"step": 99, "loss": 0.5})
    with open(path, "a") as f:
        f.write('{"step": 100, "lo')  # crash mid-write
    recs = read_jsonl(path)
    assert len(recs) == 3 and recs[-1]["step"] == 99


def test_lm_dataset_and_memmap_batches(tmp_path):
    """LMDataset chunking semantics (reference lm_dataset.py: seq i =
    tokens[i*L : i*L+L+1]) over a real np.memmap + resumable stream."""
    from liteattention_tpu.training.data import (
        LMDataset,
        memmap_lm_batches,
    )

    path = str(tmp_path / "tokens.bin")
    toks = np.arange(1001, dtype=np.uint16)
    np.memmap(path, dtype=np.uint16, mode="w+", shape=(1001,))[:] = toks
    mm = np.memmap(path, dtype=np.uint16, mode="r", shape=(1001,))
    ds = LMDataset(mm, seq_len=100)
    assert len(ds) == 10
    np.testing.assert_array_equal(ds[0], np.arange(101))
    np.testing.assert_array_equal(ds[9], np.arange(900, 1001))
    it = memmap_lm_batches(mm, batch_size=4, seq_len=100, seed=1)
    b = next(it)
    assert b.shape == (4, 101) and b.dtype == np.int32
    # input/target overlap: batch[:, 1:] is the next-token shift.
    np.testing.assert_array_equal(b[:, 1:-1], b[:, :-2] + 1)
    # Resumable: a sampler restored mid-epoch continues the same order.
    from liteattention_tpu.training.data import FaultTolerantSampler

    s = FaultTolerantSampler(num_samples=10, seed=5)
    it1 = memmap_lm_batches(mm, 2, 100, sampler=s)
    next(it1)
    saved = s.state_dict()
    b_rest = next(it1)
    s2 = FaultTolerantSampler(num_samples=10, seed=0)
    s2.load_state_dict(saved)
    b_rest2 = next(memmap_lm_batches(mm, 2, 100, sampler=s2))
    np.testing.assert_array_equal(b_rest, b_rest2)
