"""MoE FFN + expert parallelism (beyond reference: SURVEY §2.4 lists
expert parallelism as absent upstream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from liteattention_tpu.modules.moe import (
    MoEMlp,
    init_moe_params,
    moe_apply_sharded,
    moe_forward,
)


def _dense_oracle(params, x, top_k):
    """Evaluate ALL experts on all tokens, combine by top-k gates."""
    xf = x.astype(jnp.float32)
    probs = jax.nn.softmax(xf @ params["router"], -1)
    gates, experts = jax.lax.top_k(probs, top_k)
    gates = gates / gates.sum(-1, keepdims=True)
    h = jnp.einsum("td,edf->tef", xf, params["wi"])
    y_all = jnp.einsum("tef,efd->ted", jax.nn.gelu(h), params["wo"])
    sel = jnp.take_along_axis(
        y_all, experts[..., None], axis=1
    )  # [T, k, D]
    return jnp.einsum("tk,tkd->td", gates, sel)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_dense_oracle(top_k):
    t, d, f, e = 64, 16, 32, 4
    params = init_moe_params(jax.random.PRNGKey(0), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d))
    # Capacity = t: nothing can overflow.
    y, aux = moe_forward(params, x, top_k=top_k, capacity=t)
    ref = _dense_oracle(params, x, top_k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert float(aux) > 0


def test_moe_capacity_drops_are_partial_passthrough():
    t, d, f, e = 64, 16, 32, 4
    params = init_moe_params(jax.random.PRNGKey(0), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d))
    y_full, _ = moe_forward(params, x, top_k=2, capacity=t)
    y_tight, _ = moe_forward(params, x, top_k=2, capacity=2)
    assert np.isfinite(np.asarray(y_tight)).all()
    # Tokens lose expert contributions, never gain them.
    assert float(jnp.sum(y_tight**2)) < float(jnp.sum(y_full**2)) + 1e-6


def test_moe_expert_parallel_matches_single_device():
    n = 4
    if len(jax.devices()) < n:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    t, d, f, e = 128, 16, 32, 8
    params = init_moe_params(jax.random.PRNGKey(2), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(3), (t, d))
    # Capacity semantics differ (global routing vs per-device routing),
    # so equality holds exactly when NO token overflows in either form.
    cap = t
    y1, aux1 = moe_forward(params, x, top_k=2, capacity=cap)
    yn, auxn = moe_apply_sharded(
        params, x, mesh, "ep", top_k=2, capacity=cap
    )
    np.testing.assert_allclose(np.asarray(yn), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(float(auxn))


def test_moe_expert_parallel_grads_match():
    n = 4
    if len(jax.devices()) < n:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    t, d, f, e = 64, 8, 16, 4
    params = init_moe_params(jax.random.PRNGKey(4), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(5), (t, d))
    cap = t

    def loss1(p):
        y, aux = moe_forward(p, x, top_k=2, capacity=cap)
        return jnp.sum(y**2) + 0.01 * aux

    def lossn(p):
        y, aux = moe_apply_sharded(p, x, mesh, "ep", top_k=2,
                                   capacity=cap)
        return jnp.sum(y**2) + 0.01 * aux

    g1 = jax.grad(loss1)(params)
    gn = jax.grad(lossn)(params)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(gn[k]), np.asarray(g1[k]), atol=2e-4, rtol=2e-4
        )


def test_moe_flax_module():
    m = MoEMlp(dim=16, hidden=32, num_experts=4, top_k=2)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 10, 16))
    variables = m.init(jax.random.PRNGKey(7), x)
    y, state = m.apply(x=x, variables=variables, mutable=["losses"])
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert "moe_aux" in state["losses"]


def test_moe_gpt_forward_and_grads():
    """GPTConfig(moe_experts>0) swaps the dense MLP for MoE; forward,
    grads, and the sown aux loss all work through the backbone."""
    from liteattention_tpu.losses import cross_entropy_loss
    from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=128, max_position_embeddings=64, dim=64,
        num_layers=2, num_heads=2, moe_experts=4, moe_top_k=2,
    )
    model = GPTLMHeadModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0, 128)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
    params = {"params": variables["params"]}  # drop init-time sows
    logits, state = model.apply(params, ids, mutable=["losses"])
    assert logits.shape == (2, 32, 128)
    aux = jax.tree_util.tree_leaves(state["losses"])
    assert len(aux) == 2 and all(np.isfinite(float(a)) for a in aux)

    def loss(p):
        lg, st = model.apply(p, ids, mutable=["losses"])
        ce = cross_entropy_loss(lg[:, :-1], ids[:, 1:])
        return ce + 0.01 * sum(jax.tree_util.tree_leaves(st["losses"]))

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # Router grads must be nonzero (the aux loss trains the router).
    r = g["params"]["transformer"]["block_0"]["mlp"]["moe"]["router"]
    assert float(jnp.abs(r).max()) > 0


def test_moe_gpt_trains():
    """MoE GPT memorizes a fixed batch through the Trainer with the aux
    loss folded in (router + experts both receive gradients)."""
    import itertools

    from liteattention_tpu.losses import cross_entropy_loss
    from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from liteattention_tpu.training.trainer import TrainConfig, Trainer

    cfg = GPTConfig(
        vocab_size=64, max_position_embeddings=32, dim=48,
        num_layers=1, num_heads=2, moe_experts=4,
    )
    model = GPTLMHeadModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 0, 64)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
    params = {"params": variables["params"]}

    def loss_fn(p, batch):
        lg, st = model.apply(p, batch, mutable=["losses"])
        ce = cross_entropy_loss(lg[:, :-1], batch[:, 1:])
        return ce + 0.01 * sum(jax.tree_util.tree_leaves(st["losses"]))

    tr = Trainer(loss_fn, TrainConfig(learning_rate=3e-3, warmup_steps=2,
                                      total_steps=40))
    state = tr.init_state(params)
    logs = []
    tr.fit(state, itertools.repeat(np.asarray(ids)), 20, log_every=10,
           log_fn=logs.append)
    assert logs[-1]["loss"] < logs[0]["loss"]


def test_gpt_loss_fn_includes_moe_aux():
    """Regression (review r3): gpt_loss_fn must apply with
    mutable=["losses"] for MoE configs -- flax silently drops sows
    otherwise and the router never receives its balancing gradient."""
    from liteattention_tpu.losses import cross_entropy_loss
    from liteattention_tpu.models.gpt import (
        GPTConfig,
        GPTLMHeadModel,
        gpt_loss_fn,
    )

    cfg = GPTConfig(
        vocab_size=64, max_position_embeddings=32, dim=32,
        num_layers=1, num_heads=2, moe_experts=4,
    )
    model = GPTLMHeadModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 64)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
    params = {"params": variables["params"]}
    total = float(gpt_loss_fn(model, params, ids, ids))
    logits = model.apply(params, ids)
    ce = float(cross_entropy_loss(logits[:, :-1], ids[:, 1:]))
    assert total > ce  # the aux term is present and positive
    assert total == pytest.approx(
        ce + 0.01 * float(
            sum(jax.tree_util.tree_leaves(
                model.apply(params, ids, mutable=["losses"])[1]["losses"]
            ))
        ), rel=1e-6,
    )
