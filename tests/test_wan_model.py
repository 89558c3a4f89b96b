"""Wan-style DiT model: shape/state-threading checks (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.models.wan import (
    WanConfig,
    WanModel,
    init_skip_states,
    rope_3d_freqs,
    apply_rope,
)


def _setup():
    cfg = WanConfig.tiny()
    model = WanModel(cfg)
    b, f, h, w = 1, 2, 8, 8
    latents = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    t = jnp.full((b,), 500.0, jnp.float32)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    return cfg, model, latents, t, text


def test_forward_dense():
    cfg, model, latents, t, text = _setup()
    params = model.init(jax.random.PRNGKey(2), latents, t, text)
    out, states = model.apply(params, latents, t, text)
    assert out.shape == latents.shape[:-1] + (cfg.out_channels,)
    assert states is None
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_forward_with_skip_states_threading():
    cfg, model, latents, t, text = _setup()
    b, f, h, w = latents.shape[:4]
    states = init_skip_states(cfg, b, (f, h, w))
    assert len(states) == cfg.num_layers
    params = model.init(jax.random.PRNGKey(2), latents, t, text, states)
    out, new_states = model.apply(
        params, latents, t, text, states, float("inf")
    )
    assert set(new_states) == set(states)
    for i in states:
        assert int(new_states[i].step) == 1
        # thr=+inf: masks collapse to anchors after one step.
        do = np.asarray(new_states[i].do_mask)
        assert (do.sum(-1) == 1).all()
    # Second step consumes the evolved mask without error.
    out2, states2 = model.apply(
        params, latents, t, text, new_states, float("inf")
    )
    assert np.isfinite(np.asarray(out2, np.float32)).all()


def test_rope_orthogonality():
    # RoPE preserves norms and relative-position structure.
    d = 64
    freqs = rope_3d_freqs((2, 2, 2), d)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, d))
    y = apply_rope(x, freqs)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_i2v_image_context():
    cfg, model, latents, t, text = _setup()
    img_ctx = jax.random.normal(
        jax.random.PRNGKey(5), (1, 4, cfg.text_dim)
    ).astype(jnp.bfloat16)
    # First-frame latent conditioning channels (Wan-I2V convention).
    cond = jax.random.normal(
        jax.random.PRNGKey(6), latents.shape[:-1] + (4,)
    ).astype(jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(2), latents, t, text,
        image_ctx=img_ctx, latent_cond=cond,
    )
    out, _ = model.apply(
        params, latents, t, text, image_ctx=img_ctx, latent_cond=cond
    )
    assert out.shape == latents.shape[:-1] + (cfg.out_channels,)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # Both conditioning channels must influence the output.
    out2, _ = model.apply(
        params, latents, t, text, image_ctx=img_ctx * 0.0,
        latent_cond=cond,
    )
    assert float(jnp.abs(out.astype(jnp.float32) -
                         out2.astype(jnp.float32)).max()) > 0
    out3, _ = model.apply(
        params, latents, t, text, image_ctx=img_ctx,
        latent_cond=cond * 0.0,
    )
    assert float(jnp.abs(out.astype(jnp.float32) -
                         out3.astype(jnp.float32)).max()) > 0
    # And the full pipeline threads them (CFG keeps image conditioning
    # in both branches).
    from liteattention_tpu.models.pipeline import denoise

    video, tel = jax.jit(
        lambda p, n, t_, u, ic, lc: denoise(
            model, p, n, t_, u, num_steps=2, image_ctx=ic, latent_cond=lc
        )
    )(params, latents, text, jnp.zeros_like(text), img_ctx, cond)
    assert np.isfinite(np.asarray(video, np.float32)).all()


def test_remat_matches_no_remat():
    import dataclasses

    cfg, model, latents, t, text = _setup()
    params = jax.jit(model.init)(jax.random.PRNGKey(2), latents, t, text)
    model_r = WanModel(dataclasses.replace(cfg, remat=True))

    def loss(m, p):
        out, _ = m.apply(p, latents, t, text)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(model, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(model_r, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # Remat recomputes the bf16 forward under different XLA fusion
    # decisions, so gradients agree only to bf16 rounding.
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)

def test_attn_probe_entropy_and_grad():
    """attn_probe_rows sows per-layer entropy/tile-excess scalars without
    changing the forward output or the parameter structure, and the
    sowed entropy is differentiable (the calibration harness regularizes
    through it; examples/structured_calibration.py)."""
    import dataclasses

    cfg = WanConfig.tiny()
    b, f, h, w = 1, 2, 32, 32  # 512 tokens -> 4 fine key tiles
    latents = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels)
    ).astype(jnp.bfloat16)
    t = jnp.full((b,), 500.0, jnp.float32)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    plain = WanModel(cfg)
    probe = WanModel(dataclasses.replace(cfg, attn_probe_rows=8))
    params = plain.init(jax.random.PRNGKey(2), latents, t, text)

    (out, _), inter = probe.apply(
        params, latents, t, text, mutable=["intermediates"]
    )
    out_plain, _ = plain.apply(params, latents, t, text)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(out_plain, np.float32)
    )

    def collect(tree, name):
        found = []
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == name:
                    found.extend(jax.tree_util.tree_leaves(v))
                else:
                    found.extend(collect(v, name))
        return found

    inter = jax.tree_util.tree_map(lambda x: x, inter)  # unfreeze-safe
    ents = collect(dict(inter["intermediates"]), "attn_entropy")
    tiles = collect(dict(inter["intermediates"]), "attn_tile_excess")
    assert len(ents) == cfg.num_layers
    assert len(tiles) == cfg.num_layers
    n_tokens = 512
    for e in ents:
        ev = float(e)
        assert 0.0 <= ev <= np.log(n_tokens) + 1e-3
    for te in tiles:
        assert float(te) > 0.0

    def ent_loss(p):
        _, i2 = probe.apply(
            p, latents, t, text, mutable=["intermediates"]
        )
        vals = collect(dict(i2["intermediates"]), "attn_entropy")
        return jnp.sum(jnp.stack(vals))

    g = jax.grad(ent_loss)(params)
    gnorm = jnp.sqrt(
        sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(g)
        )
    )
    assert float(gnorm) > 0.0
    assert np.isfinite(float(gnorm))
