"""Wan2.1 checkpoint remap tests (VERDICT round-1 item 2, remap leg).

Real Wan weights are unreachable in this environment (zero egress), so
the remap is validated structurally and semantically against a
synthetic state dict in the official torch layout
(Wan-Video/Wan2.1 wan/modules/model.py key names).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.models.wan import WanConfig, WanModel
from liteattention_tpu.utils.pretrained import remap_state_dict_wan


def _synthetic_wan_state_dict(cfg: WanConfig, seed=0, i2v=False):
    """Random state dict with the official Wan2.1 key names/shapes."""
    rng = np.random.RandomState(seed)
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    sd = {}

    def lin(name, n_in, n_out):
        sd[name + ".weight"] = rng.randn(n_out, n_in).astype(np.float32) * 0.02
        sd[name + ".bias"] = rng.randn(n_out).astype(np.float32) * 0.02

    sd["patch_embedding.weight"] = (
        rng.randn(d, cfg.in_channels, pt, ph, pw).astype(np.float32) * 0.02
    )
    sd["patch_embedding.bias"] = rng.randn(d).astype(np.float32) * 0.02
    lin("text_embedding.0", cfg.text_dim, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", cfg.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, 6 * d)
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        for mod in ["self_attn", "cross_attn"]:
            for w in ["q", "k", "v", "o"]:
                lin(pre + f"{mod}.{w}", d, d)
            sd[pre + f"{mod}.norm_q.weight"] = np.ones(d, np.float32)
            sd[pre + f"{mod}.norm_k.weight"] = np.ones(d, np.float32)
        sd[pre + "norm3.weight"] = np.ones(d, np.float32)
        sd[pre + "norm3.bias"] = np.zeros(d, np.float32)
        lin(pre + "ffn.0", d, cfg.ffn_dim)
        lin(pre + "ffn.2", cfg.ffn_dim, d)
        sd[pre + "modulation"] = (
            rng.randn(1, 6, d).astype(np.float32) * 0.02
        )
    lin("head.head", d, pt * ph * pw * cfg.out_channels)
    sd["head.modulation"] = rng.randn(1, 2, d).astype(np.float32) * 0.02
    if i2v:
        img_dim = 64
        sd["img_emb.proj.0.weight"] = np.ones(img_dim, np.float32)
        sd["img_emb.proj.0.bias"] = np.zeros(img_dim, np.float32)
        lin("img_emb.proj.1", img_dim, img_dim)
        lin("img_emb.proj.3", img_dim, d)
        sd["img_emb.proj.4.weight"] = np.ones(d, np.float32)
        sd["img_emb.proj.4.bias"] = np.zeros(d, np.float32)
    return sd


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: jnp.shape(x), t)


def test_wan_remap_structure_and_forward():
    cfg = WanConfig.tiny()
    sd = _synthetic_wan_state_dict(cfg)
    params = remap_state_dict_wan(sd, cfg)

    model = WanModel(cfg)
    b, f, hh, ww = 1, 4, 8, 8
    lat = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, hh, ww, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    t = jnp.asarray([500.0])
    ref_params = jax.jit(model.init)(jax.random.PRNGKey(2), lat, t, text)

    # Exact tree-structure + shape match with a fresh init.
    ref_shapes = _tree_shapes(ref_params)
    got_shapes = _tree_shapes(params)
    assert jax.tree_util.tree_structure(ref_shapes) == (
        jax.tree_util.tree_structure(got_shapes)
    ), "remapped param tree structure differs from model.init"
    mism = [
        p
        for p, (a, b_) in zip(
            jax.tree_util.tree_leaves_with_path(ref_shapes),
            zip(
                jax.tree_util.tree_leaves(ref_shapes),
                jax.tree_util.tree_leaves(got_shapes),
            ),
        )
        if a != b_
    ]
    assert not mism, f"shape mismatches: {mism[:5]}"

    out, _ = model.apply(params, lat, t, text)
    assert out.shape == (b, f, hh, ww, cfg.out_channels)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_wan_remap_patchify_matches_conv3d():
    # The Conv3d(patch, stride=patch) -> Dense flattening must be
    # numerically identical to the torch convolution semantics.
    cfg = WanConfig.tiny()
    sd = _synthetic_wan_state_dict(cfg, seed=3)
    params = remap_state_dict_wan(sd, cfg)
    w = jnp.asarray(sd["patch_embedding.weight"])  # [D, C, pt, ph, pw]
    bconv = jnp.asarray(sd["patch_embedding.bias"])
    pt, ph, pw = cfg.patch_size
    b, f, hh, ww = 1, 4, 8, 8
    lat = jax.random.normal(
        jax.random.PRNGKey(9), (b, f, hh, ww, cfg.in_channels), jnp.float32
    )
    # Direct strided conv (NDHWC x DHWIO).
    conv = jax.lax.conv_general_dilated(
        lat,
        jnp.transpose(w, (2, 3, 4, 1, 0)),  # [pt, ph, pw, C, D]
        window_strides=cfg.patch_size,
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bconv
    conv_tokens = conv.reshape(b, -1, cfg.dim)
    # Model-side: patchify + Dense with the remapped kernel.
    gf, gh, gw = f // pt, hh // ph, ww // pw
    x = lat.reshape(b, gf, pt, gh, ph, gw, pw, cfg.in_channels)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, gf * gh * gw, pt * ph * pw * cfg.in_channels
    )
    dense_tokens = (
        x @ jnp.asarray(params["params"]["patch_embed"]["kernel"])
        + jnp.asarray(params["params"]["patch_embed"]["bias"])
    )
    np.testing.assert_allclose(
        np.asarray(conv_tokens), np.asarray(dense_tokens), atol=1e-5
    )


def _add_decoupled_i2v_keys(sd, cfg, rng):
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}.cross_attn."
        for w in ("k_img", "v_img"):
            sd[pre + w + ".weight"] = (
                rng.randn(cfg.dim, cfg.dim).astype(np.float32) * 0.02
            )
            sd[pre + w + ".bias"] = (
                rng.randn(cfg.dim).astype(np.float32) * 0.02
            )
        sd[pre + "norm_k_img.weight"] = np.ones(cfg.dim, np.float32)


def test_wan_remap_decoupled_i2v_kv():
    """Wan2.1-I2V decoupled image-K/V checkpoints (round 5): the
    ``k_img``/``v_img``/``norm_k_img`` keys load onto the model's
    decoupled branch with exact tree/shape parity, and the branch is
    semantically the SUM of two cross-attentions (zero image K/V =>
    identical output to the text-only path up to the o-projection
    bias double-count, so compare against an explicit two-branch
    reference instead)."""
    import pytest

    rng = np.random.RandomState(11)
    cfg = dataclasses.replace(WanConfig.tiny(), i2v_decoupled=True)
    sd = _synthetic_wan_state_dict(cfg, i2v=True)
    _add_decoupled_i2v_keys(sd, cfg, rng)
    params = remap_state_dict_wan(sd, cfg)

    model = WanModel(cfg)
    b, f, hh, ww = 1, 4, 8, 8
    lat = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, hh, ww, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim)
    ).astype(jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 64)).astype(
        jnp.bfloat16
    )
    t = jnp.asarray([500.0])
    ref_params = jax.jit(
        lambda k: model.init(k, lat, t, text, image_ctx=img)
    )(jax.random.PRNGKey(3))
    assert jax.tree_util.tree_structure(
        _tree_shapes(ref_params)
    ) == jax.tree_util.tree_structure(_tree_shapes(params))
    ca = params["params"]["block_0"]["cross_attn"]
    assert set(ca) >= {"k_img", "v_img", "k_img_norm"}

    out, _ = model.apply(params, lat, t, text, image_ctx=img)
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # Zeroed image V and zero image tokens => the image branch
    # contributes exactly nothing: output must match the same weights
    # run through the concat-free text-only math. Build that reference
    # by zeroing v_img (softmax weights then multiply a zero V).
    p0 = jax.tree_util.tree_map(lambda x: x, params)
    import flax

    flat = flax.traverse_util.flatten_dict(p0["params"])
    for key in list(flat):
        if "v_img" in key and key[-1] == "kernel":
            flat[key] = np.zeros_like(flat[key])
        if "v_img" in key and key[-1] == "bias":
            flat[key] = np.zeros_like(flat[key])
    p0 = {"params": flax.traverse_util.unflatten_dict(flat)}
    out0, _ = model.apply(p0, lat, t, text, image_ctx=img)

    cfg_txt = dataclasses.replace(cfg, i2v_decoupled=False)
    sd_txt = {
        k: v for k, v in sd.items()
        if "k_img" not in k and "v_img" not in k
        and "img_emb" not in k
    }
    params_txt = remap_state_dict_wan(sd_txt, cfg_txt)
    out_txt, _ = WanModel(cfg_txt).apply(params_txt, lat, t, text)
    np.testing.assert_allclose(
        np.asarray(out0, np.float32),
        np.asarray(out_txt, np.float32),
        atol=2e-2, rtol=2e-2,
    )

    # Mismatched config/checkpoint pairs are rejected loudly.
    with pytest.raises(ValueError):
        remap_state_dict_wan(sd, cfg_txt)
    with pytest.raises(ValueError):
        remap_state_dict_wan(sd_txt, cfg)


def test_wan_remap_i2v_img_proj():
    cfg = dataclasses.replace(WanConfig.tiny())
    sd = _synthetic_wan_state_dict(cfg, i2v=True)
    params = remap_state_dict_wan(sd, cfg)
    assert "img_proj" in params["params"]
    model = WanModel(cfg)
    b, f, hh, ww = 1, 4, 8, 8
    lat = jax.random.normal(
        jax.random.PRNGKey(0), (b, f, hh, ww, cfg.in_channels)
    ).astype(jnp.bfloat16)
    text = jnp.zeros((b, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    img = jnp.zeros((b, 4, 64), jnp.bfloat16)
    out, _ = model.apply(params, lat, jnp.asarray([1.0]), text,
                         image_ctx=img)
    assert np.isfinite(np.asarray(out, np.float32)).all()
