"""Module library: MHA/MLP/Block/rotary/norms/losses/padding (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.layers.rotary import apply_rotary_emb, rotary_freqs
from liteattention_tpu.losses.cross_entropy import cross_entropy_loss
from liteattention_tpu.modules.block import Block
from liteattention_tpu.modules.mha import MHA, InferenceParams
from liteattention_tpu.modules.mlp import GatedMlp, Mlp
from liteattention_tpu.ops.norms import (
    dropout_add_norm,
    layer_norm,
    rms_norm,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes
from liteattention_tpu.utils.padding import pad_input, unpad_input

BS = BlockSizes(128, 128)


def test_rotary_matches_manual():
    s, h, d = 8, 2, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (1, s, h, d))
    cos, sin = rotary_freqs(s, d)
    y = apply_rotary_emb(x, cos, sin)
    # Norm preservation + position-0 identity.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(y[0, 0]), np.asarray(x[0, 0]), atol=1e-6
    )
    # Partial rotary passes the tail through.
    y2 = apply_rotary_emb(x, cos[:, : d // 4], sin[:, : d // 4])
    np.testing.assert_allclose(
        np.asarray(y2[..., d // 2 :]), np.asarray(x[..., d // 2 :])
    )


def test_norms():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32)) * 3 + 1
    ln = layer_norm(x)
    np.testing.assert_allclose(
        np.asarray(ln.mean(-1)), 0.0, atol=1e-5
    )
    rn = rms_norm(x, jnp.ones(32))
    ms = np.asarray((rn.astype(jnp.float32) ** 2).mean(-1))
    np.testing.assert_allclose(ms, 1.0, rtol=1e-3)
    out, res = dropout_add_norm(
        x, x, jnp.ones(32), jnp.zeros(32), prenorm=True,
        residual_in_fp32=True,
    )
    np.testing.assert_allclose(np.asarray(res), np.asarray(2 * x), rtol=1e-6)


def test_cross_entropy_matches_optax_style():
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 50))
    labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 50)
    loss = cross_entropy_loss(logits, labels)
    ref = -jnp.mean(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits), labels[:, None], axis=-1
        )
    )
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    # ignore_index masks out.
    labels2 = labels.at[0].set(-100)
    loss2 = cross_entropy_loss(logits, labels2)
    assert not np.isclose(float(loss), float(loss2))


def test_mha_self_and_cross():
    mha = MHA(embed_dim=64, num_heads=2, dtype=jnp.float32, block_sizes=BS,
              causal=True, rotary_emb_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 64))
    params = mha.init(jax.random.PRNGKey(1), x)
    out = mha.apply(params, x)
    assert out.shape == x.shape
    xa = mha.apply(params, x.at[:, -1].set(0.0))
    # causal: first position output unaffected by last-position change
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(xa[:, 0]), atol=1e-5
    )
    cross = MHA(embed_dim=64, num_heads=2, cross_attn=True,
                dtype=jnp.float32, block_sizes=BS)
    kv = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64))
    p2 = cross.init(jax.random.PRNGKey(3), x, kv)
    out2 = cross.apply(p2, x, kv)
    assert out2.shape == x.shape


def test_mha_gqa_kvcache_decode():
    mha = MHA(embed_dim=64, num_heads=4, num_heads_kv=2, causal=True,
              dtype=jnp.float32, block_sizes=BS)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 64))
    params = mha.init(jax.random.PRNGKey(1), x)
    full = mha.apply(params, x)
    # Prefill 8, then decode one-by-one; outputs must match the full pass.
    inf = InferenceParams(max_seqlen=32, max_batch_size=1)
    out_prefill = mha.apply(params, x[:, :14], inference_params=inf)
    inf.seqlen_offset = 14
    np.testing.assert_allclose(
        np.asarray(out_prefill), np.asarray(full[:, :14]), atol=1e-4
    )
    # Two decode steps (interpret mode is slow; two suffice to cover the
    # cache-append + prefix-attend path).
    for i in range(14, 16):
        step = mha.apply(params, x[:, i : i + 1], inference_params=inf)
        inf.seqlen_offset += 1
        np.testing.assert_allclose(
            np.asarray(step[0, 0]), np.asarray(full[0, i]), atol=1e-4
        )


def test_block_prenorm_and_parallel():
    mk_mixer = lambda: MHA(embed_dim=64, num_heads=2, dtype=jnp.float32,
                           block_sizes=BS)
    mk_mlp = lambda: Mlp(128, dtype=jnp.float32)
    blk = Block(dim=64, mixer=mk_mixer, mlp=mk_mlp, dtype=jnp.float32,
                residual_in_fp32=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64))
    params = blk.init(jax.random.PRNGKey(1), x)
    out, res = blk.apply(params, x)
    assert out.shape == x.shape and res.shape == x.shape
    pblk = Block(dim=64, mixer=mk_mixer, mlp=mk_mlp, dtype=jnp.float32,
                 parallel_block=True)
    p2 = pblk.init(jax.random.PRNGKey(2), x)
    out2, _ = pblk.apply(p2, x)
    assert out2.shape == x.shape


def test_gated_mlp():
    m = GatedMlp(96, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64))
    p = m.init(jax.random.PRNGKey(1), x)
    assert m.apply(p, x).shape == x.shape


def test_pad_unpad_roundtrip():
    b, s, d = 2, 10, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d))
    mask = jnp.asarray(
        np.array([[1] * 7 + [0] * 3, [1] * 4 + [0] * 6], np.int32)
    )
    packed, idx, cu, total = unpad_input(x, mask)
    assert int(total) == 11
    assert cu.tolist() == [0, 7, 11]
    back = pad_input(packed[: b * s], idx, b, s)
    np.testing.assert_allclose(
        np.asarray(back * mask[..., None]),
        np.asarray(x * mask[..., None]),
    )


def test_activations():
    from liteattention_tpu.ops.activations import (
        bias_gelu,
        gelu_approx,
        sqrelu_fwd,
        swiglu,
    )

    x = jnp.linspace(-2, 2, 16)
    np.testing.assert_allclose(
        np.asarray(sqrelu_fwd(x)), np.asarray(jax.nn.relu(x) ** 2)
    )
    np.testing.assert_allclose(
        np.asarray(swiglu(x, x)), np.asarray(jax.nn.silu(x) * x)
    )
    np.testing.assert_allclose(
        np.asarray(bias_gelu(x, jnp.ones_like(x))),
        np.asarray(jax.nn.gelu(x + 1, approximate=True)),
    )
    assert gelu_approx(x).shape == x.shape


def test_patch_embed():
    from liteattention_tpu.layers.patch_embed import PatchEmbed

    pe = PatchEmbed(patch_size=(8, 8), embed_dim=32, dtype=jnp.float32)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = pe.init(jax.random.PRNGKey(1), imgs)
    out = pe.apply(params, imgs)
    assert out.shape == (2, 16, 32)


def test_unpad_input_for_concatenated_sequences():
    """Parity with the reference bert_padding helper (packed-SFT rows):
    tokens compact row-major over each row's valid prefix, cu_seqlens
    delimits every concatenated sub-sample, phantom tail segments are
    zero-length."""
    from liteattention_tpu.utils.padding import (
        unpad_input_for_concatenated_sequences,
    )

    b, s, d = 3, 6, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, d), jnp.float32)
    am = jnp.asarray(
        [[2, 3, 0, 0, 0, 0], [3, 2, 0, 0, 0, 0], [6, 0, 0, 0, 0, 0]],
        jnp.int32,
    )
    packed, idx, cu, max_len = unpad_input_for_concatenated_sequences(
        x, am
    )
    # numpy reference of the torch semantics
    lengths = np.asarray(am)
    row_tot = lengths.sum(-1)
    mask2d = np.arange(s)[None] < row_tot[:, None]
    ref_packed = np.asarray(x).reshape(-1, d)[mask2d.reshape(-1)]
    seqlens = lengths.reshape(-1)[lengths.reshape(-1) > 0]
    ref_cu = np.concatenate([[0], np.cumsum(seqlens)]).astype(np.int32)
    n = ref_packed.shape[0]
    np.testing.assert_allclose(np.asarray(packed)[:n], ref_packed)
    assert (np.asarray(packed)[n:] == 0).all()
    ns = len(seqlens)
    np.testing.assert_array_equal(np.asarray(cu)[: ns + 1], ref_cu)
    # phantom tail: constant (zero-length segments)
    assert (np.asarray(cu)[ns:] == ref_cu[-1]).all()
    assert int(max_len) == int(seqlens.max())
    # round trip through pad_input restores the valid positions
    back = pad_input(packed[:n], idx[:n], b, s)
    np.testing.assert_allclose(
        np.asarray(back)[mask2d], np.asarray(x)[mask2d]
    )
