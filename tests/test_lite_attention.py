"""LiteAttention engine behavioral tests.

Pytest port of the reference's root behavioral script
(test_lite_attention.py:1-93) -- the threshold-extreme invariants, the
must-do veto, and the LSE check -- plus the 50-step denoising-scan
invariants the reference lacks (SURVEY.md section 4 "implication").
Shapes are scaled down for the CPU interpreter; the invariants are
hardware-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu import (
    LiteAttention,
    lite_attention_init,
    lite_attention_step,
)
from liteattention_tpu.ops.mask import sparsity
from liteattention_tpu.ops.tile_sizes import BlockSizes

BS = BlockSizes(128, 128)
B, S, H, D = 1, 512, 2, 64


def _bshd(seed):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, S, H, D), jnp.float32)
    k = jax.random.normal(k2, (B, S, H, D), jnp.float32)
    v = jax.random.normal(k3, (B, S, H, D), jnp.float32)
    return q, k, v


def test_skip_all():
    """thr=+inf => after one call only the anchor tile survives per row
    (reference test: write-list length <= 2, test_lite_attention.py:18)."""
    q, k, v = _bshd(0)
    attn = LiteAttention(block_sizes=BS)
    attn.threshold = float("inf")
    attn(q, k, v)
    do = np.asarray(attn.state.do_mask)
    assert (do.sum(axis=-1) == 1).all()
    assert do[..., 0].all()


def test_must_do_blocks_all_skips():
    """thr=+inf + full-range must-do => mask unchanged
    (reference test_lite_attention.py:27-43)."""
    q, k, v = _bshd(1)
    attn = LiteAttention(block_sizes=BS)
    attn.threshold = float("inf")
    attn(q, k, v, must_do_list=[S - 1, 0])
    assert bool(jnp.all(attn.state.do_mask))


def test_skip_nothing():
    """thr=-inf => mask unchanged (reference test_lite_attention.py:45-54)."""
    q, k, v = _bshd(2)
    attn = LiteAttention(block_sizes=BS)
    attn.threshold = float("-inf")
    attn(q, k, v)
    assert bool(jnp.all(attn.state.do_mask))


def test_lse_against_logsumexp():
    """LSE vs dense logsumexp within 0.1 (reference
    test_lite_attention.py:56-92 uses the same tolerance)."""
    q, k, v = _bshd(3)
    attn = LiteAttention(threshold=-10.0, block_sizes=BS)
    out, lse = attn(q, k, v, return_softmax_lse=True)
    scale = 1.0 / (D**0.5)
    qt = jnp.transpose(q, (0, 2, 1, 3)).astype(jnp.float32)
    kt = jnp.transpose(k, (0, 2, 1, 3)).astype(jnp.float32)
    scores = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", qt, kt, precision=jax.lax.Precision.HIGHEST
        )
        * scale
    )
    lse_ref = jax.scipy.special.logsumexp(scores, axis=-1)
    assert float(jnp.abs(lse - lse_ref).max()) < 0.1


def test_disable_skipping_runs_dense():
    """Disabled => clean dense path, state untouched (fixes the reference
    crash documented in SURVEY.md section 2.1)."""
    q, k, v = _bshd(4)
    attn = LiteAttention(enable_skipping=False, block_sizes=BS)
    out = attn(q, k, v)
    assert out.shape == q.shape
    assert attn.state is None
    attn2 = LiteAttention(block_sizes=BS)
    attn2.enable_skip_optimization(False)
    out2 = attn2(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), atol=1e-6
    )


def test_threshold_validation():
    with pytest.raises(ValueError):
        LiteAttention(threshold=1.0, block_sizes=BS)
    attn = LiteAttention(block_sizes=BS)
    with pytest.raises(ValueError):
        attn.set_threshold(0.0)
    attn.set_threshold(-3.0)
    assert attn.threshold == -3.0


def test_reinit_on_shape_change_and_reset():
    q, k, v = _bshd(5)
    attn = LiteAttention(threshold=-1.0, block_sizes=BS)
    attn(q, k, v)
    first = attn.state
    attn(q[:, :256], k[:, :256], v[:, :256])  # shape change => reinit
    assert attn.state.shape != first.shape
    attn.reset_skip_state()
    assert attn.state is None
    assert attn.get_skip_percentage() == 0.0


def test_skip_percentage_telemetry():
    q, k, v = _bshd(6)
    attn = LiteAttention(block_sizes=BS)
    attn.threshold = float("inf")
    attn(q, k, v)
    assert attn.get_skip_percentage() == 0.0  # first call reads full mask
    attn(q, k, v)
    assert attn.get_skip_percentage() == pytest.approx(0.75)


def test_denoising_scan_functional():
    """Config-3 shape: mask state as a jitted multi-step carry with a
    per-step threshold schedule; monotone shrinkage + sparsity growth."""
    q, k, v = _bshd(7)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    state = lite_attention_init(B, H, S, S, D, 4, block_sizes=BS)
    thresholds = jnp.linspace(-8.0, -0.5, 8)

    prev_sparsity = -1.0
    st = state
    for t in range(8):
        out, st_new = lite_attention_step(
            st, qt, kt, vt, threshold=thresholds[t], block_sizes=BS
        )
        assert bool(jnp.all(st_new.do_mask <= st.do_mask))
        st = st_new
        sp = float(sparsity(st.do_mask))
        assert sp >= prev_sparsity - 1e-6
        prev_sparsity = sp
    assert int(st.step) == 8
    # With an aggressive final threshold some sparsity must appear on
    # random inputs.
    assert prev_sparsity >= 0.0


def test_must_skip_list_at_init():
    """must_skip_list pre-carves holes at (re)initialization (reference
    init_skip_list, lite_attention.py:126-145) without mutating input."""
    q, k, v = _bshd(8)
    attn = LiteAttention(threshold=-10.0, block_sizes=BS)
    ranges = [255, 128]  # inclusive pair, reference order (hi, lo)
    ranges_copy = list(ranges)
    attn(q, k, v, must_skip_list=ranges)
    assert ranges == ranges_copy, "input list must not be mutated"
    do = np.asarray(attn.state.do_mask)
    # Tile 1 ([128, 256)) is fully inside the skip range -> carved out.
    assert not do[..., 1].any()
    assert do[..., 0].all() and do[..., 2].all()


def test_seq_parallel_wrapper_per_split_state():
    """Legacy per-split wrapper: independent skip state per KV split
    (reference hopper/lite_attention.py:322-345)."""
    from liteattention_tpu import SeqParallelLiteAttention

    q, k, v = _bshd(9)
    sp = SeqParallelLiteAttention(num_nodes=2, threshold=-10.0)
    sp.set_threshold(float("inf"))
    half = S // 2
    for i in range(2):
        out = sp(q, k[:, i * half : (i + 1) * half],
                 v[:, i * half : (i + 1) * half], i)
        assert out.shape == q.shape
    states = [la.state for la in sp.lite_attention]
    assert all(st is not None for st in states)
    # Each split evolved its own mask to anchor-only.
    for st in states:
        do = np.asarray(st.do_mask)
        assert (do.sum(-1) == 1).all()
    sp.reset_skip_state()
    assert all(la.state is None for la in sp.lite_attention)
    sp.enable_skip_optimization(False)
    assert all(not la.enable_skipping for la in sp.lite_attention)


def test_adaptive_geometry_picks_union_free_tile():
    """adaptive_geometry: scattered (q-incoherent) masks switch the
    engine to the (128, block_k) union-free tile; q-coherent masks keep
    the default. Output stays oracle-exact either way."""
    import numpy as np

    from liteattention_tpu.lite_attention import LiteAttention
    from liteattention_tpu.ops.tile_sizes import BlockSizes

    b, s, h, d = 1, 1024, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(31), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)

    ktf = s // 128
    rng = np.random.RandomState(32)
    scattered = rng.rand(b, h, ktf, ktf) > 0.6
    scattered[..., 0] = True
    coherent = np.repeat(
        rng.rand(b, h, 1, ktf) > 0.6, ktf, axis=2
    )
    coherent[..., 0] = True

    for mask_np, expect_fine in [(scattered, True), (coherent, False)]:
        attn = LiteAttention(
            threshold=-10.0,
            block_sizes=BlockSizes(512, 512),
            adaptive_geometry=True,
            max_batch_size=b,
        )
        # Seed the engine state with the prepared mask.
        out0 = attn(q, k, v)
        attn._state = attn._state._replace(
            do_mask=jnp.asarray(mask_np)
        )
        attn._sched_cache = None
        out = attn(q, k, v)
        assert (attn._geom_bs.block_q == 128) == expect_fine, (
            attn._geom_bs, expect_fine,
        )
        from liteattention_tpu.ops.attention_ref import attention_ref

        ref, _ = attention_ref(
            jnp.transpose(q, (0, 2, 1, 3)),
            jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)),
            tile_mask=jnp.asarray(mask_np),
            block_q=128,
            block_k=128,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(out, (0, 2, 1, 3))),
            np.asarray(ref),
            atol=2e-4,
        )
