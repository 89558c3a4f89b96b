"""Sub-tile (fine-granularity) vote tests -- the round-2 design.

The mask/votes live at 128x128 fine tiles while the kernel computes at
(block_q, block_k) super-tiles (VERDICT round-1 item 1; reference
granularity: hopper/_internal/cpp/tile_size.h:10-48, vote semantics:
softmax.h:139-222).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.lite_attention import (
    lite_attention_init,
    lite_attention_step,
)
from liteattention_tpu.ops.attention_ref import (
    attention_ref,
    skip_votes_ref_fine,
)
from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
from liteattention_tpu.ops.mask import (
    SkipMaskState,
    compact_mask_fine,
    update_mask,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes


def _qkv(seed, b, h, s, d, correlated=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    if correlated:
        base = jax.random.normal(ks[3], (b, 1, s, d))
        q = base + 0.3 * jax.random.normal(ks[0], (b, h, s, d))
        k = base + 0.3 * jax.random.normal(ks[1], (b, h, s, d))
    else:
        q = jax.random.normal(ks[0], (b, h, s, d))
        k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    return q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)


def _random_fine_mask(seed, b, h, qtf, ktf, keep_prob=0.6):
    rng = np.random.RandomState(seed)
    m = rng.rand(b, h, qtf, ktf) < keep_prob
    m[..., 0] = True  # every fine row keeps >= 1 tile
    return jnp.asarray(m)


def test_compact_mask_fine_bits():
    m = np.zeros((1, 1, 4, 6), bool)
    m[0, 0, 0, 0] = True   # super (0, 0): fine (0, 0)
    m[0, 0, 1, 1] = True   # super (0, 0): fine (1, 1)
    m[0, 0, 2, 5] = True   # super (1, 2): fine (0, 1)
    kv_idx, count, bits = compact_mask_fine(jnp.asarray(m), 2, 2)
    assert kv_idx.shape == (1, 1, 2, 3) and count.shape == (1, 1, 2)
    np.testing.assert_array_equal(np.asarray(count), [[[1, 1]]])
    assert int(kv_idx[0, 0, 0, 0]) == 0
    assert int(kv_idx[0, 0, 1, 0]) == 2
    # bits: qs * ksubs + ks.
    assert int(bits[0, 0, 0, 0]) == (1 << 0) | (1 << 3)  # (0,0)+(1,1)
    assert int(bits[0, 0, 1, 0]) == (1 << 1)             # (0,1)


@pytest.mark.parametrize("bq,bk", [(256, 256), (512, 256)])
def test_fine_output_matches_fine_oracle(bq, bk):
    b, h, s, d = 1, 2, 1024, 64
    q, k, v = _qkv(0, b, h, s, d)
    qtf = ktf = s // 128
    mask = _random_fine_mask(1, b, h, qtf, ktf, keep_prob=0.5)
    kv_idx, count, bits = compact_mask_fine(mask, bq // 128, bk // 128)
    out, lse, votes = lite_flash_attention(
        q, k, v, kv_idx, count, jnp.float32(-10.0), kv_bits=bits,
        block_sizes=BlockSizes(bq, bk),
    )
    ref, ref_lse = attention_ref(
        q, k, v, tile_mask=mask, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=2e-4
    )
    # q-row padding: votes pad to ceil(qtf/qsubs)*qsubs rows; the
    # engine slices back to the mask shape (lite_attention_step).
    qsubs = bq // 128
    qt_pad = -(-qtf // qsubs) * qsubs
    assert votes.shape == (b, h, qt_pad, ktf)


@pytest.mark.parametrize("thr", [-10.0, -3.0, -1.0])
def test_fine_votes_match_oracle(thr):
    b, h, s, d = 1, 2, 1024, 64
    bq = bk = 512
    q, k, v = _qkv(2, b, h, s, d, correlated=True)
    qtf = ktf = s // 128
    mask = _random_fine_mask(3, b, h, qtf, ktf, keep_prob=0.7)
    kv_idx, count, bits = compact_mask_fine(mask, bq // 128, bk // 128)
    _, _, votes = lite_flash_attention(
        q, k, v, kv_idx, count, jnp.float32(thr), kv_bits=bits,
        block_sizes=BlockSizes(bq, bk),
    )
    ref_votes = skip_votes_ref_fine(q, k, mask, thr, bq, bk)
    live = np.asarray(mask)
    np.testing.assert_array_equal(
        np.asarray(votes)[live], ref_votes[live]
    )


def test_fine_gqa_votes_and_output():
    b, hq, hk, s, d = 1, 4, 2, 512, 64
    bq = bk = 256
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hk, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hk, s, d), jnp.float32)
    qtf = ktf = s // 128
    mask = _random_fine_mask(8, b, hq, qtf, ktf)
    kv_idx, count, bits = compact_mask_fine(mask, bq // 128, bk // 128)
    out, lse, votes = lite_flash_attention(
        q, k, v, kv_idx, count, jnp.float32(-3.0), kv_bits=bits,
        block_sizes=BlockSizes(bq, bk),
    )
    kr = jnp.repeat(k, hq // hk, axis=1)
    vr = jnp.repeat(v, hq // hk, axis=1)
    ref, _ = attention_ref(
        q, kr, vr, tile_mask=mask, block_q=128, block_k=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    ref_votes = skip_votes_ref_fine(q, kr, mask, -3.0, bq, bk)
    live = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(votes)[live], ref_votes[live])


def test_fine_threshold_extremes_and_monotonicity():
    # The reference's behavioral invariants (test_lite_attention.py) at
    # fine granularity through the full functional step.
    b, h, s, d = 1, 2, 1024, 64
    q, k, v = _qkv(11, b, h, s, d, correlated=True)
    bs = BlockSizes(512, 512)

    # thr = -inf: nothing ever skipped.
    st = lite_attention_init(b, h, s, s, d, block_sizes=bs)
    assert st.do_mask.shape == (b, h, s // 128, s // 128)
    _, st2 = lite_attention_step(st, q, k, v, -jnp.inf, block_sizes=bs)
    np.testing.assert_array_equal(
        np.asarray(st.do_mask), np.asarray(st2.do_mask)
    )

    # thr = +inf: everything but an anchor skipped after one step; every
    # fine row keeps >= 1 tile.
    st = lite_attention_init(b, h, s, s, d, block_sizes=bs)
    _, st3 = lite_attention_step(st, q, k, v, jnp.inf, block_sizes=bs)
    live_per_row = np.asarray(st3.do_mask).sum(-1)
    # Exactly the per-row anchor survives (reference: write-list length
    # <= 2 at thr=+inf, root test_lite_attention.py:18).
    assert (live_per_row == 1).all()

    # Monotone shrinkage + shape stability over several steps.
    st = lite_attention_init(b, h, s, s, d, block_sizes=bs)
    prev = np.asarray(st.do_mask)
    for i in range(3):
        _, st = lite_attention_step(st, q, k, v, -2.0, block_sizes=bs)
        cur = np.asarray(st.do_mask)
        assert not (cur & ~prev).any(), "mask grew"
        assert cur.reshape(b, h, s // 128, -1).any(-1).all(), "row died"
        prev = cur


def test_fine_sparsity_beats_coarse_at_same_threshold():
    # The whole point of sub-tile votes: at a fixed threshold, the fine
    # mask must find at least as much sparsity as a coarse (512) mask,
    # and strictly more on structured inputs.
    b, h, s, d = 1, 2, 2048, 64
    q, k, v = _qkv(13, b, h, s, d, correlated=True)
    bs = BlockSizes(512, 512)
    thr = -3.0

    st_fine = lite_attention_init(b, h, s, s, d, block_sizes=bs)
    _, st_fine = lite_attention_step(st_fine, q, k, v, thr, block_sizes=bs)
    fine_sparsity = 1.0 - np.asarray(st_fine.do_mask).mean()

    from liteattention_tpu.ops.mask import compact_mask, init_mask

    st_c = init_mask(b, h, s, s, bs.block_q, bs.block_k)
    kv_idx, count = compact_mask(st_c.do_mask)
    _, _, votes = lite_flash_attention(
        q, k, v, kv_idx, count, jnp.float32(thr), block_sizes=bs
    )
    st_c2 = update_mask(st_c, votes)
    coarse_sparsity = 1.0 - np.asarray(st_c2.do_mask).mean()
    # Measured on this workload: fine ~0.215 vs coarse 0.0 (the whole
    # round-2 rationale -- a 512-granular vote rarely fires because ONE
    # hot 128-column stripe inside the tile vetoes all of it).
    assert fine_sparsity >= coarse_sparsity + 0.05
    assert fine_sparsity > 0.1, (
        f"fine sparsity {fine_sparsity:.3f} suspiciously low"
    )


def test_fine_equals_coarse_at_128_blocks():
    # With 128x128 compute tiles the fine and coarse paths are the same
    # machine; outputs and votes must agree exactly.
    b, h, s, d = 1, 2, 512, 64
    q, k, v = _qkv(17, b, h, s, d)
    bs = BlockSizes(128, 128)
    mask = _random_fine_mask(18, b, h, s // 128, s // 128)

    from liteattention_tpu.ops.mask import compact_mask

    kv_idx, count, bits = compact_mask_fine(mask, 1, 1)
    out_f, lse_f, votes_f = lite_flash_attention(
        q, k, v, kv_idx, count, jnp.float32(-3.0), kv_bits=bits,
        block_sizes=bs,
    )
    kv_idx2, count2 = compact_mask(mask)
    out_c, lse_c, votes_c = lite_flash_attention(
        q, k, v, kv_idx2, count2, jnp.float32(-3.0), block_sizes=bs
    )
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_c))
    np.testing.assert_array_equal(np.asarray(lse_f), np.asarray(lse_c))
    live = np.asarray(mask)
    np.testing.assert_array_equal(
        np.asarray(votes_f)[live], np.asarray(votes_c)[live]
    )


@pytest.mark.parametrize(
    "bq,bk",
    [(512, 512), (256, 256), (512, 256), (640, 1024), (128, 512),
     (128, 1024)],  # qsubs=1 = the adaptive union-free geometry
)
def test_gather_output_matches_fine_oracle(bq, bk):
    from liteattention_tpu.ops.mask import compact_mask_gather

    b, h, s, d = 1, 2, 1024, 64
    q, k, v = _qkv(21, b, h, s, d)
    qtf = ktf = s // 128
    mask = _random_fine_mask(22, b, h, qtf, ktf, keep_prob=0.45)
    fidx, count, qbits = compact_mask_gather(mask, bq // 128)
    out, lse, votes = lite_flash_attention(
        q, k, v, fidx, count, jnp.float32(-10.0), kv_bits=qbits,
        block_sizes=BlockSizes(bq, bk), fine_schedule=True,
    )
    ref, ref_lse = attention_ref(
        q, k, v, tile_mask=mask, block_q=128, block_k=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=2e-4
    )
    # q-row padding: votes pad to ceil(qtf/qsubs)*qsubs rows; the
    # engine slices back to the mask shape (lite_attention_step).
    qsubs = bq // 128
    qt_pad = -(-qtf // qsubs) * qsubs
    assert votes.shape == (b, h, qt_pad, ktf)


@pytest.mark.parametrize("hk", [2, 1])  # MHA and GQA
def test_gather_packed_kv_bit_exact(hk):
    # The pre-interleaved K|V hot path (pack_kv + packed_kv=) must be
    # bit-exact vs handing the kernel separate k/v: it is the SAME HBM
    # layout, built by the caller instead of inside the call.
    from liteattention_tpu.ops.lite_flash_fwd import pack_kv
    from liteattention_tpu.ops.mask import compact_mask_gather

    b, h, s, d = 1, 2, 1024, 64
    bq, bk = 512, 512
    q, k, v = _qkv(31, b, h, s, d, correlated=True)
    k, v = k[:, :hk], v[:, :hk]
    qtf = ktf = s // 128
    mask = _random_fine_mask(32, b, h, qtf, ktf, keep_prob=0.5)
    fidx, count, qbits = compact_mask_gather(mask, bq // 128)
    out, lse, votes = lite_flash_attention(
        q, k, v, fidx, count, jnp.float32(-3.0), kv_bits=qbits,
        block_sizes=BlockSizes(bq, bk), fine_schedule=True,
    )
    kvp = pack_kv(k, v)
    out_p, lse_p, votes_p = lite_flash_attention(
        q, None, None, fidx, count, jnp.float32(-3.0), kv_bits=qbits,
        block_sizes=BlockSizes(bq, bk), fine_schedule=True,
        packed_kv=kvp, seqlen_k=s,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_p))
    np.testing.assert_array_equal(np.asarray(lse), np.asarray(lse_p))
    np.testing.assert_array_equal(np.asarray(votes), np.asarray(votes_p))


@pytest.mark.parametrize("thr", [-10.0, -3.0, jnp.inf])
@pytest.mark.parametrize("style", ["dense_random", "sparse_clustered"])
def test_gather_votes_match_oracle(thr, style):
    from liteattention_tpu.ops.attention_ref import skip_votes_ref_gather
    from liteattention_tpu.ops.mask import compact_mask_gather

    b, h, s, d = 1, 2, 1024, 64
    bq, bk = 512, 512
    q, k, v = _qkv(23, b, h, s, d, correlated=True)
    qtf = ktf = s // 128
    if style == "dense_random":
        mask = _random_fine_mask(24, b, h, qtf, ktf, keep_prob=0.7)
    else:
        # Low keep at SCHEDULE granularity (constant over each compute
        # q-tile): the surviving-index list is then a genuine
        # permutation of a sparse subset, which catches any bug in the
        # schedule-order -> fine-index vote mapping (a dense schedule
        # makes fidx ~ the identity and hides such bugs).
        rng = np.random.RandomState(25)
        qsubs = bq // 128
        keep = np.repeat(
            rng.rand(b, h, qtf // qsubs, ktf) < 0.3, qsubs, axis=2
        )
        keep[..., 0] = True
        mask = jnp.asarray(keep)
    fidx, count, qbits = compact_mask_gather(mask, bq // 128)
    _, _, votes = lite_flash_attention(
        q, k, v, fidx, count, jnp.float32(thr), kv_bits=qbits,
        block_sizes=BlockSizes(bq, bk), fine_schedule=True,
    )
    ref_votes = skip_votes_ref_gather(
        q, k, mask, float(thr), bq, bk // 128
    )
    live = np.asarray(mask)
    np.testing.assert_array_equal(
        np.asarray(votes)[live], ref_votes[live]
    )


def test_gather_full_denoising_invariants():
    # Functional-step invariants through the gather path (the round-2
    # default engine): monotone shrinkage, no dead rows, +inf anchor.
    from liteattention_tpu.ops.mask import compact_mask_gather

    b, h, s, d = 1, 2, 1024, 64
    bs = BlockSizes(512, 512)
    q, k, v = _qkv(27, b, h, s, d, correlated=True)
    qtf = ktf = s // 128

    def step(mask, thr):
        fidx, count, qbits = compact_mask_gather(mask, 4)
        out, lse, votes = lite_flash_attention(
            q, k, v, fidx, count, jnp.float32(thr), kv_bits=qbits,
            block_sizes=bs, fine_schedule=True,
        )
        st = update_mask(
            SkipMaskState(mask, jnp.zeros((), jnp.int32)),
            votes[:, :, :qtf, :ktf],
        )
        return out, st.do_mask

    mask = jnp.ones((b, h, qtf, ktf), bool)
    prev = np.asarray(mask)
    for _ in range(3):
        _, mask = step(mask, -2.0)
        cur = np.asarray(mask)
        assert not (cur & ~prev).any()
        assert cur.any(-1).all()
        prev = cur

    mask = jnp.ones((b, h, qtf, ktf), bool)
    _, mask = step(mask, jnp.inf)
    assert (np.asarray(mask).sum(-1) == 1).all()


def test_update_mask_anchor_guard():
    # A row whose every live tile votes skip keeps its first live tile.
    old = jnp.asarray(
        np.array([[[[False, True, False, True]]]]), bool
    )
    votes = jnp.ones((1, 1, 1, 4), jnp.int32)
    st = update_mask(
        SkipMaskState(old, jnp.zeros((), jnp.int32)), votes
    )
    np.testing.assert_array_equal(
        np.asarray(st.do_mask), [[[[False, True, False, False]]]]
    )


def test_gather_wide_k_gsize16_matches_oracle():
    """gsize=16 ((*, 2048) tiles): the 2-deep adaptive ring and the
    16-entry sub-run flag tree (bits 2..15) against the fine oracle."""
    from liteattention_tpu.ops.mask import compact_mask_gather

    b, h, s, d = 1, 1, 4096, 64
    q, k, v = _qkv(31, b, h, s, d)
    qtf = ktf = s // 128
    mask = _random_fine_mask(32, b, h, qtf, ktf, keep_prob=0.45)
    bq, bk = 512, 2048
    fidx, count, qbits = compact_mask_gather(mask, bq // 128)
    out, lse, _ = lite_flash_attention(
        q, k, v, fidx, count, jnp.float32(-10.0), kv_bits=qbits,
        block_sizes=BlockSizes(bq, bk), fine_schedule=True,
    )
    ref, ref_lse = attention_ref(
        q, k, v, tile_mask=mask, block_q=128, block_k=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=2e-4
    )


@pytest.mark.parametrize("hc,hk", [(4, 4), (2, 2)])
def test_hfold_matches_unfolded(hc, hk):
    """Round-5 head folding: the hfold kernel (several heads per grid
    cell, in-kernel head loop) is bit-exact against the unfolded kernel
    on out/lse/votes, including GQA and the packed-KV/packed-schedule
    hot path."""
    from liteattention_tpu.ops.lite_flash_fwd import pack_kv
    from liteattention_tpu.ops.mask import compact_mask_gather
    from liteattention_tpu.ops.schedule_pack import (
        pack_schedule,
        unpack_schedule,
    )

    b, h, s, d = 1, 4, 2048, 64
    q, _, _ = _qkv(41, b, h, s, d)
    _, k, v = _qkv(42, b, hk, s, d)
    qtf = ktf = s // 128
    mask = _random_fine_mask(43, b, h, qtf, ktf, keep_prob=0.55)
    bs = BlockSizes(512, 1024)
    kvp = pack_kv(k, v)
    packed = pack_schedule(mask, qsubs=4, gsize=8, seqlen_k=s)
    fidx, count, qbits = unpack_schedule(
        packed, ktf, packed.shape[3] // 3
    )
    thr = jnp.float32(-2.0)
    kw = dict(
        kv_bits=qbits, block_sizes=bs, fine_schedule=True,
        packed_schedule=packed, packed_kv=kvp, seqlen_k=s,
    )
    o1, l1, v1 = lite_flash_attention(
        q, None, None, fidx, count, thr, **kw
    )
    o2, l2, v2 = lite_flash_attention(
        q, None, None, fidx, count, thr, fold_h=hc, **kw
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
