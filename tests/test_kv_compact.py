"""Compact-KV gather path (round 5): oracle + bit-exactness tests.

The compact path physically relayouts the union-live KV tiles and emits
the wire schedule in compact positions (ops/kv_compact.py). It must be
BIT-identical to the plain gather path: the map is monotone, so the
schedule's visit order, step grouping, and sub-masking are unchanged --
only the DMA source addresses move.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.kv_compact import compact_kv, kv_union_map
from liteattention_tpu.ops.lite_flash_fwd import (
    build_gather_schedule,
    lite_flash_attention,
    pack_kv,
)
from liteattention_tpu.ops.mask import compact_mask_gather
from liteattention_tpu.ops.schedule_pack import (
    pack_schedule,
    unpack_schedule,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes


def test_kv_union_map_properties():
    key = jax.random.PRNGKey(0)
    b, h, hk, qtf, ktf = 2, 4, 2, 12, 24
    mask = jax.random.uniform(key, (b, h, qtf, ktf)) < 0.4
    kv_map, inv, count = jax.tree.map(
        np.asarray, kv_union_map(mask, hk=hk)
    )
    union = np.asarray(mask).reshape(b, hk, -1, ktf).any(axis=2)
    for bi in range(b):
        for hi in range(hk):
            live = np.flatnonzero(union[bi, hi])
            assert count[bi, hi] == live.size
            # kv_map: dense ascending positions on live, -1 on dead.
            np.testing.assert_array_equal(
                kv_map[bi, hi][live], np.arange(live.size)
            )
            assert (kv_map[bi, hi][~union[bi, hi]] == -1).all()
            # inv inverts kv_map on the live prefix, in-bounds after.
            np.testing.assert_array_equal(inv[bi, hi][: live.size], live)
            assert ((inv[bi, hi] >= 0) & (inv[bi, hi] < ktf)).all()


def test_compact_kv_gathers_tiles():
    key = jax.random.PRNGKey(1)
    b, h, hk, qtf, ktf, d = 1, 2, 2, 8, 8, 128
    mask = jax.random.uniform(key, (b, h, qtf, ktf)) < 0.5
    k = jax.random.normal(key, (b, hk, ktf * 128, d), jnp.float32)
    v = jax.random.normal(key, (b, hk, ktf * 128, d), jnp.float32)
    kvp = pack_kv(k, v)
    _, inv, _ = kv_union_map(mask, hk=hk)
    got = np.asarray(compact_kv(kvp, inv, interpret=True))
    want = np.asarray(kvp).reshape(b, hk, ktf, 128, 2 * d)
    want = np.take_along_axis(
        want, np.asarray(inv)[:, :, :, None, None], axis=2
    ).reshape(b, hk, ktf * 128, 2 * d)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "b,h,hk,qtf,ktf,qsubs,gsize,density",
    [
        (1, 2, 2, 16, 16, 4, 4, 0.5),
        (1, 4, 2, 12, 24, 4, 2, 0.3),  # GQA: union shared per kv head
        (2, 2, 2, 20, 20, 5, 4, 0.15),  # scattered, near-empty rows
        (1, 1, 1, 16, 16, 4, 4, 1.0),  # fully live: identity map
    ],
)
def test_pack_schedule_kv_map_oracle(
    b, h, hk, qtf, ktf, qsubs, gsize, density
):
    """kv_map packing == plain schedule with fidx remapped through the
    map (and flags recomputed on the remapped indices)."""
    key = jax.random.PRNGKey(qtf * 3 + ktf)
    mask = jax.random.uniform(key, (b, h, qtf, ktf)) < density
    seqlen_k = ktf * 128
    kv_map, _, _ = kv_union_map(mask, hk=hk)
    got = pack_schedule(
        mask, qsubs=qsubs, gsize=gsize, seqlen_k=seqlen_k,
        kv_map=kv_map, interpret=True,
    )
    fidx, count, qbits = compact_mask_gather(mask, qsubs)
    group = h // hk
    km_h = jnp.repeat(kv_map, group, axis=1)  # [B, H, Ktf]
    fidx_c = jnp.take_along_axis(
        km_h[:, :, None, :].repeat(fidx.shape[2], axis=2), fidx, axis=-1
    )
    want = build_gather_schedule(
        fidx_c, count, qbits, gsize=gsize, qsubs=qsubs, seqlen_k=seqlen_k
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "h,hk,density",
    [(2, 2, 0.35), (4, 2, 0.35), (2, 2, 0.04)],
)
def test_gather_compact_bit_exact(h, hk, density):
    """Full compact path == plain gather path, bit for bit, votes too."""
    key = jax.random.PRNGKey(7)
    kq, kk, kv, km = jax.random.split(key, 4)
    b, qtf, ktf, d = 1, 8, 8, 128
    qsubs, gsize = 4, 2
    bs = BlockSizes(qsubs * 128, gsize * 128)
    sq, sk = qtf * 128, ktf * 128
    q = jax.random.normal(kq, (b, h, sq, d), jnp.float32)
    k = jax.random.normal(kk, (b, hk, sk, d), jnp.float32)
    v = jax.random.normal(kv, (b, hk, sk, d), jnp.float32)
    mask = jax.random.uniform(km, (b, h, qtf, ktf)) < density
    # Guarantee one live tile per q-row (the engine's anchor invariant).
    mask = mask.at[:, :, :, 0].set(True)
    thr = jnp.float32(-2.0)

    fidx, count, qbits = compact_mask_gather(mask, qsubs)
    out1, lse1, votes1 = lite_flash_attention(
        q, k, v, fidx, count, thr, kv_bits=qbits, block_sizes=bs,
        fine_schedule=True, interpret=True,
    )

    kv_map, inv, _ = kv_union_map(mask, hk=hk)
    kvpc = compact_kv(pack_kv(k, v), inv, interpret=True)
    packed = pack_schedule(
        mask, qsubs=qsubs, gsize=gsize, seqlen_k=sk, kv_map=kv_map,
        interpret=True,
    )
    fidx_c, count_c, qbits_c = unpack_schedule(
        packed, ktf, packed.shape[3] // 3
    )
    out2, lse2, votes2 = lite_flash_attention(
        q, None, None, fidx_c, count_c, thr, kv_bits=qbits_c,
        block_sizes=bs, fine_schedule=True, interpret=True,
        packed_schedule=packed, packed_kv=kvpc, seqlen_k=sk,
        kv_map=kv_map,
    )
    np.testing.assert_array_equal(np.asarray(count_c), np.asarray(count))
    np.testing.assert_array_equal(np.asarray(qbits_c), np.asarray(qbits))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(lse1), np.asarray(lse2))
    np.testing.assert_array_equal(
        np.asarray(votes1), np.asarray(votes2)
    )


def test_wrapper_compact_matches_plain():
    """LiteAttention(kv_compact=True) == (False) across evolving steps."""
    from liteattention_tpu.lite_attention import LiteAttention

    key = jax.random.PRNGKey(3)
    kq, kk, kv, kb = jax.random.split(key, 4)
    b, s, h, d = 1, 2048, 2, 128
    base = jax.random.normal(kb, (b, s, 1, d), jnp.float32)
    q = base + 0.3 * jax.random.normal(kq, (b, s, h, d))
    k = base + 0.3 * jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)

    outs = {}
    for flag in (False, True):
        # Small tiles so the row spans several pipeline steps (a single
        # step can never skip: every tile is first-visit, m_prev=-inf).
        attn = LiteAttention(
            threshold=-2.0, kv_compact=flag,
            block_sizes=BlockSizes(512, 256),
        )
        step_outs = []
        for _ in range(3):
            step_outs.append(np.asarray(attn(q, k, v)))
        outs[flag] = (step_outs, attn.get_skip_percentage())
    assert outs[True][1] == outs[False][1] and outs[True][1] > 0.0
    for a, bb in zip(outs[False][0], outs[True][0]):
        np.testing.assert_array_equal(a, bb)


def test_wrapper_union_sparse_gate_engages():
    """must_skip ranges make the cross-q-tile union sparse, so the
    wrapper's density gate ENGAGES the compact relayout -- outputs must
    still match the kv_compact=False path exactly."""
    from liteattention_tpu.lite_attention import LiteAttention

    key = jax.random.PRNGKey(11)
    kq, kk, kv = jax.random.split(key, 3)
    b, s, h, d = 1, 2048, 2, 128
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    # Pre-skip the back half of the keys: union density 0.5 < 0.75.
    must_skip = [s - 1, s // 2]

    outs = {}
    for flag in (False, True):
        attn = LiteAttention(
            threshold=-10.0, kv_compact=flag,
            block_sizes=BlockSizes(512, 256),
        )
        step_outs = [
            np.asarray(attn(q, k, v, must_skip_list=must_skip))
            for _ in range(2)
        ]
        outs[flag] = (step_outs, attn._kv_maps is not None)
    assert outs[True][1] and not outs[False][1]  # gate engaged
    for a, bb in zip(outs[False][0], outs[True][0]):
        np.testing.assert_array_equal(a, bb)
