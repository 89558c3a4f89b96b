"""Oracle tests: the Pallas schedule packer vs the XLA pipeline.

``pack_schedule`` must be BIT-identical to
``build_gather_schedule(*compact_mask_gather(mask))`` -- the wire
format feeds the gather kernel's SMEM decode, so any deviation is a
silent schedule corruption (cf. the round-2 qbits/fine-index aliasing
bug class).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.ops.lite_flash_fwd import build_gather_schedule
from liteattention_tpu.ops.mask import compact_mask_gather
from liteattention_tpu.ops.schedule_pack import (
    pack_schedule,
    unpack_schedule,
)


def _oracle(mask, qsubs, gsize, seqlen_k):
    fidx, count, qbits = compact_mask_gather(mask, qsubs)
    packed = build_gather_schedule(
        fidx, count, qbits, gsize=gsize, qsubs=qsubs, seqlen_k=seqlen_k
    )
    return packed, fidx, count, qbits


@pytest.mark.parametrize(
    "b,h,qtf,ktf,qsubs,gsize,density",
    [
        (1, 2, 24, 24, 4, 4, 0.5),
        (2, 3, 20, 20, 5, 8, 0.5),  # qtf not divisible by qsubs path
        (1, 2, 16, 16, 4, 4, 1.0),  # fully live: run+full flags
        (1, 2, 16, 16, 4, 4, 0.02),  # near-empty rows (anchor tails)
        (1, 1, 40, 40, 5, 8, 0.3),
        (1, 2, 12, 12, 1, 2, 0.5),  # qsubs=1
        (1, 2, 18, 18, 3, 1, 0.5),  # gsize=1: every step is a run
        (1, 1, 130, 260, 2, 2, 0.4),  # ktf > 128: multi-row sections
    ],
)
def test_pack_matches_oracle(b, h, qtf, ktf, qsubs, gsize, density):
    key = jax.random.PRNGKey(qtf * 7 + ktf)
    mask = jax.random.uniform(key, (b, h, qtf, ktf)) < density
    for seqlen_k in (ktf * 128, ktf * 128 - 37):
        want, fidx, count, qbits = _oracle(mask, qsubs, gsize, seqlen_k)
        got = pack_schedule(
            mask,
            qsubs=qsubs,
            gsize=gsize,
            seqlen_k=seqlen_k,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        sched_rows = want.shape[3] // 3
        u_fidx, u_count, u_qbits = unpack_schedule(got, ktf, sched_rows)
        np.testing.assert_array_equal(np.asarray(u_fidx), np.asarray(fidx))
        np.testing.assert_array_equal(
            np.asarray(u_count), np.asarray(count)
        )
        np.testing.assert_array_equal(
            np.asarray(u_qbits), np.asarray(qbits)
        )


def test_pack_all_dead_row():
    """A fully-dead row keeps the count>=1 / fidx=0 anchor contract."""
    mask = jnp.zeros((1, 1, 8, 16), bool)
    want, *_ = _oracle(mask, 4, 4, 16 * 128)
    got = pack_schedule(
        mask, qsubs=4, gsize=4, seqlen_k=16 * 128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_banded_runs():
    """Banded masks exercise the contiguous-run fast-path flag."""
    ktf = 32
    pos_q = jnp.arange(ktf)[:, None]
    pos_k = jnp.arange(ktf)[None, :]
    mask = (jnp.abs(pos_q - pos_k) <= 6)[None, None]
    mask = jnp.broadcast_to(mask, (1, 2, ktf, ktf))
    want, *_ = _oracle(mask, 4, 4, ktf * 128)
    got = pack_schedule(
        mask, qsubs=4, gsize=4, seqlen_k=ktf * 128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # sanity: at least one step carries the run flag
    flags = np.asarray(got)[:, :, :, 2 * (got.shape[3] // 3) :, :]
    assert (flags & 1).sum() > 0


def test_subrun_flags_numpy_oracle():
    """Sub-run buddy bits (round 5) vs a direct numpy recomputation --
    independent of BOTH schedule builders (they are cross-checked
    against each other, so a shared flag bug would slip through)."""
    from liteattention_tpu.ops.lite_flash_fwd import _subrun_levels

    key = jax.random.PRNGKey(21)
    b, h, qtf, ktf, qsubs, gsize = 1, 2, 16, 32, 4, 8
    mask = jax.random.uniform(key, (b, h, qtf, ktf)) < 0.4
    seqlen_k = ktf * 128
    packed = np.asarray(
        pack_schedule(
            mask, qsubs=qsubs, gsize=gsize, seqlen_k=seqlen_k,
            interpret=True,
        )
    )
    sched_rows = packed.shape[3] // 3
    fidx, count, _ = unpack_schedule(
        jnp.asarray(packed), ktf, sched_rows
    )
    fidx, count = np.asarray(fidx), np.asarray(count)
    flags_rows = packed[:, :, :, 2 * sched_rows :].reshape(
        b, h, fidx.shape[2], -1
    )
    steps = -(-ktf // gsize)
    flags = flags_rows[..., 1 : 1 + steps]
    levels = _subrun_levels(gsize)
    for bi in range(b):
        for hi in range(h):
            for qi in range(fidx.shape[2]):
                row = fidx[bi, hi, qi]
                for p in range(steps):
                    ent = row[p * gsize : (p + 1) * gsize]
                    if ent.shape[0] < gsize:  # edge-pad like builders
                        ent = np.pad(ent, (0, gsize - ent.shape[0]),
                                     mode="edge")
                    fl = int(flags[bi, hi, qi, p])
                    run = all(
                        ent[i + 1] == ent[i] + 1
                        for i in range(gsize - 1)
                    )
                    assert bool(fl & 1) == run, (p, ent, fl)
                    for base, blk in levels:
                        for gi in range(gsize // blk):
                            g0 = gi * blk
                            sub = all(
                                ent[i + 1] == ent[i] + 1
                                for i in range(g0, g0 + blk - 1)
                            )
                            got = bool((fl >> (base + gi)) & 1)
                            assert got == sub, (p, ent, base, gi, fl)
