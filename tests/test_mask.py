"""Skip-mask state op tests (pure JAX/numpy; no kernels)."""

import jax.numpy as jnp
import numpy as np

from liteattention_tpu.ops import mask as M


def test_init_mask_full():
    st = M.init_mask(2, 3, 500, 500, 128, 128)
    assert st.do_mask.shape == (2, 3, 4, 4)
    assert bool(jnp.all(st.do_mask))
    assert int(st.step) == 0


def test_init_mask_must_skip_conservative_rounding():
    # Skip range [100, 300): only tile 1 ([128,256)) is fully inside.
    st = M.init_mask(1, 1, 512, 512, 128, 128, must_skip_ranges=[(100, 300)])
    row = np.asarray(st.do_mask[0, 0, 0])
    assert row.tolist() == [True, False, True, True]


def test_init_mask_anchor_when_all_skipped():
    st = M.init_mask(1, 1, 512, 512, 128, 128, must_skip_ranges=[(0, 512)])
    row = np.asarray(st.do_mask[0, 0, 0])
    assert row.tolist() == [True, False, False, False]


def test_must_do_mask_liberal_rounding():
    # Must-do [100, 200): overlaps tiles 0 and 1.
    md = np.asarray(M.must_do_mask([(100, 200)], 512, 128))
    assert md.tolist() == [True, True, False, False]


def test_update_mask_monotone_and_must_do():
    st = M.init_mask(1, 1, 256, 512, 128, 128)
    votes = jnp.asarray(
        np.array([[[[1, 0, 1, 0], [0, 1, 1, 0]]]], dtype=np.int32)
    )
    new = M.update_mask(st, votes)
    assert np.asarray(new.do_mask[0, 0]).tolist() == [
        [False, True, False, True],
        [True, False, False, True],
    ]
    # must_do vetoes new skips everywhere.
    new2 = M.update_mask(st, votes, must_do=jnp.ones(4, bool))
    assert bool(jnp.all(new2.do_mask))
    # monotone: once skipped, a keep-vote cannot resurrect.
    new3 = M.update_mask(new, jnp.zeros_like(votes))
    assert bool(jnp.all(new3.do_mask == new.do_mask))
    assert int(new3.step) == 2


def test_compact_mask():
    do = jnp.asarray(
        np.array([[[[False, True, False, True], [True, False, False, False]]]])
    )
    kv_idx, count = M.compact_mask(do)
    assert count[0, 0].tolist() == [2, 1]
    assert kv_idx[0, 0, 0].tolist() == [1, 3, 3, 3]
    assert kv_idx[0, 0, 1].tolist() == [0, 0, 0, 0]


def test_compact_mask_empty_row_anchor():
    do = jnp.zeros((1, 1, 1, 4), bool)
    kv_idx, count = M.compact_mask(do)
    assert int(count[0, 0, 0]) == 1


def test_sparsity():
    do = jnp.asarray(np.array([[[[True, False, False, False]]]]))
    assert abs(float(M.sparsity(do)) - 0.75) < 1e-6


def test_range_list_round_trip():
    rng = np.random.RandomState(0)
    do = rng.rand(2, 2, 3, 7) > 0.5
    rl = M.mask_to_range_list(do)
    back = M.range_list_to_mask(rl, 7)
    assert (back == do).all()
    # Reference format checks: full row is [2, kt-1, 0].
    full = M.mask_to_range_list(np.ones((1, 1, 1, 8), bool))
    assert full[0, 0, 0].tolist() == [2, 7, 0, 0, 0, 0, 0, 0, 0]
