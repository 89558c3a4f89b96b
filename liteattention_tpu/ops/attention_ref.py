"""Pure-JAX reference attention (the test oracle).

TPU-native counterpart of the reference's fp32 oracle
``attention_ref`` (reference: hopper/tests/test_util.py:226-330) and of the
LSE check in the root behavioral test (reference: test_lite_attention.py:66-91).

Everything here is deliberately naive: full (Sq, Sk) score matrices in
fp32. It exists only to validate the Pallas kernels; never use it on real
sequence lengths.

Layout convention: the engine-internal layout is ``[B, H, S, D]`` (TPU
kernels want the two minor dims to be (seq, head_dim)); the public
flash_attn-parity API layer converts from the reference's ``[B, S, H, D]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def attention_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    causal: bool = False,
    tile_mask: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    bias: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dense (optionally tile-masked) attention in fp32.

    Args:
      q, k, v: [B, H, S, D] arrays (any float dtype; math is fp32).
      scale: softmax scale; default 1/sqrt(D).
      causal: apply a causal mask.
      tile_mask: optional bool[B, H, Qt, Kt] skip-mask; when given,
        ``block_q``/``block_k`` define the tile geometry and masked tiles
        contribute nothing -- the oracle for the sparse kernel (config 2 of
        BASELINE.json).
      bias: optional additive attention bias [B, H, Sq, Sk].

    Returns:
      (out [B, H, Sq, D] in q.dtype, lse [B, H, Sq] fp32 natural-log).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    hi = jax.lax.Precision.HIGHEST
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf, precision=hi) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    sq, sk = s.shape[-2], s.shape[-1]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
    if tile_mask is not None:
        assert block_q is not None and block_k is not None
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0) // block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1) // block_k
        elem = tile_mask[:, :, rows, cols]
        s = jnp.where(elem, s, DEFAULT_MASK_VALUE)
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vf, precision=hi)
    return out.astype(q.dtype), lse


def skip_votes_ref(
    q: jax.Array,
    k: jax.Array,
    do_mask: jax.Array,
    threshold: float,
    block_q: int,
    block_k: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """Oracle for the QK-Skip vote (the kernel's skip-detection output).

    Reproduces ``Softmax::max_get_scale_detect_qk_skip`` (reference:
    hopper/_internal/cpp/softmax.h:139-222) with the engine's visit order
    (increasing k-tile index over surviving tiles):

    For each (b, h, q-tile) row, walking surviving k-tiles in increasing
    order with running per-q-row max ``m``:
      * the first visited tile votes 0 (never skippable, softmax.h:153);
      * tile t votes 1 iff for **every** q row in the tile,
        ``(local_max - m_prev) * scale * log2(e) <= threshold``
        (softmax.h:194, the AND over warps at mainloop:1721-1725).

    Returns int32[B, H, Qt, Kt]; positions outside ``do_mask`` are 1
    (they stay skipped under the monotone update).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    log2e = 1.4426950408889634
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qt, kt = do_mask.shape[-2], do_mask.shape[-1]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    # Per-(q-row, k-tile) local max.
    pad_k = kt * block_k - sk
    s = jnp.pad(s, ((0, 0), (0, 0), (0, qt * block_q - sq), (0, pad_k)),
                constant_values=-jnp.inf)
    s_tiles = s.reshape(b, h, qt, block_q, kt, block_k)
    local_max = s_tiles.max(axis=-1)  # [B,H,Qt,block_q,Kt]

    def row_scan(lm_row, do_row):
        # lm_row: [block_q, Kt] local maxes; do_row: [Kt] bool.
        def body(carry, t):
            m_prev, visited = carry
            lm = lm_row[:, t]
            do = do_row[t]
            is_first = jnp.logical_and(do, jnp.logical_not(visited))
            do_qk = (lm - m_prev) * log2e > threshold
            vote_t = jnp.where(
                do,
                jnp.where(is_first, False, jnp.logical_not(jnp.any(do_qk))),
                True,
            )
            m_next = jnp.where(do, jnp.maximum(m_prev, lm), m_prev)
            return (m_next, jnp.logical_or(visited, do)), vote_t

        init = (jnp.full((block_q,), -jnp.inf, jnp.float32), jnp.array(False))
        _, votes = jax.lax.scan(body, init, jnp.arange(kt))
        return votes

    flat_lm = local_max.transpose(0, 1, 2, 4, 3).reshape(-1, kt, block_q)
    flat_lm = flat_lm.transpose(0, 2, 1)  # [N, block_q, Kt]
    flat_do = do_mask.reshape(-1, kt)
    votes = jax.vmap(row_scan)(flat_lm, flat_do)
    return votes.reshape(b, h, qt, kt).astype(jnp.int32)


def skip_votes_ref_fine(
    q,
    k,
    do_mask,
    threshold: float,
    block_q: int,
    block_k: int,
    scale: Optional[float] = None,
    vote_tile: int = 128,
):
    """Oracle for SUB-TILE (fine-granularity) QK-Skip votes (round 2).

    The kernel computes at (block_q, block_k) super-tiles but the mask
    and votes live at ``vote_tile`` (128) granularity
    (:func:`liteattention_tpu.ops.lite_flash_fwd.lite_flash_attention`
    with ``kv_bits``). Semantics mirrored here, per (b, h, q-row):

    * super-tiles are visited in increasing index order iff ANY covered
      fine tile is live;
    * within a visited super-tile, each fine tile (qs, ks) gets the
      criterion ``(local_max_fine - m_prev) * log2(e) > thr`` ANDed over
      the 128-row group (dead fine tiles are masked out of local maxes);
    * on the FIRST visited super-tile, the first LIVE fine tile of each
      row group is forced to vote 0 (the anchor; softmax.h:153);
    * the running max then absorbs the whole (masked) super-tile.

    Pure numpy (test-only). Returns int32[B, H, Qtf, Ktf]. Votes at DEAD
    fine positions are unspecified (the monotone mask update neutralizes
    them); compare live positions only.
    """
    import numpy as np

    q = np.asarray(q, np.float32)
    k = np.asarray(k, np.float32)
    do_mask = np.asarray(do_mask, bool)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    log2e = 1.4426950408889634
    qsubs, ksubs = block_q // vote_tile, block_k // vote_tile
    _, _, qtf, ktf = do_mask.shape
    qt, kt = -(-qtf // qsubs), -(-ktf // ksubs)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = np.pad(
        s,
        ((0, 0), (0, 0), (0, qt * block_q - sq), (0, kt * block_k - sk)),
        constant_values=-np.inf,
    )
    fine = np.zeros((b, h, qt * qsubs, kt * ksubs), bool)
    fine[:, :, :qtf, :ktf] = do_mask
    live_elem = np.repeat(np.repeat(fine, vote_tile, 2), vote_tile, 3)
    s = np.where(live_elem, s, -np.inf)
    lm = s.reshape(b, h, qt * block_q, kt * ksubs, vote_tile).max(-1)
    votes = np.ones((b, h, qt * qsubs, kt * ksubs), np.int32)
    superlive = fine.reshape(b, h, qt, qsubs, kt, ksubs).any(axis=(3, 5))
    row_ok = np.arange(block_q)
    with np.errstate(invalid="ignore"):
        for bi in range(b):
            for hi in range(h):
                for qi in range(qt):
                    visit = np.nonzero(superlive[bi, hi, qi])[0]
                    rows = slice(qi * block_q, (qi + 1) * block_q)
                    m = np.full((block_q,), -np.inf, np.float32)
                    valid_r = (row_ok + qi * block_q) < sq
                    for j, t in enumerate(visit):
                        lmt = lm[bi, hi, rows, t * ksubs : (t + 1) * ksubs]
                        diff = (lmt - m[:, None]) * log2e
                        do = np.where(np.isnan(diff), False, diff > threshold)
                        do &= valid_r[:, None]
                        for qs in range(qsubs):
                            seg = do[qs * vote_tile : (qs + 1) * vote_tile]
                            live_row = fine[
                                bi, hi, qi * qsubs + qs,
                                t * ksubs : (t + 1) * ksubs,
                            ]
                            first_ks = (
                                int(np.argmax(live_row))
                                if live_row.any()
                                else -1
                            )
                            for ks in range(ksubs):
                                anchor = j == 0 and ks == first_ks
                                vote = (
                                    0 if anchor
                                    else int(not seg[:, ks].any())
                                )
                                votes[
                                    bi, hi, qi * qsubs + qs,
                                    t * ksubs + ks,
                                ] = vote
                        m = np.maximum(m, lmt.max(-1))
    return votes[:, :, :qtf, :ktf]


def skip_votes_ref_gather(
    q,
    k,
    do_mask,
    threshold: float,
    block_q: int,
    gsize: int,
    scale: Optional[float] = None,
    vote_tile: int = 128,
):
    """Oracle for GATHER-schedule votes (compact_mask_gather +
    lite_flash_attention(fine_schedule=True)).

    Per (b, h, compute-q-row): surviving fine k-tiles (union over the
    row's ``qsubs`` fine rows) are visited in increasing order in groups
    of ``gsize``; every entry in a group is tested against the running
    max from BEFORE the group; the globally-first entry votes 0; the
    running max then absorbs the group's masked maxes.

    Pure numpy (test-only). Votes at dead fine positions unspecified.
    """
    import numpy as np

    q = np.asarray(q, np.float32)
    k = np.asarray(k, np.float32)
    do_mask = np.asarray(do_mask, bool)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    log2e = 1.4426950408889634
    qsubs = block_q // vote_tile
    _, _, qtf, ktf = do_mask.shape
    qt = -(-qtf // qsubs)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = np.pad(
        s,
        ((0, 0), (0, 0), (0, qt * block_q - sq),
         (0, ktf * vote_tile - sk)),
        constant_values=-np.inf,
    )
    fine = np.zeros((b, h, qt * qsubs, ktf), bool)
    fine[:, :, :qtf, :] = do_mask
    live_elem = np.repeat(np.repeat(fine, vote_tile, 2), vote_tile, 3)
    s = np.where(live_elem, s, -np.inf)
    lm = s.reshape(b, h, qt * block_q, ktf, vote_tile).max(-1)
    votes = np.ones((b, h, qt * qsubs, ktf), np.int32)
    union = fine.reshape(b, h, qt, qsubs, ktf).any(axis=3)
    row_ok = np.arange(block_q)
    with np.errstate(invalid="ignore"):
        for bi in range(b):
            for hi in range(h):
                for qi in range(qt):
                    visit = np.nonzero(union[bi, hi, qi])[0]
                    rows = slice(qi * block_q, (qi + 1) * block_q)
                    m = np.full((block_q,), -np.inf, np.float32)
                    valid_r = (row_ok + qi * block_q) < sq
                    for j0 in range(0, len(visit), gsize):
                        chunk = visit[j0 : j0 + gsize]
                        lmt = lm[bi, hi, rows][:, chunk]
                        diff = (lmt - m[:, None]) * log2e
                        do = np.where(
                            np.isnan(diff), False, diff > threshold
                        )
                        do &= valid_r[:, None]
                        for e, t in enumerate(chunk):
                            for qs in range(qsubs):
                                seg = do[
                                    qs * vote_tile : (qs + 1) * vote_tile,
                                    e,
                                ]
                                anchor = j0 == 0 and e == 0
                                votes[bi, hi, qi * qsubs + qs, t] = (
                                    0 if anchor else int(not seg.any())
                                )
                        m = np.maximum(m, lmt.max(-1))
    return votes[:, :, :qtf, :]


__all__ = [
    "attention_ref",
    "skip_votes_ref",
    "skip_votes_ref_fine",
    "skip_votes_ref_gather",
    "DEFAULT_MASK_VALUE",
]
