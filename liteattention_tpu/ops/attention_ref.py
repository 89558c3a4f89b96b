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


__all__ = ["attention_ref", "skip_votes_ref", "DEFAULT_MASK_VALUE"]
