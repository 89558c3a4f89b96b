"""Flash-attention backward kernels (Pallas/TPU) + custom_vjp wiring.

TPU-native counterpart of the reference's FA3 backward stack
(reference hopper/_internal/cpp/flash_bwd_*.h/.hpp, ~2.8k LoC CUDA; the
shipped LiteAttention build disables it, hopper/setup.py:47-68 -- it
exists for the inherited training stack). Standard two-kernel FA2-style
backward:

* ``delta = rowsum(dO * O)`` precomputed in one fused XLA pass (the
  reference's ``flash_bwd_preprocess``);
* a dQ kernel iterating k-tiles per q-tile;
* a dK/dV kernel iterating q-tiles per k-tile (GQA: gradients of a KV
  head accumulate across its q-head group in VMEM scratch).

Residuals are (q, k, v, o, lse) -- the scores matrix is never
materialized. The LSE/delta vectors are laid out ``[B, Qt, block_q, H]``
so their blocks satisfy the TPU (8, 128) tiling rule; the kernel
extracts its head's column with a lane-mask reduction.

The sparse (lite) path is inference-only, like the reference's shipped
engine; only the dense kernel is differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from liteattention_tpu.ops.flash_fwd import dropout_keep_mask
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _head_col(blk, h, num_heads):
    """Extract column ``h`` from a (rows, H) block -> (rows, 1) fp32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    return jnp.sum(
        jnp.where(lane == h, blk.astype(jnp.float32), 0.0),
        axis=1,
        keepdims=True,
    )


def _dq_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    *rest,
    scale: float,
    kt: int,
    num_heads: int,
    block_q: int,
    block_k: int,
    seqlen_k: int,
    causal: bool,
    causal_offset: int,
    precision,
    has_segments: bool = False,
    has_bound: bool = False,
    bound_causal: bool = False,
    bound_offset: int = 0,
    has_low: bool = False,
    window=None,
    softcap: float = 0.0,
    has_alibi: bool = False,
    dropout_p: float = 0.0,
):
    rest = list(rest)
    qseg_ref = rest.pop(0) if has_segments else None
    kseg_ref = rest.pop(0) if has_segments else None
    bound_ref = rest.pop(0) if has_bound else None
    low_ref = rest.pop(0) if has_low else None
    alibi_ref = rest.pop(0) if has_alibi else None
    dseed_ref = rest.pop(0) if dropout_p > 0.0 else None
    dq_ref, dq_acc = rest
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    h = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = _head_col(lse_ref[0, 0], h, num_heads)  # (bq, 1)
        delta = _head_col(delta_ref[0, 0], h, num_heads)
        raw = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        # Log2-space scores (matches the forward; see flash_fwd.py).
        if softcap > 0.0:
            s_nat = softcap * jnp.tanh(raw * scale / softcap)
            # Derivative of the cap, captured BEFORE masking writes large
            # sentinels: d(cap*tanh(x/cap))/dx = 1 - (s/cap)^2.
            cap_factor = 1.0 - (s_nat / softcap) ** 2
            s = s_nat * LOG2E
        else:
            s = raw * (scale * LOG2E)
        if has_alibi:
            row_sl = alibi_ref[0]  # (1, hp)
            slope = jnp.sum(
                jnp.where(
                    jax.lax.broadcasted_iota(
                        jnp.int32, row_sl.shape, 1
                    )
                    == h,
                    row_sl,
                    0.0,
                )
            )
            arow = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            acol = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + ki * block_k
            )
            # Bottom-right-aligned rel pos (matches _fwd_kernel):
            # rel = row + causal_offset - col.
            rel = arow + causal_offset - acol
            dist = (rel if causal else jnp.abs(rel)).astype(jnp.float32)
            s = s - slope * LOG2E * dist
        if (
            causal
            or seqlen_k % block_k != 0
            or has_segments
            or has_bound
            or has_low
            or window is not None
        ):
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + ki * block_k
            )
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            valid = col < seqlen_k
            if causal:
                valid = jnp.logical_and(valid, col <= row + causal_offset)
            if has_segments:
                qs = jnp.transpose(qseg_ref[...])
                ks = kseg_ref[...]
                valid = jnp.logical_and(valid, qs == ks)
            if has_bound:
                # kv_bound = per-batch TOTAL valid key length;
                # bound_offset = static seqlen_q (matches _fwd_kernel).
                bound = bound_ref[0, 0, 0]
                if bound_causal:
                    valid = jnp.logical_and(
                        valid, col < bound - bound_offset + row + 1
                    )
                else:
                    valid = jnp.logical_and(valid, col < bound)
            if has_low:
                valid = jnp.logical_and(valid, col >= low_ref[0, 0, 0])
            if window is not None:
                left, right = window
                if has_bound:
                    pos = row + (bound_ref[0, 0, 0] - bound_offset)
                else:
                    pos = row + causal_offset
                if left >= 0:
                    valid = jnp.logical_and(valid, col >= pos - left)
                if right >= 0:
                    valid = jnp.logical_and(valid, col <= pos + right)
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
        lse2 = lse * LOG2E
        p = jnp.where(
            jnp.isfinite(lse2), jnp.exp2(s - lse2), 0.0
        )
        dp = jax.lax.dot_general(
            do,
            v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if dropout_p > 0.0:
            # dP~ = D o (dO V^T) with D = keep/(1-p); the keep mask is
            # regenerated from the global position counter so it matches
            # the forward at any tile geometry (dropout_keep_mask).
            keep = dropout_keep_mask(
                dseed_ref[0, 0, 0],
                bi * num_heads + h,
                qi * block_q,
                ki * block_k,
                (block_q, block_k),
                dropout_p,
            )
            dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_p)), 0.0)
        ds = p * (dp - delta)
        if softcap > 0.0:
            ds = ds * cap_factor
        ds = ds * scale
        dq_acc[...] += jax.lax.dot(
            ds.astype(k.dtype),
            k,
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    @pl.when(ki == kt - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    *rest,
    scale: float,
    qt: int,
    group: int,
    num_heads: int,
    block_q: int,
    block_k: int,
    seqlen_k: int,
    causal: bool,
    causal_offset: int,
    precision,
    has_segments: bool = False,
    has_bound: bool = False,
    bound_causal: bool = False,
    bound_offset: int = 0,
    has_low: bool = False,
    window=None,
    softcap: float = 0.0,
    has_alibi: bool = False,
    dropout_p: float = 0.0,
):
    rest = list(rest)
    qseg_ref = rest.pop(0) if has_segments else None
    kseg_ref = rest.pop(0) if has_segments else None
    bound_ref = rest.pop(0) if has_bound else None
    low_ref = rest.pop(0) if has_low else None
    alibi_ref = rest.pop(0) if has_alibi else None
    dseed_ref = rest.pop(0) if dropout_p > 0.0 else None
    dk_ref, dv_ref, dk_acc, dv_acc = rest
    bi = pl.program_id(0)
    ki = pl.program_id(1)
    h = pl.program_id(2)
    qi = pl.program_id(3)

    # One (kv-head, k-tile) owns a contiguous run of group * qt steps.
    @pl.when(jnp.logical_and(h % group == 0, qi == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = _head_col(lse_ref[0, 0], h, num_heads)
        delta = _head_col(delta_ref[0, 0], h, num_heads)
        raw = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        # Log2-space scores (matches the forward; see flash_fwd.py).
        if softcap > 0.0:
            s_nat = softcap * jnp.tanh(raw * scale / softcap)
            # Derivative of the cap, captured BEFORE masking writes large
            # sentinels: d(cap*tanh(x/cap))/dx = 1 - (s/cap)^2.
            cap_factor = 1.0 - (s_nat / softcap) ** 2
            s = s_nat * LOG2E
        else:
            s = raw * (scale * LOG2E)
        if has_alibi:
            row_sl = alibi_ref[0]  # (1, hp)
            slope = jnp.sum(
                jnp.where(
                    jax.lax.broadcasted_iota(
                        jnp.int32, row_sl.shape, 1
                    )
                    == h,
                    row_sl,
                    0.0,
                )
            )
            arow = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            acol = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + ki * block_k
            )
            # Bottom-right-aligned rel pos (matches _fwd_kernel):
            # rel = row + causal_offset - col.
            rel = arow + causal_offset - acol
            dist = (rel if causal else jnp.abs(rel)).astype(jnp.float32)
            s = s - slope * LOG2E * dist
        if (
            causal
            or seqlen_k % block_k != 0
            or has_segments
            or has_bound
            or has_low
            or window is not None
        ):
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + ki * block_k
            )
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            valid = col < seqlen_k
            if causal:
                valid = jnp.logical_and(valid, col <= row + causal_offset)
            if has_segments:
                qs = jnp.transpose(qseg_ref[...])
                ks = kseg_ref[...]
                valid = jnp.logical_and(valid, qs == ks)
            if has_bound:
                # kv_bound = per-batch TOTAL valid key length;
                # bound_offset = static seqlen_q (matches _fwd_kernel).
                bound = bound_ref[0, 0, 0]
                if bound_causal:
                    valid = jnp.logical_and(
                        valid, col < bound - bound_offset + row + 1
                    )
                else:
                    valid = jnp.logical_and(valid, col < bound)
            if has_low:
                valid = jnp.logical_and(valid, col >= low_ref[0, 0, 0])
            if window is not None:
                left, right = window
                if has_bound:
                    pos = row + (bound_ref[0, 0, 0] - bound_offset)
                else:
                    pos = row + causal_offset
                if left >= 0:
                    valid = jnp.logical_and(valid, col >= pos - left)
                if right >= 0:
                    valid = jnp.logical_and(valid, col <= pos + right)
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
        lse2 = lse * LOG2E
        p = jnp.where(
            jnp.isfinite(lse2), jnp.exp2(s - lse2), 0.0
        )
        if dropout_p > 0.0:
            # Same counter-based mask as the forward (dropout_keep_mask):
            # dV consumes the DROPPED P~ = D o P, dP~ = D o (dO V^T).
            keep = dropout_keep_mask(
                dseed_ref[0, 0, 0],
                bi * num_heads + h,
                qi * block_q,
                ki * block_k,
                (block_q, block_k),
                dropout_p,
            )
            rp = 1.0 / (1.0 - dropout_p)
            pd = jnp.where(keep, p * rp, 0.0)
        else:
            pd = p
        # dV += P~^T dO
        dv_acc[...] += jax.lax.dot_general(
            pd.astype(do.dtype),
            do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        dp = jax.lax.dot_general(
            do,
            v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if dropout_p > 0.0:
            dp = jnp.where(keep, dp * rp, 0.0)
        ds = p * (dp - delta)
        if softcap > 0.0:
            ds = ds * cap_factor
        ds = ds * scale
        # dK += dS^T Q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype),
            q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    @pl.when(jnp.logical_and(h % group == group - 1, qi == qt - 1))
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _reshape_rowstats(x: jax.Array, block_q: int) -> jax.Array:
    """[B, H, Sq] -> [B, Qt, block_q, H] (tiling-legal block layout)."""
    b, h, sq = x.shape
    qt = sq // block_q
    return jnp.transpose(
        x.reshape(b, h, qt, block_q), (0, 2, 3, 1)
    )


def flash_attention_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,
    do: jax.Array,
    scale: float,
    causal: bool,
    block_sizes: Optional[BlockSizes] = None,
    dq_block_sizes: Optional[BlockSizes] = None,
    dkv_block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    q_segments: Optional[jax.Array] = None,
    kv_segments: Optional[jax.Array] = None,
    kv_bound: Optional[jax.Array] = None,
    bound_causal: bool = False,
    kv_low: Optional[jax.Array] = None,
    window=None,
    softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """dQ, dK, dV for the dense flash forward. Inputs are the padded
    [B, H, S, D] arrays plus saved lse [B, H, Sq] (natural log).

    The dQ and dKV kernels may run at different tile geometries
    (VERDICT r2 item 8): block_q is dQ's parallel output tile but dKV's
    reduction tile and vice versa, so each kernel gets its own table
    entry (``kind="bwd_dq"`` / ``"bwd_dkv"``) and its own padding and
    row-stat layout. ``block_sizes`` forces one joint geometry for both
    (the pre-split behavior); ``dq_block_sizes`` / ``dkv_block_sizes``
    override each side independently.
    """
    if interpret is None:
        interpret = _default_interpret()
    b, h, sq, d = q.shape
    hk = k.shape[1]
    group = h // hk
    sk = k.shape[2]
    if block_sizes is not None:
        bs_dq = bs_dkv = block_sizes
    else:
        bs_dq = dq_block_sizes or get_block_sizes(
            d, q.dtype.itemsize, kind="bwd_dq"
        )
        bs_dkv = dkv_block_sizes or get_block_sizes(
            d, q.dtype.itemsize, kind="bwd_dkv"
        )

    # o is consumed only through delta = rowsum(o * dO); compute it once
    # on the unpadded arrays and re-pad per kernel geometry below.
    delta_full = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1
    )  # [B, H, Sq]

    has_segments = q_segments is not None
    has_bound = kv_bound is not None
    has_low = kv_low is not None
    has_alibi = alibi_slopes is not None

    precision = (
        jax.lax.Precision.HIGHEST
        if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def _prep(bs: BlockSizes) -> dict:
        block_q = min(bs.block_q, max(128, -(-sq // 128) * 128))
        block_k = min(bs.block_k, max(128, -(-sk // 128) * 128))

        def pad_seq(x, blk):
            pad = (-x.shape[2]) % blk
            return (
                jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                if pad
                else x
            )

        qp, dop = pad_seq(q, block_q), pad_seq(do, block_q)
        kp, vp = pad_seq(k, block_k), pad_seq(v, block_k)
        sq_p, sk_p = qp.shape[2], kp.shape[2]
        lse_r = _reshape_rowstats(
            jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq))), block_q
        )
        delta_r = _reshape_rowstats(
            jnp.pad(delta_full, ((0, 0), (0, 0), (0, sq_p - sq))),
            block_q,
        )
        extra_inputs = []
        if has_segments:
            assert b == 1, (
                "segment-id (varlen) attention expects packed B=1"
            )
            qs = jnp.pad(
                q_segments, ((0, 0), (0, sq_p - q_segments.shape[1])),
                constant_values=-1,
            ).astype(jnp.int32)
            ks = jnp.pad(
                kv_segments, ((0, 0), (0, sk_p - kv_segments.shape[1])),
                constant_values=-2,
            ).astype(jnp.int32)
            extra_inputs += [qs, ks]
        if has_bound:
            extra_inputs.append(
                jnp.broadcast_to(
                    kv_bound.astype(jnp.int32).reshape(b, 1, 1),
                    (b, 1, sk_p),
                )
            )
        if has_low:
            extra_inputs.append(
                jnp.broadcast_to(
                    kv_low.astype(jnp.int32).reshape(b, 1, 1),
                    (b, 1, sk_p),
                )
            )
        if has_alibi:
            hp = max(128, -(-h // 128) * 128)
            sl = alibi_slopes.astype(jnp.float32).reshape(-1, h)
            sl = jnp.broadcast_to(sl[:, None, :], (b, 1, h))
            extra_inputs.append(
                jnp.pad(sl, ((0, 0), (0, 0), (0, hp - h)))
            )
        if dropout_p > 0.0:
            assert dropout_seed is not None, "dropout_p > 0 needs a seed"
            extra_inputs.append(
                jnp.broadcast_to(
                    jnp.asarray(dropout_seed, jnp.int32).reshape(
                        1, 1, 1
                    ),
                    (1, 1, 128),
                )
            )
        common = dict(
            scale=scale,
            num_heads=h,
            block_q=block_q,
            block_k=block_k,
            seqlen_k=sk,
            causal=causal,
            causal_offset=sk - sq,
            precision=precision,
            has_segments=has_segments,
            has_bound=has_bound,
            bound_causal=bound_causal,
            bound_offset=sq,
            has_low=has_low,
            window=window,
            softcap=softcap,
            has_alibi=has_alibi,
            dropout_p=dropout_p,
        )
        return dict(
            block_q=block_q, block_k=block_k, qp=qp, kp=kp, vp=vp,
            dop=dop, lse_r=lse_r, delta_r=delta_r, sq_p=sq_p,
            sk_p=sk_p, qt=sq_p // block_q, kt=sk_p // block_k,
            extra_inputs=extra_inputs, common=common,
        )

    pq = _prep(bs_dq)
    pk = pq if bs_dkv == bs_dq else _prep(bs_dkv)

    block_q, block_k = pq["block_q"], pq["block_k"]
    qt, kt, sq_p = pq["qt"], pq["kt"], pq["sq_p"]

    qspec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, qi, hi, ki: (bi, hi, qi, 0)
    )
    kspec = pl.BlockSpec(
        (1, 1, block_k, d),
        lambda bi, qi, hi, ki, g=group: (bi, hi // g, ki, 0),
    )
    statspec = pl.BlockSpec(
        (1, 1, block_q, h), lambda bi, qi, hi, ki: (bi, qi, 0, 0)
    )
    extra_specs_dq = []
    if has_segments:
        extra_specs_dq += [
            pl.BlockSpec((1, block_q), lambda bi, qi, hi, ki: (0, qi)),
            pl.BlockSpec((1, block_k), lambda bi, qi, hi, ki: (0, ki)),
        ]
    if has_bound:
        extra_specs_dq.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, qi, hi, ki: (bi, 0, ki))
        )
    if has_low:
        extra_specs_dq.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, qi, hi, ki: (bi, 0, ki))
        )
    if has_alibi:
        hp = max(128, -(-h // 128) * 128)
        extra_specs_dq.append(
            pl.BlockSpec((1, 1, hp), lambda bi, qi, hi, ki: (bi, 0, 0))
        )
    if dropout_p > 0.0:
        extra_specs_dq.append(
            pl.BlockSpec((1, 1, 128), lambda bi, qi, hi, ki: (0, 0, 0))
        )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, kt=kt, **pq["common"]),
        grid=(b, qt, h, kt),
        in_specs=[qspec, kspec, kspec, qspec, statspec, statspec]
        + extra_specs_dq,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, qi, hi, ki: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel",
                "parallel",
                "arbitrary",
                "arbitrary",
            ),
        ),
        interpret=interpret,
    )(
        pq["qp"], pq["kp"], pq["vp"], pq["dop"], pq["lse_r"],
        pq["delta_r"], *pq["extra_inputs"]
    )

    block_q, block_k = pk["block_q"], pk["block_k"]
    qt, kt, sk_p = pk["qt"], pk["kt"], pk["sk_p"]

    qspec2 = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, ki, hi, qi: (bi, hi, qi, 0)
    )
    kspec2 = pl.BlockSpec(
        (1, 1, block_k, d),
        lambda bi, ki, hi, qi, g=group: (bi, hi // g, ki, 0),
    )
    statspec2 = pl.BlockSpec(
        (1, 1, block_q, h), lambda bi, ki, hi, qi: (bi, qi, 0, 0)
    )
    dkv_out = pl.BlockSpec(
        (1, 1, block_k, d),
        lambda bi, ki, hi, qi, g=group: (bi, hi // g, ki, 0),
    )
    extra_specs_dkv = []
    if has_segments:
        extra_specs_dkv += [
            pl.BlockSpec((1, block_q), lambda bi, ki, hi, qi: (0, qi)),
            pl.BlockSpec((1, block_k), lambda bi, ki, hi, qi: (0, ki)),
        ]
    if has_bound:
        extra_specs_dkv.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, ki, hi, qi: (bi, 0, ki))
        )
    if has_low:
        extra_specs_dkv.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, ki, hi, qi: (bi, 0, ki))
        )
    if has_alibi:
        hp = max(128, -(-h // 128) * 128)
        extra_specs_dkv.append(
            pl.BlockSpec((1, 1, hp), lambda bi, ki, hi, qi: (bi, 0, 0))
        )
    if dropout_p > 0.0:
        extra_specs_dkv.append(
            pl.BlockSpec((1, 1, 128), lambda bi, ki, hi, qi: (0, 0, 0))
        )
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, qt=qt, group=group, **pk["common"]
        ),
        grid=(b, kt, h, qt),
        in_specs=[qspec2, kspec2, kspec2, qspec2, statspec2, statspec2]
        + extra_specs_dkv,
        out_specs=[dkv_out, dkv_out],
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel",
                "parallel",
                "arbitrary",
                "arbitrary",
            ),
        ),
        interpret=interpret,
    )(
        pk["qp"], pk["kp"], pk["vp"], pk["dop"], pk["lse_r"],
        pk["delta_r"], *pk["extra_inputs"]
    )

    return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk]


__all__ = ["flash_attention_bwd"]
