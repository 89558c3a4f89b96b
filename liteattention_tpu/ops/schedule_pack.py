"""Pallas schedule packer: fine skip mask -> packed gather schedule.

Replaces the XLA pipeline ``compact_mask_gather`` +
``build_gather_schedule`` (reference semantics: rebuilding the
SkipListReader rows from the evolved skip state each vote cycle,
hopper/lite_attention.py:165-212) with ONE kernel. The XLA pipeline is
layout-hostile on TPU -- argsort lowers to a bitonic sort (~4.6 ms at
73k tokens), the minor-dim ``take_along_axis`` to a serial gather
(~9.2 ms), and the strided sub-row reduce + flag reshapes each force
relayouts (~4-5 ms) -- ~15 ms per vote cycle in total. This kernel
does the same work in VMEM with MXU-friendly algebra:

* sub-row liveness/bitmap reduction = selector-matrix matmuls,
* running rank (cumulative count of survivors) = triangular matmul,
* the compaction scatter = a one-hot comparison matrix ``E[j, r] =
  live[j] & (rank[j]-1 == min(r, count-1))`` contracted against the
  index/bitmap rows (the clamped rank reproduces the repeat-last
  phantom-tail contract of ``compact_mask``),
* per-step run/full flags = strided selection matmuls,
* the lane->sublane wire packing = shifted selection matmuls.

Output bit-equals ``build_gather_schedule(compact_mask_gather(mask))``
(oracle-tested in tests/test_schedule_pack.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_LANES = 128
VOTE_TILE = 128
_F32 = jnp.float32


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _iota2(shape, dim):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


def _pack_kernel(
    mask_ref,
    *refs,
    qc: int,
    sub: int,
    qsubs: int,
    gsize: int,
    ktf: int,
    steps: int,
    sched_rows: int,
    tail_tile: bool,
    has_kv_map: bool = False,
):
    """One program packs ``qc`` compute q-tiles of one (b, h).

    Mosaic-shaped: per-q-tile results land in VMEM scratch rows (sublane
    CONCATENATION of loop-carried vectors is not lowerable), and the
    wire rows are LANE-concatenated into one flat [qc, 3R*128] block
    (the host's reshape to [3R, 128] rows is layout-free).

    ``has_kv_map`` (round 5, compact-KV layout): an extra per-(b, hk)
    input row maps each fine tile index to its position in the
    union-compacted KV buffer (see ``kv_union_map``/``compact_kv``).
    The emitted fidx entries are then COMPACT positions -- and the run
    flag, computed on them, detects contiguity in the compact buffer,
    where any mask whose live set matches the cross-q-tile union is
    fully contiguous. Requires no padded tail tile (the gather kernel
    reconstructs tail columns from fidx, which compact positions no
    longer encode).
    """
    if has_kv_map:
        kvmap_ref, out_ref, fidx_s, qbits_s = refs
        assert not tail_tile, "compact-KV packing requires sk % 128 == 0"
        kvmap_row = kvmap_ref[0, 0].astype(_F32)  # (1, ktf)
    else:
        out_ref, fidx_s, qbits_s = refs
    m = mask_ref[0, 0].astype(_F32)  # [qc, sub, ktf]
    m2 = m.reshape(qc * sub, ktf)
    rows = qc * sub

    # Sub-row group reduction as matmuls: G sums a q-tile's fine rows
    # (liveness), W folds them into the per-lane qbits bitmap.
    t_i = _iota2((qc, rows), 0)
    r_i = _iota2((qc, rows), 1)
    grp = (r_i // sub) == t_i
    gmat = grp.astype(_F32)
    wmat = jnp.where(grp, (1 << (r_i % sub)).astype(_F32), 0.0)
    sums = jnp.dot(gmat, m2, preferred_element_type=_F32)  # [qc, ktf]
    live = (sums > 0).astype(_F32)
    bits = jnp.dot(wmat, m2, preferred_element_type=_F32)  # exact: qsubs<=8
    cnt_all = jnp.maximum(
        jnp.sum(live, axis=1, keepdims=True), 1.0
    )  # [qc, 1]

    # rank[j] = #survivors at lane <= j, as a triangular matmul; kept in
    # COLUMN orientation [ktf, qc] so the per-q-tile one-hot build below
    # broadcasts it against a lane iota without a transpose.
    lt = (_iota2((ktf, ktf), 1) <= _iota2((ktf, ktf), 0)).astype(_F32)
    rank_t = lax.dot_general(
        lt, live, (((1,), (1,)), ((), ())),
        preferred_element_type=_F32,
    )  # [ktf, qc]
    live_t = rank_t - jnp.concatenate(
        [jnp.zeros((1, qc), _F32), rank_t[: ktf - 1]], axis=0
    )

    lane_f = _iota2((1, ktf), 1).astype(_F32)
    for t in range(qc):
        rank_col = rank_t[:, t : t + 1]
        live_col = live_t[:, t : t + 1]
        cnt = cnt_all[t : t + 1, :]  # [1, 1]
        rr = jnp.minimum(lane_f, cnt - 1.0)  # [1, ktf]
        e = jnp.where(rank_col - 1.0 == rr, live_col, 0.0)  # [ktf, ktf]
        rhs = jnp.concatenate(
            [
                kvmap_row if has_kv_map else lane_f,
                bits[t : t + 1] * live[t : t + 1],
            ],
            axis=0,
        )  # [2, ktf]
        # HIGHEST: index VALUES ride this contraction (up to ktf-1 >
        # 256) and default f32 matmul precision rounds operands through
        # bf16 on v5e -- off-by-one fidx entries on chip (interpret
        # mode does not catch it).
        packed2 = lax.dot_general(
            rhs, e, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=lax.Precision.HIGHEST,
        )  # [2, ktf] over schedule position r
        fidx_s[t : t + 1, :] = packed2[0:1]
        qbits_s[t : t + 1, :] = packed2[1:2]
    fidx_all = fidx_s[:, :]  # [qc, ktf]
    qbits_all = qbits_s[:, :]

    # Per-step flags (bit 0: contiguous run -> single wide DMA; bit 1:
    # fully-live -> no sub-masking), batched over the chunk's q-tiles.
    pl_lanes = max(MIN_LANES, _cdiv(steps, MIN_LANES) * MIN_LANES)
    j_i = _iota2((ktf, pl_lanes), 0)
    p_i = _iota2((ktf, pl_lanes), 1)
    valid_p = p_i < steps
    gg = (
        (j_i >= p_i * gsize) & (j_i < (p_i + 1) * gsize) & valid_p
    ).astype(_F32)
    # A step is a contiguous run iff every intra-group adjacent pair
    # increments by exactly 1 (a first-to-last SPAN test is NOT enough:
    # phantom repeats starting mid-group, e.g. [2,5,5,5] at gsize 4,
    # can fake the right span while not being consecutive -- and the
    # run flag triggers a single wide DMA, so a false positive fetches
    # the wrong tiles). Count unit increments with an inner-position
    # selector matmul.
    fshift = jnp.concatenate(
        [jnp.zeros((qc, 1), _F32), fidx_all[:, : ktf - 1]], axis=1
    )
    consec = (fidx_all - fshift == 1.0).astype(_F32)
    gg_inner = (
        (j_i > p_i * gsize) & (j_i < (p_i + 1) * gsize) & valid_p
    ).astype(_F32)
    runflag = (
        jnp.dot(consec, gg_inner, preferred_element_type=_F32)
        == float(gsize - 1)
    )
    # Sub-run buddy flags (round 5; bit layout = _subrun_levels): one
    # inner-position selector matmul per (level, group) counts unit
    # increments inside the sub-block [g0, g0 + blk) of each step.
    subrun_flags = jnp.zeros((qc, pl_lanes), _F32)
    base = 2
    blk = gsize // 2
    while blk >= 2:
        for gi in range(gsize // blk):
            g0 = gi * blk
            sel = (
                (j_i > p_i * gsize + g0)
                & (j_i < p_i * gsize + g0 + blk)
                & valid_p
            ).astype(_F32)
            sub = (
                jnp.dot(consec, sel, preferred_element_type=_F32)
                == float(blk - 1)
            )
            subrun_flags = subrun_flags + float(
                1 << (base + gi)
            ) * sub.astype(_F32)
        base += gsize // blk
        blk //= 2
    full_qb = float((1 << qsubs) - 1)
    fullcnt = jnp.dot(
        (qbits_all == full_qb).astype(_F32), gg,
        preferred_element_type=_F32,
    )
    p_row = _iota2((qc, pl_lanes), 1)
    fullflag = jnp.logical_and(
        fullcnt == float(gsize),
        (p_row + 1).astype(_F32) * float(gsize) <= cnt_all,
    )
    if tail_tile:
        touch = jnp.dot(
            (fidx_all == float(ktf - 1)).astype(_F32), gg,
            preferred_element_type=_F32,
        )
        fullflag = jnp.logical_and(fullflag, touch == 0.0)
    flags_all = (
        runflag.astype(_F32)
        + 2.0 * fullflag.astype(_F32)
        + subrun_flags
    )

    # Wire packing: section body [head, body..., 0...] viewed as
    # [sched_rows, 128] -- i.e. row s, lane l holds body[s*128 + l - 1].
    # Expressed as shifted selection matmuls (a lane->sublane data move
    # XLA/Mosaic have no cheap primitive for); rows are LANE-concatenated
    # and the host reshape to [3R, 128] is free (row-major identical).
    def pack_section(head_col, body, body_len):
        rows_out = []
        nz_rows = _cdiv(1 + body_len, MIN_LANES)
        x_i = _iota2((body_len, MIN_LANES), 0)
        l_i = _iota2((body_len, MIN_LANES), 1)
        for s in range(sched_rows):
            if s >= nz_rows:
                rows_out.append(jnp.zeros((qc, MIN_LANES), _F32))
                continue
            p = (x_i == s * MIN_LANES + l_i - 1).astype(_F32)
            # HIGHEST: body may carry index values > 256 (see above).
            row = jnp.dot(
                body, p, preferred_element_type=_F32,
                precision=lax.Precision.HIGHEST,
            )
            if s == 0:
                lane0 = (
                    _iota2((1, MIN_LANES), 1) == 0
                ).astype(_F32)
                row = row + head_col * lane0
            rows_out.append(row)
        return rows_out  # sched_rows x [qc, 128]

    zeros_head = jnp.zeros((qc, 1), _F32)
    all_rows = (
        pack_section(cnt_all, fidx_all, ktf)
        + pack_section(zeros_head, qbits_all, ktf)
        + pack_section(zeros_head, flags_all[:, :steps], steps)
    )
    out = jnp.concatenate(all_rows, axis=1)  # [qc, 3R*128]
    out_ref[0, 0] = out.astype(jnp.int32)


def pack_schedule(
    do_mask: jax.Array,
    *,
    qsubs: int,
    gsize: int,
    seqlen_k: int,
    kv_map: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fine mask -> packed wire-format gather schedule, in one kernel.

    Args:
      do_mask: bool[B, H, Qtf, Ktf] fine skip mask.
      qsubs: fine q-tiles per compute q-tile (block_q // 128), <= 8.
      gsize: fine k-tiles per pipeline step (block_k // 128).
      seqlen_k: unpadded key length (decides the padded-tail-tile rule
        of the fully-live flag).
      kv_map: optional int32[B, Hk, Ktf] fine-tile -> compact-KV
        position map (``kv_union_map``): emitted fidx entries (and the
        run-flag contiguity they encode) are then in compact-buffer
        space; pair with ``compact_kv`` and pass the ORIGINAL
        (un-mapped) indices to the vote decode. Requires
        ``seqlen_k % 128 == 0``.

    Returns:
      int32[B, H, Qt, 3 * sched_rows, 128] -- without ``kv_map``,
      bit-identical to
      ``build_gather_schedule(*compact_mask_gather(do_mask, qsubs),
      gsize=gsize, qsubs=qsubs, seqlen_k=seqlen_k)``.
    """
    if interpret is None:
        interpret = _default_interpret()
    return _pack_schedule(
        do_mask, kv_map, qsubs=qsubs, gsize=gsize, seqlen_k=seqlen_k,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("qsubs", "gsize", "seqlen_k", "interpret")
)
def _pack_schedule(
    do_mask: jax.Array,
    kv_map: Optional[jax.Array],
    *,
    qsubs: int,
    gsize: int,
    seqlen_k: int,
    interpret: bool,
) -> jax.Array:
    assert 1 <= qsubs <= 8, "kernel packs qbits in f32; qsubs <= 8"
    b, h, qtf, ktf = do_mask.shape
    qt = _cdiv(qtf, qsubs)
    sub = 8  # pad each q-tile's fine rows to a full sublane group
    qc = min(8, qt)
    qtp = _cdiv(qt, qc) * qc
    steps = _cdiv(ktf, gsize)
    sched_rows = _cdiv(1 + ktf + gsize, MIN_LANES)
    has_kv_map = kv_map is not None
    if has_kv_map:
        assert seqlen_k % VOTE_TILE == 0, (
            "compact-KV schedules require seqlen_k % 128 == 0 (the "
            "gather kernel's tail masking reconstructs columns from "
            "fidx, which compact positions no longer encode)")
        assert kv_map.shape[0] == b and kv_map.shape[2] == ktf, (
            kv_map.shape, (b, ktf))
        if kv_map.shape[1] != h:
            # Per-KV-head map shared across a GQA group: expand to the
            # mask's q-head axis so the in_spec index map stays trivial.
            group = h // kv_map.shape[1]
            kv_map = jnp.repeat(kv_map, group, axis=1)
        # [B, H, 1, Ktf]: (1, ktf) trailing block dims equal the array
        # dims (the SMEM/VMEM last-two-dims rule; see CLAUDE.md).
        kv_map = kv_map.reshape(b, h, 1, ktf).astype(jnp.int32)

    fine = jnp.pad(
        do_mask.astype(jnp.float32),
        ((0, 0), (0, 0), (0, qt * qsubs - qtf), (0, 0)),
    ).reshape(b, h, qt, qsubs, ktf)
    fine = jnp.pad(
        fine, ((0, 0), (0, 0), (0, qtp - qt), (0, sub - qsubs), (0, 0))
    )

    kernel = functools.partial(
        _pack_kernel,
        qc=qc,
        sub=sub,
        qsubs=qsubs,
        gsize=gsize,
        ktf=ktf,
        steps=steps,
        sched_rows=sched_rows,
        tail_tile=seqlen_k % VOTE_TILE != 0,
        has_kv_map=has_kv_map,
    )
    grid = (b, h, qtp // qc)
    row_lanes = 3 * sched_rows * MIN_LANES
    in_specs = [
        pl.BlockSpec(
            (1, 1, qc, sub, ktf),
            lambda bi, hi, qi: (bi, hi, qi, 0, 0),
        )
    ]
    inputs = [fine]
    if has_kv_map:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, ktf), lambda bi, hi, qi: (bi, hi, 0, 0)
            )
        )
        inputs.append(kv_map)
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, qc, row_lanes),
            lambda bi, hi, qi: (bi, hi, qi, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, h, qtp, row_lanes), jnp.int32
        ),
        scratch_shapes=[
            pltpu.VMEM((qc, ktf), jnp.float32),
            pltpu.VMEM((qc, ktf), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*inputs)
    packed = packed.reshape(b, h, qtp, 3 * sched_rows, MIN_LANES)
    return packed[:, :, :qt]


def unpack_schedule(
    packed: jax.Array, ktf: int, sched_rows: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Recover (fidx, count, qbits) views from a packed schedule.

    Contiguous slices + reshapes only (no gather): the engine's vote
    decode still wants the compacted index row and survivor counts.
    """
    b, h, qt = packed.shape[:3]
    flat_f = packed[:, :, :, :sched_rows].reshape(b, h, qt, -1)
    flat_q = packed[:, :, :, sched_rows : 2 * sched_rows].reshape(
        b, h, qt, -1
    )
    count = flat_f[..., 0]
    fidx = flat_f[..., 1 : 1 + ktf]
    qbits = flat_q[..., 1 : 1 + ktf]
    return fidx, count, qbits


__all__ = ["pack_schedule", "unpack_schedule"]
