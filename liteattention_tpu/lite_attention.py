"""User-facing LiteAttention API.

TPU-native rebuild of the reference's L1 layer
(``hopper/lite_attention.py``): a drop-in attention module for
video-diffusion DiT inference that carries a persistent skip mask across
denoising timesteps.

Two API levels:

* **Functional core** (:func:`lite_attention_init` /
  :func:`lite_attention_step`): the skip mask is an explicit
  :class:`~liteattention_tpu.ops.mask.SkipMaskState` threaded through the
  caller's denoising loop (or a ``lax.scan`` carry). This is the idiomatic
  JAX form -- fully jittable, no hidden state, no double buffer
  (SURVEY.md section 7, translation decision 1).
* **Stateful wrapper** (:class:`LiteAttention`): mirrors the reference
  class surface -- ``__call__``, ``set_threshold``, ``reset_skip_state``,
  ``enable_skip_optimization``, ``get_skip_percentage``
  (reference hopper/lite_attention.py:36-320, README.md:134-263) -- for
  users migrating from the CUDA package. It stores the returned state on
  the Python object between calls; each call runs jitted code.

Layout note: the wrapper accepts the reference's ``[B, S, H, D]`` tensors;
the kernels run on ``[B, H, S, D]``.

Fixed vs reference (SURVEY.md section 2.1 known bugs): disabling skipping
really does fall back to a clean dense FA path (the reference crashes in
``_expand_must_do_list`` because it gates on the *method object*
``enable_skip_optimization`` instead of the flag,
hopper/lite_attention.py:262); ``must_skip`` inputs are not mutated.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.kv_compact import compact_kv, kv_union_map
from liteattention_tpu.ops.lite_flash_fwd import (
    VOTE_TILE,
    build_gather_schedule,
    lite_flash_attention,
    pack_kv,
)
from liteattention_tpu.ops.mask import (
    SkipMaskState,
    cdiv,
    compact_mask,
    compact_mask_gather,
    init_mask,
    must_do_mask,
    sparsity,
    update_mask,
)
from liteattention_tpu.ops.schedule_pack import (
    pack_schedule,
    unpack_schedule,
)
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes


def effective_blocks(bs: BlockSizes, seqlen_q: int, seqlen_k: int):
    """Clamp compute tiles to the (128-padded) sequence lengths --
    must match the clamping inside the kernels."""
    bq = min(bs.block_q, max(128, cdiv(seqlen_q, 128) * 128))
    bk = min(bs.block_k, max(128, cdiv(seqlen_k, 128) * 128))
    return bq, bk


def lite_attention_init(
    batch: int,
    heads: int,
    seqlen_q: int,
    seqlen_k: int,
    head_dim: int,
    dtype_bytes: int = 2,
    must_skip_ranges: Optional[Sequence[Tuple[int, int]]] = None,
    block_sizes: Optional[BlockSizes] = None,
) -> SkipMaskState:
    """Create the initial (all-do) skip-mask state for a given geometry.

    Counterpart of ``LiteAttention.init_skip_list``
    (reference hopper/lite_attention.py:113-153).
    """
    # Round 2: the mask lives at FINE (128x128) granularity regardless
    # of the compute tile -- reference-level sparsity resolution
    # (tile_size.h:10-48) at large-tile compute cost (VERDICT item 1).
    del block_sizes, dtype_bytes  # mask granularity is compute-independent
    return init_mask(
        batch,
        heads,
        seqlen_q,
        seqlen_k,
        VOTE_TILE,
        VOTE_TILE,
        must_skip_ranges=must_skip_ranges,
    )


def lite_attention_step(
    state: SkipMaskState,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    threshold: Union[float, jax.Array],
    scale: Optional[float] = None,
    must_do: Optional[jax.Array] = None,
    enable_skipping: bool = True,
    block_sizes: Optional[BlockSizes] = None,
    return_lse: bool = False,
    emit_votes: bool = True,
    schedule: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    packed_kv: Optional[jax.Array] = None,
    seqlen_k: Optional[int] = None,
    kv_map: Optional[jax.Array] = None,
):
    """One denoising-step attention call with skip-mask evolution.

    The TPU form of ``LiteAttention.__call__``
    (reference hopper/lite_attention.py:244-291): consumes the mask
    produced at step t-1, computes attention over surviving tiles only,
    and returns the (monotonically shrunken) mask for step t+1. Newly
    skippable tiles are still computed *this* step -- the vote needs their
    QK max -- and eliminated from the next one, the reference's
    forward-propagation semantics (mainloop:1804-1827).

    Args:
      state: skip-mask state from :func:`lite_attention_init` or a prior
        step.
      q, k, v: ``[B, H, S, D]``.
      threshold: log2-space skip threshold (traced scalar; pass the
        per-timestep calibrated value without recompiling).
      must_do: optional bool mask broadcastable to ``[B, H, Qt, Kt]``
        protecting tiles from being newly skipped.
      enable_skipping: when False, runs the dense kernel and returns the
        state unchanged (the reference's documented disable path,
        README.md:158-159).
      schedule: optional cached compaction ``(fidx, count, qbits)`` or
        ``(fidx, count, qbits, packed)`` where ``packed`` is the
        pre-assembled wire-format schedule from
        :func:`build_gather_schedule` (the stateful wrapper caches both
        between vote steps). A 6-tuple ``(..., packed, kv_map, inv)``
        marks a UNION-COMPACT schedule (``pack_schedule(kv_map=...)``):
        ``packed_kv`` is then relayouted through ``compact_kv(inv)``
        in-call and the vote decode uses ``kv_map`` -- the fully-traced
        form the denoise scan carries (models/pipeline.py).
      packed_kv: optional pre-interleaved K|V from
        :func:`~liteattention_tpu.ops.lite_flash_fwd.pack_kv`
        (``[B, Hk, Skp, 2Dp]``). Models with fused KV projections emit
        this layout for free (one concatenated-weights matmul); the
        kernel then skips its in-call interleave (~2x KV bytes of HBM
        traffic). When given, ``k``/``v`` may be ``None`` (pass
        ``seqlen_k``); requires ``enable_skipping=True``.
      seqlen_k: unpadded key length when ``k`` is ``None``.
      kv_map: optional fine-tile -> compact-position map
        (:func:`liteattention_tpu.ops.kv_compact.kv_union_map`) when
        ``packed_kv`` was union-compacted and ``schedule`` was packed
        with ``pack_schedule(kv_map=...)`` -- the round-5 scattered-mask
        fast path. Only the vote decode consumes it.
      emit_votes: when False, the kernel's vote chain is compiled out
        (~a full extra MXU pass per step saved) and the mask is carried
        over unchanged. The reference votes every step
        (hopper/lite_attention.py:244-291); on TPU the vote reduction
        is a third full-width matmul, so the engine amortizes it over
        ``vote_stride`` denoising steps (temporal coherence keeps
        adjacent-step masks nearly identical -- the same property the
        skip optimization itself exploits). Stride 1 restores exact
        reference semantics.

    Returns:
      ``(out, new_state)`` or ``(out, lse, new_state)``.
    """
    bs = block_sizes or get_block_sizes(
        q.shape[-1], q.dtype.itemsize,
        kind="lite" if enable_skipping else "dense",
    )
    if not enable_skipping:
        assert k is not None, (
            "enable_skipping=False runs the dense kernel; pass k/v "
            "(packed_kv is a lite-path input)")
        out, lse = flash_attention(
            q, k, v, scale=scale, block_sizes=bs, return_lse=True
        )
        new_state = state
    else:
        # GATHER schedule (round-2 default): surviving FINE k-tiles are
        # listed directly; runtime scales with fine sparsity itself.
        # ``schedule`` short-circuits the compaction: between vote steps
        # the mask is frozen, so the compacted schedule from the last
        # vote step can be reused verbatim (the wrapper caches it;
        # compaction is ~10 ms at 73k tokens and would otherwise be paid
        # every step).
        sk = k.shape[2] if k is not None else (
            seqlen_k if seqlen_k is not None else packed_kv.shape[2])
        bq, bk = effective_blocks(bs, q.shape[2], sk)
        packed = None
        if schedule is not None:
            if len(schedule) == 6:
                fidx, count, qbits, packed, sched_kv_map, inv = schedule
                assert packed_kv is not None, (
                    "a compact (6-tuple) schedule implies the packed_kv "
                    "hot path")
                assert kv_map is None, "kv_map rides the 6-tuple here"
                packed_kv = compact_kv(packed_kv, inv)
                kv_map = sched_kv_map
            elif len(schedule) == 4:
                fidx, count, qbits, packed = schedule
            else:
                fidx, count, qbits = schedule
        else:
            fidx, count, qbits = compact_mask_gather(
                state.do_mask, bq // VOTE_TILE
            )
        out, lse, votes = lite_flash_attention(
            q,
            k,
            v,
            fidx,
            count,
            jnp.asarray(threshold, jnp.float32),
            kv_bits=qbits,
            scale=scale,
            block_sizes=bs,
            fine_schedule=True,
            emit_votes=emit_votes,
            packed_schedule=packed,
            packed_kv=packed_kv,
            seqlen_k=seqlen_k,
            kv_map=kv_map,
        )
        if emit_votes:
            votes = votes[
                :, :, : state.do_mask.shape[2], : state.do_mask.shape[3]
            ]
            new_state = update_mask(state, votes, must_do=must_do)
        else:
            new_state = state
    if return_lse:
        return out, lse, new_state
    return out, new_state


def _ranges_from_flat_list(flat: Sequence[int]) -> List[Tuple[int, int]]:
    """Normalize the reference's flat pair list to half-open ranges.

    The reference passes ``[hi, lo, hi, lo, ...]`` inclusive sequence-index
    pairs in decreasing order (root test_lite_attention.py:31 uses
    ``[seqlen-1, 0]`` for "everything"). Accepts either pair order.
    """
    assert len(flat) % 2 == 0, "range list must hold (start, end) pairs"
    out = []
    for i in range(0, len(flat), 2):
        a, b = int(flat[i]), int(flat[i + 1])
        lo, hi = min(a, b), max(a, b)
        out.append((lo, hi + 1))
    return out


class LiteAttention:
    """Stateful LiteAttention wrapper (reference-class API parity).

    Reference: ``LiteAttention`` (hopper/lite_attention.py:15-320),
    README.md:134-197.

    Args:
      enable_skipping: enable the temporal skip optimization.
      threshold: log2-space skip threshold; must be negative unless
        ``LITE_ATTENTION_DEBUG`` is set (reference
        hopper/lite_attention.py:306-313).
      max_batch_size: accepted for API parity. The TPU engine sizes the
        mask to the actual batch, so it is only validated against.
      block_sizes: optional kernel tile override.
      vote_stride: emit skip votes (and evolve the mask) every N-th
        call instead of every call. The vote chain costs ~a full extra
        MXU pass per kernel step on TPU; with temporally-coherent masks
        a stride of 2-4 keeps mask evolution near-identical while
        amortizing that cost (round-3 deviation from the reference's
        every-step voting; stride 1 = exact reference semantics).
      vote_backoff_cap: adaptive vote cadence (0 = off). When set, the
        stride between vote steps starts at ``vote_stride`` and DOUBLES
        (up to the cap) each time a vote cycle leaves the mask
        unchanged, resetting to ``vote_stride`` whenever a vote shrinks
        it or the threshold changes. A stale mask is only conservative
        (skipped tiles stay skipped, live tiles stay live -> output is
        at least as close to dense as the voted mask's), so backoff
        trades a slower sparsity ramp for amortizing the vote cost to
        ~1/cap once the mask converges -- which it does within a few
        steps at a fixed threshold because the update is a monotone AND.
      adaptive_geometry: pick the gather compute tile per mask EPOCH
        from the mask's measured q-coherence (off by default). The
        schedule is per (b, head, kernel q-tile) and UNIONS the
        ``block_q/128`` fine q-rows it covers; evolved video masks are
        q-coherent (union density == live fraction, measured), but
        INCOHERENT masks inflate the union toward 1-(1-live)^qsubs --
        at 60% scattered sparsity the default (640, _) tile schedules
        ~92% of tiles and converts almost nothing. When the measured
        union density exceeds ``live * 1.15 + 0.02``, the engine drops
        to the union-free (128, block_k) geometry for that mask epoch
        (re-evaluated at every recompaction; the kernel is specialized
        per geometry and jit-cached, so switching costs one compile).
      kv_compact: stage K|V through a union-compacted buffer when the
        mask's cross-q-tile union leaves real holes, so those masks
        ride the kernel's contiguous-run DMA fast path (round 5; see
        ops/kv_compact.py). Gated per mask epoch on measured union
        density < 0.75: evolved video self-attention masks measure
        union density 1.0 (compaction would be a pure relayout cost),
        while per-head localized masks (e.g. windowed or must-skip
        structured) are the win case. Auto-disabled when
        ``seqlen_k % 128 != 0`` (the kernel's tail masking needs raw
        fine indices).
    """

    def __init__(
        self,
        enable_skipping: bool = True,
        threshold: float = -10.0,
        max_batch_size: int = 4,
        block_sizes: Optional[BlockSizes] = None,
        vote_stride: int = 1,
        vote_backoff_cap: int = 0,
        adaptive_geometry: bool = False,
        kv_compact: bool = True,
    ):
        self._state: Optional[SkipMaskState] = None
        self._last_key = None
        self._last_percentage = 0.0
        self._read_mask = None
        self._call_count = 0
        self._sched_cache = None
        self.enable_skipping = enable_skipping
        self.max_batch_size = max_batch_size
        self.block_sizes = block_sizes
        assert vote_stride >= 1
        self.vote_stride = vote_stride
        assert vote_backoff_cap == 0 or vote_backoff_cap >= vote_stride
        self.vote_backoff_cap = int(vote_backoff_cap)
        self._cur_stride = vote_stride
        self._since_vote = 0
        self._last_vote_live = None
        self.adaptive_geometry = bool(adaptive_geometry)
        self._geom_bs: Optional[BlockSizes] = None
        self.kv_compact = bool(kv_compact)
        self._kv_maps = None  # (kv_map, inv) for the cached schedule
        self.set_threshold(threshold)

    # -- reference-parity helpers -------------------------------------

    @staticmethod
    def ceil_div(x: int, y: int) -> int:
        return cdiv(x, y)

    def _pick_geometry(
        self, do_mask: jax.Array, bs: BlockSizes
    ) -> BlockSizes:
        """Choose the gather compute tile for this mask epoch (see the
        ``adaptive_geometry`` constructor doc). Runs once per
        recompaction on the host (two cheap reductions + sync, same
        cost class as the backoff's sparsity readback)."""
        qsubs = bs.block_q // VOTE_TILE
        if qsubs <= 1:
            return bs
        m = do_mask
        qt = m.shape[2] // qsubs
        live = float(jnp.mean(m.astype(jnp.float32)))
        union = float(
            jnp.mean(
                jnp.any(
                    m[:, :, : qt * qsubs].reshape(
                        m.shape[0], m.shape[1], qt, qsubs, m.shape[3]
                    ),
                    axis=3,
                ).astype(jnp.float32)
            )
        )
        if union > live * 1.15 + 0.02 and live < 0.95:
            return BlockSizes(VOTE_TILE, bs.block_k)
        return bs

    def set_threshold(self, threshold: float):
        """Update the skip threshold (reference lite_attention.py:306-313).

        Per-timestep error calibration = calling this between denoising
        steps (README.md:148-153). Thresholds >= 0 are rejected unless the
        ``LITE_ATTENTION_DEBUG`` env var is set, matching the reference.
        """
        if (
            float(threshold) >= 0
            and threshold != float("inf")
            and os.getenv("LITE_ATTENTION_DEBUG", "FALSE") == "FALSE"
        ):
            raise ValueError(
                "threshold must be negative when debug mode is not enabled"
            )
        if getattr(self, "threshold", None) != float(threshold):
            # A new threshold can shrink the mask further: drop the
            # adaptive backoff to the base cadence so votes pick the
            # change up promptly (per-timestep calibration calls this
            # between denoising steps, README.md:148-153).
            self._cur_stride = self.vote_stride
            self._last_vote_live = None
        self.threshold = float(threshold)

    def reset_skip_state(self):
        """Drop the persistent mask (reference lite_attention.py:293-304)."""
        self._state = None
        self._last_key = None
        self._last_percentage = 0.0
        self._read_mask = None
        self._call_count = 0
        self._sched_cache = None
        self._kv_maps = None
        self._cur_stride = self.vote_stride
        self._since_vote = 0
        self._last_vote_live = None

    def enable_skip_optimization(self, enable: bool = True):
        """Toggle skipping (reference lite_attention.py:315-320). Unlike
        the reference, disabling cleanly runs the dense path."""
        self.enable_skipping = enable

    def get_skip_percentage(self) -> float:
        """Fraction of tiles skipped in the most recent call (the read
        mask), like the reference's ``calc_percentage`` telemetry
        (hopper/lite_attention.py:61-85)."""
        return float(self._last_percentage)

    @property
    def state(self) -> Optional[SkipMaskState]:
        return self._state

    # -- main entry ----------------------------------------------------

    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        scale: Optional[float] = None,
        return_softmax_lse: bool = False,
        must_do_list: Optional[Sequence[int]] = None,
        must_skip_list: Optional[Sequence[int]] = None,
    ):
        """Attention forward with temporal skip-mask evolution.

        Args:
          query, key, value: ``[batch, seq_len, heads, head_dim]`` (the
            reference layout, hopper/lite_attention.py:244-257).
          must_do_list: flat inclusive (start, end) sequence-index pairs of
            ranges that must never be skipped (reference
            ``_expand_must_do_list``, lite_attention.py:214-242).
          must_skip_list: flat pairs pre-skipped at (re)initialization
            (reference ``init_skip_list``, lite_attention.py:126-145).

        Returns:
          out ``[batch, seq_len, heads, head_dim]`` (+ lse ``[B, H, S]``
          when ``return_softmax_lse``).
        """
        b, s, h, d = query.shape
        assert b <= self.max_batch_size, (
            "batch size must be <= max_batch_size "
            "(modify max_batch_size in the LiteAttention constructor)"
        )
        q = jnp.transpose(query, (0, 2, 1, 3))
        k = jnp.transpose(key, (0, 2, 1, 3))
        v = jnp.transpose(value, (0, 2, 1, 3))

        bs = self.block_sizes or get_block_sizes(
            d, q.dtype.itemsize,
            kind="lite" if self.enable_skipping else "dense",
        )
        key_sig = (b, s, k.shape[2], h, d, str(q.dtype), bs)
        if self.enable_skipping and (
            self._state is None or self._last_key != key_sig
        ):
            if self._last_key is not None and self._last_key != key_sig:
                if os.getenv("LITE_ATTENTION_VERBOSE", "FALSE") != "FALSE":
                    print(
                        "[Warning]: reinitialized skip list during the "
                        "forward pass"
                    )
            ranges = (
                _ranges_from_flat_list(must_skip_list)
                if must_skip_list
                else None
            )
            self._state = lite_attention_init(
                b,
                h,
                s,
                k.shape[2],
                d,
                q.dtype.itemsize,
                must_skip_ranges=ranges,
                block_sizes=bs,
            )
            self._last_key = key_sig
            self._sched_cache = None

        must_do = None
        if must_do_list is not None and self.enable_skipping:
            must_do = must_do_mask(
                _ranges_from_flat_list(must_do_list), k.shape[2], VOTE_TILE
            )

        state = self._state
        schedule = None
        if self.enable_skipping:
            self._read_mask = state.do_mask
            # Compacted-schedule cache: the mask only changes on vote
            # steps, so between them the gather schedule is reused
            # verbatim instead of re-running compact_mask_gather.
            if self._sched_cache is None:
                if self.adaptive_geometry:
                    bs = self._pick_geometry(state.do_mask, bs)
                self._geom_bs = bs
                bq, bk = effective_blocks(bs, q.shape[2], k.shape[2])
                # Union-compact KV staging (round 5): the wire schedule
                # is emitted in compact-buffer positions so scattered
                # masks become contiguous runs; per-call K|V then passes
                # through compact_kv below. Maps are per mask epoch.
                use_compact = (
                    self.kv_compact and k.shape[2] % VOTE_TILE == 0
                )
                kv_map = None
                if use_compact:
                    kv_map, inv, ucount = kv_union_map(
                        state.do_mask, hk=k.shape[1]
                    )
                    # Union-density gate (host readback, once per mask
                    # epoch -- same cost class as the backoff's
                    # sparsity read): the relayout pays off only when
                    # the cross-q-tile union leaves real holes.
                    # Measured on chip: evolved video self-attention
                    # masks have union density 1.0 (every k-tile is
                    # live for SOME q-tile), where compaction is a pure
                    # ~8 ms/73k-call cost; per-head localized masks
                    # (sparse unions) are the win case.
                    density = float(jnp.mean(ucount)) / float(
                        state.do_mask.shape[3]
                    )
                    if density >= 0.75:
                        kv_map = None
                        self._kv_maps = None
                    else:
                        self._kv_maps = (kv_map, inv)
                else:
                    self._kv_maps = None
                # One Pallas kernel replaces the XLA
                # compact_mask_gather + build_gather_schedule pipeline
                # (argsort + minor-dim gather + relayouts cost ~15 ms
                # at 73k tokens per vote cycle); fidx/count/qbits are
                # recovered as contiguous slices for the vote decode.
                packed = pack_schedule(
                    state.do_mask,
                    qsubs=bq // VOTE_TILE,
                    gsize=bk // VOTE_TILE,
                    seqlen_k=k.shape[2],
                    kv_map=kv_map,
                )
                fidx, count, qbits = unpack_schedule(
                    packed, state.do_mask.shape[3], packed.shape[3] // 3
                )
                self._sched_cache = (fidx, count, qbits, packed)
            else:
                bs = self._geom_bs or bs
            schedule = self._sched_cache
        # Vote on the first call after (re)init and then every
        # vote_stride-th call; in between the mask is reused as-is and
        # the cheaper no-vote kernel runs. With vote_backoff_cap the
        # cadence adapts: see the constructor docstring.
        if self.vote_backoff_cap > 0:
            emit = self._call_count == 0 or (
                self._since_vote >= self._cur_stride
            )
        else:
            emit = self._call_count % self.vote_stride == 0
        self._call_count += 1
        self._since_vote += 1
        if self.enable_skipping:
            # Feed the kernel its own pre-interleaved K|V HBM layout:
            # the lane concat is the buffer's only consumer, so XLA
            # writes the [B,S,H,D]->[B,H,S,D] transposes straight into
            # it and the kernel's in-call interleave (~2x KV bytes of
            # traffic) disappears.
            kvp = pack_kv(k, v)
            kv_args = dict(packed_kv=kvp, seqlen_k=k.shape[2])
            if self._kv_maps is not None:
                # Relayout K|V into the union-compact order the cached
                # schedule's positions address (KV data changes every
                # denoising step, so this runs per call -- one
                # tile-gather pass, ~2x KV bytes).
                kv_map, inv = self._kv_maps
                kv_args["packed_kv"] = compact_kv(kvp, inv)
                kv_args["kv_map"] = kv_map
            k_in = v_in = None
        else:
            kv_args = {}
            k_in, v_in = k, v
        result = lite_attention_step(
            state,
            q,
            k_in,
            v_in,
            threshold=self.threshold,
            scale=scale,
            must_do=must_do,
            enable_skipping=self.enable_skipping,
            block_sizes=bs,
            return_lse=True,
            emit_votes=emit,
            schedule=schedule,
            **kv_args,
        )
        out, lse, new_state = result
        if self.enable_skipping:
            self._state = new_state
            if emit:
                # Change detection (round 5): update_mask is a monotone
                # AND, so an unchanged skipped-tile COUNT implies an
                # unchanged mask -- the cached schedule is still exact
                # and recompaction is skipped (the reference's skip-list
                # writer likewise does no work when no tile dies,
                # mainloop_fwd...hpp:121-192). The readback rides the
                # same host sync the telemetry below already pays.
                live = float(sparsity(new_state.do_mask))
                if live != self._last_vote_live:
                    # the mask shrank; recompact on next call
                    self._sched_cache = None
                self._since_vote = 0
                if self.vote_backoff_cap > 0:
                    if live == self._last_vote_live:
                        self._cur_stride = min(
                            self._cur_stride * 2, self.vote_backoff_cap
                        )
                    else:
                        self._cur_stride = self.vote_stride
                self._last_vote_live = live
            self._last_percentage = float(sparsity(self._read_mask))
            if os.getenv("LITE_ATTENTION_VERBOSE", "FALSE") != "FALSE":
                print(
                    "[Info]: Percentage of tiles skipped: "
                    f"{self._last_percentage:.2%}"
                )
        out = jnp.transpose(out, (0, 2, 1, 3))
        if return_softmax_lse:
            return out, lse
        return out


class SeqParallelLiteAttention:
    """Per-KV-split LiteAttention instances for sequence parallelism.

    API parity with the reference (hopper/lite_attention.py:322-345): one
    independent skip state per KV split; the caller splits KV, passes
    ``split_idx``, and merges partial outputs with
    :func:`liteattention_tpu.ops.combine.combine_attention` (the
    reference's ``flash_attn_combine`` / LSE-merge recipe,
    README.md:199-250). For the mesh-native single-call form see
    :mod:`liteattention_tpu.parallel.seq_parallel`.
    """

    def __init__(
        self,
        num_nodes: int,
        enable_skipping: bool = True,
        threshold: float = -10.0,
        max_batch_size: int = 4,
        block_sizes: Optional[BlockSizes] = None,
        vote_stride: int = 1,
    ):
        self.num_nodes = num_nodes
        self.lite_attention = [
            LiteAttention(
                enable_skipping, threshold, max_batch_size, block_sizes,
                vote_stride=vote_stride,
            )
            for _ in range(num_nodes)
        ]

    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        split_idx: int,
        scale: Optional[float] = None,
        return_softmax_lse: bool = False,
    ):
        assert split_idx < self.num_nodes, (
            "split_idx must be less than num_nodes"
        )
        return self.lite_attention[split_idx](
            query, key, value, scale, return_softmax_lse
        )

    def reset_skip_state(self):
        for la in self.lite_attention:
            la.reset_skip_state()

    def set_threshold(self, threshold: float):
        for la in self.lite_attention:
            la.set_threshold(threshold)

    def enable_skip_optimization(self, enable: bool = True):
        for la in self.lite_attention:
            la.enable_skip_optimization(enable)


__all__ = [
    "LiteAttention",
    "SeqParallelLiteAttention",
    "lite_attention_init",
    "lite_attention_step",
]
