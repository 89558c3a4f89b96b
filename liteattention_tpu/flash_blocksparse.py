"""FA1-era block-sparse attention API (static block masks).

Parity target: ``flash_attn/flash_blocksparse_attn_interface.py`` and
``flash_attn/flash_blocksparse_attention.py`` in the reference — the
conceptual ancestor of LiteAttention's tile skipping. The reference
masks the attention matrix at a fixed **16 x 256** block granularity
(layout rows are 16 q positions, cols are 256 k positions; see
``FlashBlocksparseAttention.forward``,
flash_blocksparse_attention.py:76-81) with a static 0/1 layout, and
``convert_blockmask`` (flash_blocksparse_attn_interface.py:7-40)
re-packs that layout into the CUDA kernel's per-column row-index lists.

TPU design
----------
The skip-masked Pallas kernel already *is* a static block-sparse
attention kernel — its ``attn_read_list`` channel takes a dense bool
tile mask at FINE 128 x 128 granularity
(``flash_attn_interface.flash_attn_func``). So the converted form here
is that fine mask, not an index list (the gather schedule compaction is
the kernel-side analog of the reference's per-column lists, built in
``ops.mask.compact_mask_gather``).

Granularity: a 16 x 256 block mask is exactly representable at
128 x 128 iff every group of 8 consecutive layout rows is identical
(columns always split exactly: 256 = 2 x 128). When it is — the common
case for the DeepSpeed-style fixed/banded/global layouts the reference
feeds this class — the fast kernel runs. When it is not (or with
``causal=True``, dropout, or ragged ``cu_seqlens``), an exact XLA
fallback applies the mask at the reference's own 16 x 256 granularity.
This mirrors the reference's own dispatch philosophy ("flash only where
the kernel supports it", modules/mha.py).

Gradients: the Pallas kernel route is FORWARD-ONLY (the skip-masked
kernel has no custom_vjp — the engine is an inference engine), unlike
the reference's FA1 kernel which is differentiable (it is the BERT
training kernel). Pass ``trainable=True`` to route to the exact XLA
fallback, which is safely differentiable (finite -1e30 masking, so
fully-masked rows produce zero output AND zero gradients).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from liteattention_tpu.flash_attn_interface import flash_attn_func

BLOCK_ROWS = 16   # q positions per layout row (reference granularity)
BLOCK_COLS = 256  # k positions per layout col

# Finite mask value (repo convention, e.g. tools/chip_parity_smoke):
# keeps the softmax NaN-free on fully-masked rows so the fallback is
# differentiable — -inf would survive the jnp.where as NaN gradients.
_MASK_VALUE = -1e30


def convert_blockmask(blockmask, causal: bool = False) -> np.ndarray:
    """Convert a 0/1 layout to the form the TPU kernel consumes.

    Reference: ``convert_blockmask``
    (flash_blocksparse_attn_interface.py:7-40) converts (row, col) 0/1
    to the CUDA kernel's per-column row-index lists. The TPU kernel's
    native form is a dense bool FINE tile mask, so this returns the
    128 x 128 OR-expansion ``[nrow*16/128, ncol*256/128]`` (bool,
    host-side numpy — the layout is a static buffer in the reference
    too, registered in ``FlashBlocksparseAttention.__init__``).

    The expansion is exact (no extra attention) iff the layout is
    uniform within each 8-row group; ``flash_blocksparse_attn_func``
    checks that and falls back to an exact XLA path otherwise.
    """
    assert not causal, "causal + blockmask is handled by the caller"
    bm = np.asarray(blockmask) != 0
    nrow, ncol = bm.shape
    # Pad rows up to a multiple of 8 (OR over the group).
    pad = (-nrow) % 8
    if pad:
        bm = np.concatenate([bm, np.zeros((pad, ncol), bool)], axis=0)
    fine_q = bm.reshape(-1, 8, ncol).any(axis=1)          # [Qt, ncol]
    fine = np.repeat(fine_q, BLOCK_COLS // 128, axis=1)   # [Qt, Kt]
    return fine


def _row_group_uniform(blockmask: np.ndarray) -> bool:
    bm = np.asarray(blockmask) != 0
    for g0 in range(0, bm.shape[0], 8):
        grp = bm[g0:g0 + 8]
        if not (grp == grp[0]).all():
            return False
    return True


def _blockmask_elementwise(blockmask, sq: int, sk: int) -> jax.Array:
    """Expand the (row, col) layout to an [sq, sk] bool element mask at
    the reference's exact 16 x 256 granularity."""
    bm = jnp.asarray(np.asarray(blockmask) != 0)
    el = jnp.repeat(jnp.repeat(bm, BLOCK_ROWS, axis=0), BLOCK_COLS,
                    axis=1)
    return el[:sq, :sk]


def _fallback_attention(
    q, k, v, element_mask, softmax_scale, causal, key_valid=None,
    dropout_p=0.0, dropout_rng=None, return_attn_probs=False,
):
    """Exact XLA block-sparse attention, [B, S, H, D] layout.

    Numerically the reference kernel's semantics: masked blocks are
    excluded from the softmax; fully-masked rows produce 0 output
    (flash kernels' empty-row convention, ops/flash_fwd.py epilogue).
    Masking uses a large finite negative (see ``_MASK_VALUE``) so the
    path is differentiable even with fully-masked rows.

    With ``return_attn_probs`` returns ``(out, probs, lse)`` — lse is
    the natural-log row logsumexp ``[B, H, Sq]`` (flash convention;
    -inf on fully-masked rows), matching the reference's
    ``(context, S_dmask, softmax_lse)`` triple.
    """
    if dropout_p > 0.0 and dropout_rng is None:
        raise ValueError(
            "dropout_p > 0 requires dropout_rng (pass dropout_rng= / "
            "the module's __call__(dropout_rng=) when training=True)")
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    mask = element_mask[None, None]
    if causal:
        mask = jnp.logical_and(
            mask,
            jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)[None, None],
        )
    if key_valid is not None:  # [B, sk] bool
        mask = jnp.logical_and(mask, key_valid[:, None, None, :])
    scores = jnp.where(mask, scores, _MASK_VALUE)
    row_any = mask.any(axis=-1, keepdims=True)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(row_any, probs, 0.0)
    if dropout_p > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p,
                                    probs.shape)
        probs = probs * keep / (1.0 - dropout_p)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    out = out.astype(q.dtype)
    if not return_attn_probs:
        return out
    lse = jax.scipy.special.logsumexp(
        jnp.where(mask, scores, -jnp.inf), axis=-1)  # [B, H, Sq]
    return out, probs, lse


def flash_blocksparse_attn_func(
    qkv: jax.Array,
    cu_seqlens: jax.Array,
    blockmask,
    dropout_p: float = 0.0,
    max_s: Optional[int] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    return_attn_probs: bool = False,
    convert_mask: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    trainable: bool = False,
):
    """Block-sparse attention on packed varlen QKV.

    Parity target: ``flash_blocksparse_attn_func`` (reference
    flash_blocksparse_attn_interface.py:185-201). ``qkv`` is
    ``[total, 3, H, D]`` with ``cu_seqlens`` boundaries; ``blockmask``
    is the static 0/1 layout ``[ceil(S/16), ceil(S/256)]`` shared by
    all sequences (``convert_mask=False`` means it is already the
    converted fine mask from :func:`convert_blockmask`).

    Dispatch: equal-length batch + non-causal + no dropout + a
    128-representable mask runs the skip-masked Pallas kernel
    (static ``attn_read_list``); anything else runs the exact XLA
    fallback at the reference's native 16 x 256 granularity.

    The kernel route is FORWARD-ONLY (no custom_vjp on the sparse
    channel), while the reference FA1 kernel is differentiable. Pass
    ``trainable=True`` to force the differentiable XLA fallback when
    gradients are needed.

    With ``return_attn_probs`` returns the reference-shaped triple
    ``(out, probs, lse)`` (probs/lse on the PADDED ``[B, max_s]``
    layout; lse natural-log ``[B, H, max_s]``).
    """
    cu = np.asarray(cu_seqlens)
    lens = cu[1:] - cu[:-1]
    batch = len(lens)
    max_s = int(max_s if max_s is not None else lens.max())
    bm_np = np.asarray(blockmask)
    representable = (not convert_mask) or _row_group_uniform(bm_np)
    fine = (convert_blockmask(bm_np, causal=False) if convert_mask
            else bm_np != 0)

    equal = bool((lens == lens[0]).all())
    if (equal and representable and not causal and dropout_p == 0.0
            and not return_attn_probs and not trainable):
        s = int(lens[0])
        h, d = qkv.shape[-2], qkv.shape[-1]
        q, k, v = (qkv[:, i].reshape(batch, s, h, d) for i in range(3))
        qt, kt = -(-s // 128), -(-s // 128)
        read = jnp.asarray(fine[:qt, :kt])
        read = jnp.broadcast_to(read[None, None],
                                (batch, q.shape[2], qt, kt))
        out = flash_attn_func(
            q, k, v, softmax_scale=softmax_scale,
            attn_read_list=read,
        )
        return out.reshape(batch * s, h, d)  # [total, H, D] (reference)

    # Exact fallback: pad each sequence to max_s, mask invalid keys.
    h, d = qkv.shape[-2], qkv.shape[-1]
    pads = []
    for i in range(batch):
        seg = qkv[cu[i]:cu[i + 1]]
        pads.append(jnp.pad(seg, ((0, max_s - int(lens[i])), (0, 0),
                                  (0, 0), (0, 0))))
    packed = jnp.stack(pads)                     # [B, max_s, 3, H, D]
    q, k, v = packed[:, :, 0], packed[:, :, 1], packed[:, :, 2]
    key_valid = (jnp.arange(max_s)[None, :]
                 < jnp.asarray(lens, jnp.int32)[:, None])
    if convert_mask:
        el = _blockmask_elementwise(bm_np, max_s, max_s)
    else:  # blockmask already the converted fine 128x128 form
        el = jnp.repeat(jnp.repeat(jnp.asarray(fine), 128, axis=0),
                        128, axis=1)[:max_s, :max_s]
    res = _fallback_attention(
        q, k, v, el, softmax_scale, causal, key_valid=key_valid,
        dropout_p=dropout_p, dropout_rng=dropout_rng,
        return_attn_probs=return_attn_probs,
    )
    out, probs, lse = res if return_attn_probs else (res, None, None)
    flat = jnp.concatenate(
        [out[i, : int(lens[i])] for i in range(batch)], axis=0)
    return (flat, probs, lse) if return_attn_probs else flat


class FlashBlocksparseAttention:
    """Stateful wrapper mirroring ``FlashBlocksparseAttention``
    (reference flash_blocksparse_attention.py:15-135).

    Takes a concrete layout array (or an object exposing
    ``make_layout(max_seq_length)`` — the reference's hydra-built
    DeepSpeed ``sparsity_config``) and applies block-sparse attention
    to ``[B, S, 3, H, D]`` packed QKV. ``key_padding_mask`` is a bool
    ``[B, S]`` matrix (True = keep), applied by masking keys in place
    and zeroing padded query rows. NOTE a semantics delta from the
    reference: the reference unpads/COMPACTS tokens (the blockmask then
    indexes compacted positions, flash_blocksparse_attention.py:84-100)
    — equivalent to this in-place form only for TRAILING padding, the
    layout every collator here produces. Non-contiguous padding masks
    would index the blockmask at different (shifted) positions in the
    reference; compact such batches yourself before calling.

    Returns ``(output, None)`` like the reference's
    ``forward -> (output, attn_weights)``.
    """

    def __init__(self, sparsity_config, softmax_temp=None,
                 attention_dropout: float = 0.0,
                 max_seq_length: int = 2048):
        max_seq_length = -(-max_seq_length // 256) * 256
        if hasattr(sparsity_config, "make_layout"):
            layout = np.asarray(sparsity_config.make_layout(
                max_seq_length))
        else:
            layout = np.asarray(sparsity_config)
        assert layout.shape[0] >= max_seq_length // BLOCK_ROWS and \
            layout.shape[1] >= max_seq_length // BLOCK_COLS, (
                f"layout {layout.shape} too small for "
                f"max_seq_length={max_seq_length}")
        self.layout = layout
        self.softmax_temp = softmax_temp
        self.dropout_p = float(attention_dropout)

    def __call__(self, qkv, key_padding_mask=None, causal: bool = False,
                 training: bool = False, dropout_rng=None):
        b, s = qkv.shape[0], qkv.shape[1]
        s_rounded = -(-s // 256) * 256
        bm = self.layout[: s_rounded // BLOCK_ROWS,
                         : s_rounded // BLOCK_COLS]
        dropout_p = self.dropout_p if training else 0.0
        if key_padding_mask is None and dropout_p == 0.0:
            cu = np.arange(0, (b + 1) * s, s, dtype=np.int32)
            flat = flash_blocksparse_attn_func(
                qkv.reshape(b * s, *qkv.shape[2:]), cu, bm,
                dropout_p=0.0, max_s=s,
                softmax_scale=self.softmax_temp, causal=causal,
            )
            return flat.reshape(b, s, *flat.shape[1:]), None
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        el = _blockmask_elementwise(bm, s, s)
        out = _fallback_attention(
            q, k, v, el, self.softmax_temp, causal,
            key_valid=key_padding_mask, dropout_p=dropout_p,
            dropout_rng=dropout_rng,
        )
        if key_padding_mask is not None:
            # Reference pad_input zero-fills padded rows on re-pad
            # (bert_padding.py); mirror that at padded QUERY rows.
            out = out * key_padding_mask[:, :, None, None].astype(out.dtype)
        return out, None
