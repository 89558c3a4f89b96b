"""Autoregressive decoding utilities.

TPU-native counterpart of the reference's generation stack
(reference flash_attn/utils/generation.py:740 -- ``InferenceParams``,
greedy/top-k/top-p sampling, and a CUDA-graph-cached decode loop). On
TPU the CUDA-graph trick is simply ``jit``: the per-token step compiles
once and replays; the KV cache is a fixed-capacity buffer updated with
``dynamic_update_slice`` inside the step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from liteattention_tpu.modules.mha import InferenceParams


def _filter_logits(
    lf: jax.Array, top_k: int, top_p: float
) -> jax.Array:
    """Top-k then top-p filtering on [..., V] float32 logits (reference
    modify_logits_for_top_k/top_p_filtering,
    flash_attn/utils/generation.py:45-66)."""
    if top_k > 0:
        kth = jnp.sort(lf, axis=-1)[..., -top_k, None]
        lf = jnp.where(lf < kth, -jnp.inf, lf)
    if top_p > 0.0:
        sorted_lf = jnp.flip(jnp.sort(lf, axis=-1), axis=-1)
        probs = jax.nn.softmax(sorted_lf, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Smallest logit still inside the nucleus.
        inside = cum - probs < top_p
        cutoff = jnp.min(
            jnp.where(inside, sorted_lf, jnp.inf), axis=-1, keepdims=True
        )
        lf = jnp.where(lf < cutoff, -jnp.inf, lf)
    return lf


def sample_token(
    logits: jax.Array,
    rng: Optional[jax.Array],
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Sample next tokens from [B, V] logits (reference ``sample``,
    flash_attn/utils/generation.py:69-96: top-k on raw logits — the
    selection is scale-invariant — then /temperature, then top-p on the
    SCALED logits; greedy when temperature == 0 or rng is None).

    The filter order must match :func:`sample_speculative` exactly (it
    scales before filtering, same effective semantics): speculative
    acceptance assumes ``p_draft`` is the distribution the draft tokens
    were actually drawn from."""
    if rng is None or temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    lf = _filter_logits(
        logits.astype(jnp.float32) / temperature, top_k, top_p
    )
    return jax.random.categorical(rng, lf, axis=-1)


def sample_speculative(
    logits: jax.Array,
    logits_draft: jax.Array,
    tokens_draft: jax.Array,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
):
    """Speculative rejection sampling, Algorithm 1 of arXiv:2211.17192
    (reference ``sample_speculative``,
    flash_attn/utils/generation.py:209-267).

    ``logits [B, S+1, V]`` are the main model's distributions at the S
    draft positions plus the bonus position; ``logits_draft [B, S, V]``
    are the distributions each draft token was sampled from. Returns
    ``(tokens [B, S+1], num_generated [B])`` with ``num_generated`` in
    [1, S+1]: the accepted draft prefix followed by one token resampled
    from the clipped residual ``max(p - q, 0)`` (or, on full acceptance,
    a bonus token from the last main distribution). Greedy mode
    (``rng is None`` / ``temperature == 0``) reduces to exact
    prefix-matching against the main argmax, so speculative greedy
    decoding reproduces plain greedy decoding token-for-token."""
    b, sp1, _ = logits.shape
    s = sp1 - 1
    assert logits_draft.shape[:2] == (b, s)
    assert tokens_draft.shape == (b, s)
    if rng is None or temperature == 0.0:
        main_tok = jnp.argmax(logits, axis=-1)  # (b, s+1)
        accepted = tokens_draft == main_tok[:, :-1]
        acc_all = jnp.all(accepted, axis=-1)
        first_rej = jnp.where(
            acc_all, s, jnp.argmin(accepted, axis=-1)
        )
        # One-hot distributions: the residual max(p - q, 0) at a
        # rejected position is exactly the main argmax; the bonus on
        # full acceptance is the last main argmax.
        resample = jnp.take_along_axis(
            main_tok, first_rej[:, None], axis=1
        )[:, 0]
    else:
        lf = _filter_logits(
            logits.astype(jnp.float32) / temperature, top_k, top_p
        )
        ld = _filter_logits(
            logits_draft.astype(jnp.float32) / temperature, top_k, top_p
        )
        probs = jax.nn.softmax(lf, axis=-1)
        probs_draft = jax.nn.softmax(ld, axis=-1)
        r_acc, r_res = jax.random.split(rng)
        u = jax.random.uniform(r_acc, (b, s))
        p_main = jnp.take_along_axis(
            probs[:, :-1], tokens_draft[..., None], axis=-1
        )[..., 0]
        p_draft = jnp.take_along_axis(
            probs_draft, tokens_draft[..., None], axis=-1
        )[..., 0]
        accepted = u * p_draft <= p_main
        acc_all = jnp.all(accepted, axis=-1)
        first_rej = jnp.where(
            acc_all, s, jnp.argmin(accepted, axis=-1)
        )
        residual = jnp.clip(probs[:, :-1] - probs_draft, 0.0)
        resample_probs = jnp.concatenate(
            [residual, probs[:, -1:]], axis=1
        )  # (b, s+1, v)
        row = jnp.take_along_axis(
            resample_probs, first_rej[:, None, None], axis=1
        )[:, 0]
        # Identical p and q make the residual empty; fall back to p.
        p_row = jnp.take_along_axis(
            probs, first_rej[:, None, None], axis=1
        )[:, 0]
        row = jnp.where(row.sum(-1, keepdims=True) > 1e-9, row, p_row)
        resample = jax.random.categorical(
            r_res,
            jnp.where(row > 0, jnp.log(jnp.maximum(row, 1e-37)), -jnp.inf),
            axis=-1,
        )
    tokens = jnp.concatenate(
        [tokens_draft, jnp.zeros((b, 1), tokens_draft.dtype)], axis=1
    )
    tokens = jnp.where(
        jnp.arange(sp1)[None] == first_rej[:, None],
        resample[:, None].astype(tokens.dtype),
        tokens,
    )
    return tokens, first_rej + 1


def quantize_inference_cache(inference_params) -> None:
    """int8-quantize every layer's decode cache in place (after
    prefill): per-(batch, head, channel) scales calibrated over the
    prefill region -- the capacity beyond it is zero-filled and never
    raises the absmax. Subsequent MHA decode steps append with the
    frozen scales and attend on the halved HBM stream (decode is
    bandwidth-bound: ~1.9x steps/s at large caches, DECODE_BENCH.json).
    """
    from liteattention_tpu.ops.kv_quant import quantize_kv_cache_native

    cache = inference_params.key_value_memory_dict
    for layer, entry in cache.items():
        if len(entry) == 2:
            kc, vc = entry
            cache[layer] = tuple(quantize_kv_cache_native(kc, vc))


def greedy_decode(
    apply_fn: Callable,
    params,
    input_ids: jax.Array,
    max_new_tokens: int,
    max_seqlen: int,
    rng: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    eos_token_id: Optional[int] = None,
    quantize_cache: bool = False,
):
    """Prefill + per-token decode with a persistent KV cache.

    ``apply_fn(params, ids, inference_params) -> logits`` is the model's
    apply (e.g. ``GPTLMHeadModel``). Mirrors the reference ``decode``
    (flash_attn/utils/generation.py:113-230): one prefill pass, then
    single-token steps against the cache. The token loop is a Python
    loop over a jitted step, so step 2..N replay one compiled program --
    the TPU version of the reference's CUDA-graph cache.

    ``quantize_cache=True`` int8-quantizes the KV cache once after
    prefill (:func:`quantize_inference_cache`); decode then streams
    half the cache bytes per step at ~1.4e-2 rel-L2 attention-output
    error (tests/test_kv_quant.py).
    """
    b, prompt_len = input_ids.shape
    inference_params = InferenceParams(
        max_seqlen=max_seqlen, max_batch_size=b
    )
    logits = apply_fn(params, input_ids, inference_params)
    inference_params.seqlen_offset = prompt_len
    if quantize_cache:
        quantize_inference_cache(inference_params)
    tokens = [input_ids]
    finished = jnp.zeros((b,), bool)
    cur_rng = rng
    next_tok = sample_token(
        logits[:, -1], cur_rng, temperature, top_k, top_p
    )
    for _ in range(max_new_tokens):
        tokens.append(next_tok[:, None])
        if eos_token_id is not None:
            finished = finished | (next_tok == eos_token_id)
        logits = apply_fn(params, next_tok[:, None], inference_params)
        inference_params.seqlen_offset += 1
        if cur_rng is not None:
            cur_rng, step_rng = jax.random.split(cur_rng)
        else:
            step_rng = None
        next_tok = sample_token(
            logits[:, -1], step_rng, temperature, top_k, top_p
        )
        if eos_token_id is not None and bool(finished.all()):
            break
    return jnp.concatenate(tokens, axis=1)


def decode_speculative(
    apply_fn: Callable,
    params,
    apply_fn_draft: Callable,
    params_draft,
    input_ids: jax.Array,
    max_new_tokens: int,
    max_seqlen: int,
    speculative_lookahead: int = 3,
    rng: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    return_stats: bool = False,
):
    """Speculative decoding with a draft model (reference
    ``decode_speculative``, flash_attn/utils/generation.py:269-564).

    Each round the draft model autoregressively proposes
    ``speculative_lookahead`` tokens (single-token steps against its own
    KV cache), the main model scores all of them PLUS the bonus position
    in ONE multi-token kv-cache step (the sq>1 decode path of the flash
    kernels), and :func:`sample_speculative` accepts a prefix. Cache
    rollback is free on TPU: both caches are fixed-capacity buffers, so
    rejecting tokens just moves ``seqlen_offset`` back and the stale
    rows are overwritten by the next round (never attended -- the
    per-batch bound masks them). Like the reference, batch size 1 only.

    The draft model's first step of a round consumes 1 token (the last
    accepted token) or, after a fully-accepted round, 2 tokens (the last
    draft token it never ingested + the bonus token) -- the reference's
    ``decoding_seqlens=(1, 2)`` CUDA-graph pair becomes two jit
    specializations.

    In greedy mode the output is token-for-token identical to
    :func:`greedy_decode` on the main model, for ANY draft model -- the
    defining invariant of speculative decoding.

    ``return_stats=True`` additionally returns
    ``{"accepted_per_round": [...], "rounds": N}``.
    """
    b, prompt_len = input_ids.shape
    assert b == 1, "speculative decoding supports batch_size=1 (ref parity)"
    if max_new_tokens <= 0:
        return (input_ids, {"accepted_per_round": [], "rounds": 0}
                ) if return_stats else input_ids
    lookahead = max(1, speculative_lookahead)
    inf_main = InferenceParams(max_seqlen=max_seqlen, max_batch_size=b)
    inf_draft = InferenceParams(max_seqlen=max_seqlen, max_batch_size=b)
    logits = apply_fn(params, input_ids, inf_main)
    inf_main.seqlen_offset = prompt_len
    apply_fn_draft(params_draft, input_ids, inf_draft)
    inf_draft.seqlen_offset = prompt_len

    cur_rng = [rng]

    def next_rng():
        if cur_rng[0] is None:
            return None
        cur_rng[0], r = jax.random.split(cur_rng[0])
        return r

    last = sample_token(
        logits[:, -1], next_rng(), temperature, top_k, top_p
    )  # (b,)
    out = [input_ids, last[:, None]]
    n_done = 1
    hist = prompt_len  # tokens strictly before `last`, cached in main
    pending = None  # draft-unseen token preceding `last` (full accept)
    accepted_per_round = []

    while n_done < max_new_tokens:
        L = min(lookahead, max_new_tokens - n_done)
        # 1) Draft proposes L tokens (keeps the logits each was drawn
        # from). Its first input also carries the pending token.
        if pending is not None:
            x = jnp.concatenate([pending[:, None], last[:, None]], 1)
        else:
            x = last[:, None]
        d_tokens, d_logits = [], []
        for _ in range(L):
            lg = apply_fn_draft(params_draft, x, inf_draft)
            inf_draft.seqlen_offset += x.shape[1]
            d_logits.append(lg[:, -1])
            tok = sample_token(
                lg[:, -1], next_rng(), temperature, top_k, top_p
            )
            d_tokens.append(tok)
            x = tok[:, None]
        tokens_draft = jnp.stack(d_tokens, 1)  # (b, L)
        logits_draft = jnp.stack(d_logits, 1)  # (b, L, V)
        # 2) Main verifies [last, d_1..d_L] in one multi-token step.
        ver_in = jnp.concatenate([last[:, None], tokens_draft], 1)
        lg_main = apply_fn(params, ver_in, inf_main)  # (b, L+1, V)
        inf_main.seqlen_offset += L + 1
        toks, n_acc = sample_speculative(
            lg_main, logits_draft, tokens_draft, next_rng(),
            temperature, top_k, top_p,
        )
        n = min(int(n_acc[0]), max_new_tokens - n_done)
        out.append(toks[:, :n])
        last = toks[:, n - 1]
        accepted_per_round.append(n)
        n_done += n
        # 3) Roll both caches back to the accepted history. Main
        # absorbed L+1 rows (last, d_1..d_L); valid = n. Draft absorbed
        # through d_{L-1}; on full acceptance it never saw d_L.
        hist += n
        inf_main.seqlen_offset = hist
        if n == L + 1:
            pending = tokens_draft[:, L - 1]
            assert inf_draft.seqlen_offset == hist - 1
        else:
            pending = None
            inf_draft.seqlen_offset = hist
    seq = jnp.concatenate(out, axis=1)
    if return_stats:
        return seq, {
            "accepted_per_round": accepted_per_round,
            "rounds": len(accepted_per_round),
        }
    return seq


__all__ = [
    "greedy_decode",
    "sample_token",
    "sample_speculative",
    "decode_speculative",
    "InferenceParams",
    "quantize_inference_cache",
]
