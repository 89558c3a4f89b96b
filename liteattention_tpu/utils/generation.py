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


def sample_token(
    logits: jax.Array,
    rng: Optional[jax.Array],
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Sample next tokens from [B, V] logits (reference ``sample``,
    flash_attn/utils/generation.py:73-110; top-k then top-p then
    temperature, greedy when temperature == 0 or rng is None)."""
    if rng is None or temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    lf = logits.astype(jnp.float32)
    if top_k > 0:
        kth = jnp.sort(lf, axis=-1)[:, -top_k][:, None]
        lf = jnp.where(lf < kth, -jnp.inf, lf)
    if top_p > 0.0:
        sorted_lf = jnp.sort(lf, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_lf, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Smallest logit still inside the nucleus.
        inside = cum - probs < top_p
        cutoff = jnp.min(
            jnp.where(inside, sorted_lf, jnp.inf), axis=-1, keepdims=True
        )
        lf = jnp.where(lf < cutoff, -jnp.inf, lf)
    return jax.random.categorical(rng, lf / temperature, axis=-1)


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


__all__ = [
    "greedy_decode",
    "sample_token",
    "InferenceParams",
    "quantize_inference_cache",
]
