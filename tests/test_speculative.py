"""Speculative decoding (reference flash_attn/utils/generation.py:209-564)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from liteattention_tpu.utils.generation import (
    decode_speculative,
    greedy_decode,
    sample_speculative,
)


def test_sample_speculative_greedy_prefix():
    """Greedy mode: accept exactly the prefix matching the main argmax,
    then emit the main argmax at the first mismatch."""
    b, s, v = 2, 4, 16
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, s + 1, v), jnp.float32)
    main_tok = np.asarray(jnp.argmax(logits, -1))
    draft = main_tok[:, :s].copy()
    draft[0, 2] = (draft[0, 2] + 1) % v  # mismatch at position 2, row 0
    toks, n = sample_speculative(
        logits, jnp.asarray(rng.randn(b, s, v), jnp.float32),
        jnp.asarray(draft),
    )
    toks, n = np.asarray(toks), np.asarray(n)
    assert n[0] == 3  # d_0, d_1 accepted + corrected token
    assert toks[0, 2] == main_tok[0, 2]
    assert n[1] == s + 1  # full acceptance + bonus
    np.testing.assert_array_equal(toks[1, :s], draft[1])
    assert toks[1, s] == main_tok[1, s]


def test_sample_speculative_identical_dists_accept_all():
    """u * q(tok) <= p(tok) always holds when p == q: every draft token
    accepted, bonus drawn from the last distribution."""
    b, s, v = 3, 5, 32
    key = jax.random.PRNGKey(1)
    logits = jax.random.normal(key, (b, s + 1, v))
    draft_tok = jax.random.randint(
        jax.random.PRNGKey(2), (b, s), 0, v
    )
    toks, n = sample_speculative(
        logits, logits[:, :s], draft_tok,
        rng=jax.random.PRNGKey(3), temperature=0.7, top_k=8,
    )
    assert np.asarray(n).tolist() == [s + 1] * b
    np.testing.assert_array_equal(np.asarray(toks)[:, :s],
                                  np.asarray(draft_tok))


@pytest.mark.parametrize("lookahead", [1, 3])
def test_speculative_greedy_matches_plain_greedy(lookahead):
    """The defining invariant: speculative greedy decoding reproduces
    plain greedy decoding token-for-token, for ANY draft model --
    here a differently-initialized (i.e. bad) draft."""
    cfg = GPTConfig.tiny()
    model = GPTLMHeadModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0,
                             cfg.vocab_size)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
    params_draft = jax.jit(model.init)(jax.random.PRNGKey(7), ids)
    apply_fn = lambda p, i, inf: model.apply(p, i, inference_params=inf)
    ref = greedy_decode(apply_fn, params, ids, max_new_tokens=7,
                        max_seqlen=32)
    spec, stats = decode_speculative(
        apply_fn, params, apply_fn, params_draft, ids,
        max_new_tokens=7, max_seqlen=32,
        speculative_lookahead=lookahead, return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(spec))
    assert sum(stats["accepted_per_round"]) == 7 - 1


def test_speculative_self_draft_accepts_everything():
    """Draft == main in greedy mode: every round fully accepts
    (lookahead + 1 tokens), exercising the 2-token draft catch-up step."""
    cfg = GPTConfig.tiny()
    model = GPTLMHeadModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0,
                             cfg.vocab_size)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
    apply_fn = lambda p, i, inf: model.apply(p, i, inference_params=inf)
    ref = greedy_decode(apply_fn, params, ids, max_new_tokens=9,
                        max_seqlen=32)
    spec, stats = decode_speculative(
        apply_fn, params, apply_fn, params, ids,
        max_new_tokens=9, max_seqlen=32, speculative_lookahead=3,
        return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(spec))
    # rounds of 4, 4 (then done): at least one full-accept round, so the
    # pending-token (2-token draft input) path ran.
    assert stats["accepted_per_round"][0] == 4


def test_speculative_sampling_runs_and_is_valid():
    """Sampled mode: tokens in range, correct count, deterministic under
    a fixed key."""
    cfg = GPTConfig.tiny()
    model = GPTLMHeadModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 0,
                             cfg.vocab_size)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), ids)
    apply_fn = lambda p, i, inf: model.apply(p, i, inference_params=inf)
    kw = dict(max_new_tokens=6, max_seqlen=32, speculative_lookahead=2,
              temperature=0.8, top_k=16)
    s1 = decode_speculative(apply_fn, params, apply_fn, params, ids,
                            rng=jax.random.PRNGKey(5), **kw)
    s2 = decode_speculative(apply_fn, params, apply_fn, params, ids,
                            rng=jax.random.PRNGKey(5), **kw)
    assert s1.shape == (1, 5 + 6)
    assert ((np.asarray(s1) >= 0) & (np.asarray(s1) < cfg.vocab_size)).all()
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_sample_token_filter_order_matches_acceptance_dist():
    """Regression (review r3): top-p must be applied to the
    temperature-SCALED logits (reference sample(), generation.py:82-85),
    the same distribution sample_speculative scores p_draft with. With
    T<1 the scaled nucleus is smaller; the old unscaled-nucleus
    sample_token could emit tokens that the acceptance test assigns
    probability zero."""
    from liteattention_tpu.utils.generation import (
        _filter_logits,
        sample_token,
    )

    v, temp, top_p = 32, 0.4, 0.6
    logits = jnp.asarray(
        np.random.RandomState(0).randn(1, v) * 2.0, jnp.float32
    )
    allowed = np.asarray(
        _filter_logits(logits / temp, 0, top_p)[0]
    ) > -np.inf
    keys = jax.random.split(jax.random.PRNGKey(1), 512)
    toks = jax.vmap(
        lambda k: sample_token(logits, k, temp, 0, top_p)[0]
    )(keys)
    assert allowed[np.asarray(toks)].all()
    # The unscaled nucleus is strictly larger here, so the old order
    # would have sampled outside `allowed` with high probability.
    allowed_unscaled = np.asarray(
        _filter_logits(logits, 0, top_p)[0]
    ) > -np.inf
    assert allowed_unscaled.sum() > allowed.sum()
