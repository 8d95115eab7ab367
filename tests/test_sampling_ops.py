"""In-jit sampler pipeline tests (reference analog: tests/test_sampler.py):
greedy, temperature, top-k/top-p/min-p/typical filtering, penalties, and
degenerate-input recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minivllm_tpu.sampling.ops import SamplingState, make_state, sample_tokens
from minivllm_tpu.sampling_params import SamplingParams

KEY = jax.random.PRNGKey(0)


def state_of(**kw):
    return make_state([SamplingParams(**kw)], 1)


def sample_many(logits, state, n=400, **kw):
    toks = []
    for i in range(n):
        toks.append(
            int(sample_tokens(logits, state, jax.random.fold_in(KEY, i), **kw)[0])
        )
    return toks


def test_greedy_picks_argmax():
    logits = jnp.asarray([[0.1, 3.0, 0.2, -1.0]])
    st = state_of(temperature=0.0)
    for wf in (True, False):
        assert int(sample_tokens(logits, st, KEY, with_filters=wf)[0]) == 1


def test_top_k_restricts_support():
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    st = state_of(temperature=1.0, top_k=2)
    toks = sample_many(logits, st, 200)
    assert set(toks) <= {0, 1}
    assert len(set(toks)) == 2  # both top-2 appear


def test_top_p_restricts_support():
    # probs ~ [0.97, 0.018, ...]: top_p=0.9 keeps only token 0
    logits = jnp.asarray([[8.0, 4.0, 3.0, 2.0, 1.0]])
    st = state_of(temperature=1.0, top_p=0.9)
    assert set(sample_many(logits, st, 100)) == {0}


def test_min_p_threshold():
    # max prob ~0.64; min_p=0.5 keeps tokens with p >= 0.32 -> only 0 and 1
    logits = jnp.asarray([[3.0, 2.3, 0.0, -1.0, -2.0]])
    st = state_of(temperature=1.0, min_p=0.5)
    assert set(sample_many(logits, st, 300)) <= {0, 1}


def test_typical_p_filters_unusual():
    logits = jnp.asarray([[4.0, 4.0, 4.0, 4.0, -8.0]])
    st = state_of(temperature=1.0, typical_p=0.5)
    toks = sample_many(logits, st, 200, typical_active=True)
    assert 4 not in set(toks)
    # the typical path must also still honor top-k etc. in the same pass
    st2 = state_of(temperature=1.0, typical_p=0.99, top_k=2)
    toks2 = sample_many(logits, st2, 100, typical_active=True)
    assert set(toks2) <= {0, 1, 2, 3}


def test_fast_path_candidate_pool_exactness():
    """Fast path (top-k candidates) must match the exact full-sort path's
    support on a distribution whose top-p cutoff is inside the pool."""
    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.normal(0, 2, (2, 2048)), jnp.float32)
    st = make_state([SamplingParams(temperature=1.0, top_p=0.7, top_k=10)] * 2, 2)
    fast = {int(sample_tokens(logits, st, jax.random.fold_in(KEY, i))[0])
            for i in range(200)}
    exact = {int(sample_tokens(logits, st, jax.random.fold_in(KEY, i),
                               typical_active=True)[0])
             for i in range(200)}
    # identical support under both implementations
    assert fast == exact


def test_temperature_sharpens():
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    cold = sample_many(logits, state_of(temperature=0.1), 200)
    hot = sample_many(logits, state_of(temperature=5.0), 200)
    assert np.mean(np.array(cold) == 0) > np.mean(np.array(hot) == 0)
    assert len(set(hot)) >= 3  # hot explores


def test_per_row_params_vectorized():
    logits = jnp.tile(jnp.asarray([[5.0, 4.0, 3.0, 2.0]]), (2, 1))
    st = make_state(
        [SamplingParams(temperature=0.0), SamplingParams(temperature=1.0, top_k=1)],
        2,
    )
    toks = sample_tokens(logits, st, KEY, with_filters=True)
    assert int(toks[0]) == 0 and int(toks[1]) == 0


def test_repetition_penalty_suppresses_seen():
    logits = jnp.asarray([[1.0, 0.9, -1.0]])
    st = make_state([SamplingParams(temperature=0.0, repetition_penalty=5.0)], 1)
    all_t = jnp.asarray([[0, -1, -1]])
    out_t = jnp.asarray([[0, -1, -1]])
    tok = sample_tokens(logits, st, KEY, all_tokens=all_t, out_tokens=out_t,
                        with_filters=True)
    assert int(tok[0]) == 1  # token 0 penalized below token 1


def test_repetition_penalty_negative_logits():
    # seen token with negative logit gets *more* negative (x * p)
    logits = jnp.asarray([[-0.5, -0.6, -5.0]])
    st = make_state([SamplingParams(temperature=0.0, repetition_penalty=3.0)], 1)
    all_t = jnp.asarray([[0, -1]])
    out_t = jnp.asarray([[-1, -1]])
    tok = sample_tokens(logits, st, KEY, all_tokens=all_t, out_tokens=out_t,
                        with_filters=True)
    assert int(tok[0]) == 1


def test_frequency_penalty_counts():
    logits = jnp.asarray([[1.0, 0.95, -9.0]])
    st = make_state([SamplingParams(temperature=0.0, frequency_penalty=0.1)], 1)
    out_t = jnp.asarray([[0, 0, 0, -1]])  # token 0 emitted 3x -> -0.3
    all_t = out_t
    tok = sample_tokens(logits, st, KEY, all_tokens=all_t, out_tokens=out_t,
                        with_filters=True)
    assert int(tok[0]) == 1


def test_presence_penalty_once():
    logits = jnp.asarray([[1.0, 0.95, -9.0]])
    st = make_state([SamplingParams(temperature=0.0, presence_penalty=0.1)], 1)
    out_t = jnp.asarray([[0, 0, 0, -1]])  # presence: only -0.1 despite 3x
    tok = sample_tokens(logits, st, KEY, all_tokens=out_t, out_tokens=out_t,
                        with_filters=True)
    assert int(tok[0]) == 1  # 1.0-0.1=0.9 < 0.95


def test_all_filtered_recovers():
    """Even with absurd filter combos at least one token survives."""
    logits = jnp.asarray([[1.0, 0.5, 0.2]])
    st = make_state(
        [SamplingParams(temperature=1.0, top_k=1, top_p=0.01, min_p=0.99)], 1
    )
    tok = sample_tokens(logits, st, KEY, with_filters=True)
    assert int(tok[0]) == 0


def test_seeded_determinism():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)),
                         dtype=jnp.float32)
    st = make_state([SamplingParams(temperature=1.0, top_p=0.9)] * 4, 4)
    a = sample_tokens(logits, st, KEY, with_filters=True)
    b = sample_tokens(logits, st, KEY, with_filters=True)
    assert jnp.array_equal(a, b)


def test_padding_rows_harmless():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16)),
                         dtype=jnp.float32)
    st = make_state([SamplingParams(temperature=0.0)], 4)  # 3 pad rows
    toks = sample_tokens(logits, st, KEY, with_filters=True)
    assert int(toks[0]) == int(jnp.argmax(logits[0]))


def test_distribution_roughly_matches_softmax():
    logits = jnp.asarray([[2.0, 1.0, 0.0]])
    st = state_of(temperature=1.0)
    toks = np.array(sample_many(logits, st, 2000, with_filters=False))
    p = np.exp([2.0, 1.0, 0.0]); p /= p.sum()
    freq = np.bincount(toks, minlength=3) / len(toks)
    np.testing.assert_allclose(freq, p, atol=0.05)


def test_avoid_top_k_masks_best_tokens():
    """avoid_top_k excludes the k most likely tokens
    (reference: sampling/functional.py:288-302)."""
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    st = state_of(temperature=1.0, avoid_top_k=2)
    toks = sample_many(logits, st, 300)
    assert set(toks) <= {2, 3, 4}
    # exact (typical) path applies the same restriction
    toks2 = sample_many(logits, st, 300, typical_active=True)
    assert set(toks2) <= {2, 3, 4}


def test_avoid_top_k_greedy_shifts_argmax():
    """Greedy runs after the filter pipeline in the reference
    (sampler.py:108-110), so avoid_top_k shifts the argmax."""
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    st = state_of(temperature=0.0, avoid_top_k=1)
    assert int(sample_tokens(logits, st, KEY)[0]) == 1
    assert int(sample_tokens(logits, st, KEY, typical_active=True)[0]) == 1


def test_avoid_top_k_composes_with_top_k():
    """top-k keeps the best k of the *surviving* tokens (the reference
    applies it to the -inf-masked logits)."""
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    st = state_of(temperature=1.0, avoid_top_k=1, top_k=2)
    toks = sample_many(logits, st, 300)
    assert set(toks) == {1, 2}


def test_avoid_top_k_renormalizes_top_p():
    """top-p mass is measured over the renormalized surviving
    distribution, matching softmax over -inf-masked logits."""
    # after avoiding token 0, survivors renormalize; top_p=0.9 keeps the
    # bulk of the surviving mass (tokens 1 and 2 at ~[0.84, 0.12]).
    logits = jnp.asarray([[9.0, 4.0, 2.0, 0.0, -1.0]])
    st = state_of(temperature=1.0, avoid_top_k=1, top_p=0.9)
    toks = sample_many(logits, st, 400)
    assert set(toks) == {1, 2}


def test_avoid_top_k_validation():
    with pytest.raises(ValueError):
        SamplingParams(avoid_top_k=-1)
