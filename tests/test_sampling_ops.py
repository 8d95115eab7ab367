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


def test_seeded_rows_reproduce_across_batch_keys():
    """A seeded row's draw depends only on (seed, position): different
    engine step keys and row indices yield the same token."""
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(0, 2, size=(3, 64)), jnp.float32)
    st = make_state([SamplingParams(temperature=1.0, seed=123)] * 3, 3)
    pos = jnp.asarray([10, 10, 10], jnp.int32)
    a = sample_tokens(
        logits, st, jax.random.PRNGKey(1), with_filters=False,
        positions=pos, seeded=True,
    )
    b = sample_tokens(
        logits, st, jax.random.PRNGKey(999), with_filters=False,
        positions=pos, seeded=True,
    )
    assert a.tolist() == b.tolist()
    # Same seed + same position + same logits row => same token, even in
    # different rows of the batch.
    assert len(set(a.tolist())) == 1 or (logits[0] != logits[1]).any()


def test_seeded_distinct_positions_vary():
    rng = np.random.default_rng(8)
    logits = jnp.tile(
        jnp.asarray(rng.normal(0, 1, size=(1, 512)), jnp.float32), (16, 1)
    )
    st = make_state([SamplingParams(temperature=1.0, seed=5)] * 16, 16)
    pos = jnp.arange(16, dtype=jnp.int32)
    toks = sample_tokens(
        logits, st, KEY, with_filters=False, positions=pos, seeded=True
    )
    assert len(set(toks.tolist())) > 4  # positions decorrelate draws


def test_unseeded_rows_unaffected_by_seeded_flag_path():
    """Unseeded rows under the seeded code path still draw valid tokens
    from the filtered support."""
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    st = make_state([SamplingParams(temperature=1.0, top_k=2)], 1)
    for i in range(100):
        t = sample_tokens(
            logits, st, jax.random.fold_in(KEY, i),
            positions=jnp.asarray([3], jnp.int32), seeded=True,
        )
        assert int(t[0]) in (0, 1)


def test_seed_validation():
    with pytest.raises(ValueError):
        SamplingParams(seed=-3)
    with pytest.raises(ValueError):
        SamplingParams(seed=2**31)


def test_mirostat_tokens_batched_matches_scalar_v2():
    """The batched engine overlay reproduces the library's v2 masking:
    only tokens with surprise <= mu (plus the argmax) are drawable."""
    from minivllm_tpu.sampling.ops import MirostatRows, mirostat_tokens

    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(0, 3, size=(2, 256)), jnp.float32)
    mu0 = 4.0
    m = MirostatRows(
        version=jnp.asarray([2, 0], jnp.int32),
        mu=jnp.asarray([mu0, mu0], jnp.float32),
        tau=jnp.asarray([3.0, 3.0], jnp.float32),
        eta=jnp.asarray([0.1, 0.1], jnp.float32),
    )
    base = jnp.asarray([7, 7], jnp.int32)
    probs = jax.nn.softmax(logits[0])
    allowed = set(np.where(-np.log2(np.maximum(np.asarray(probs), 1e-30)) <= mu0)[0])
    allowed.add(int(jnp.argmax(probs)))
    for i in range(50):
        toks, mu = mirostat_tokens(
            logits, base, m, jax.random.fold_in(KEY, i)
        )
        assert int(toks[0]) in allowed
        assert int(toks[1]) == 7  # version-0 row passes base through
        assert float(mu[1]) == mu0  # and keeps mu
        s = float(-jnp.log2(jnp.maximum(probs[toks[0]], 1e-30)))
        assert abs(float(mu[0]) - (mu0 - 0.1 * (s - 3.0))) < 1e-4


def test_mirostat_v1_row_runs():
    from minivllm_tpu.sampling.ops import MirostatRows, mirostat_tokens

    rng = np.random.default_rng(12)
    logits = jnp.asarray(rng.normal(0, 2, size=(1, 128)), jnp.float32)
    m = MirostatRows(
        version=jnp.asarray([1], jnp.int32),
        mu=jnp.asarray([8.0], jnp.float32),
        tau=jnp.asarray([4.0], jnp.float32),
        eta=jnp.asarray([0.1], jnp.float32),
    )
    toks, mu = mirostat_tokens(logits, jnp.asarray([0], jnp.int32), m, KEY)
    assert 0 <= int(toks[0]) < 128
    assert float(mu[0]) != 8.0


def test_mirostat_validation():
    with pytest.raises(ValueError):
        SamplingParams(mirostat=3)
    with pytest.raises(ValueError):
        SamplingParams(mirostat=2, mirostat_tau=0.0)
    with pytest.raises(ValueError):
        SamplingParams(mirostat=1, mirostat_eta=0.0)


# ---------------------------------------------------------------------------
# chunked_top_k: the two-stage exact top-k that replaces lax.top_k's
# full vocab sort on the hot sampler paths.


def test_chunked_top_k_matches_lax_top_k():
    from minivllm_tpu.sampling.ops import chunked_top_k

    rng = np.random.default_rng(0)
    for S, V, k in [(4, 128 * 256, 64), (3, 128 * 70, 12), (2, 128 * 64, 64)]:
        x = jnp.asarray(rng.standard_normal((S, V)), jnp.float32)
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = chunked_top_k(x, k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_chunked_top_k_unaligned_vocab():
    from minivllm_tpu.sampling.ops import chunked_top_k

    rng = np.random.default_rng(1)
    V = 128 * 400 + 57  # GPT2-style non-multiple-of-128 vocab
    x = jnp.asarray(rng.standard_normal((2, V)), jnp.float32)
    v_ref, i_ref = jax.lax.top_k(x, 20)
    v, i = chunked_top_k(x, 20)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_chunked_top_k_small_vocab_fallback():
    from minivllm_tpu.sampling.ops import chunked_top_k

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 999)), jnp.float32)
    v_ref, i_ref = jax.lax.top_k(x, 8)
    v, i = chunked_top_k(x, 8)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_chunked_top_k_greedy_tie_break_lowest_index():
    from minivllm_tpu.sampling.ops import chunked_top_k

    # global max duplicated across two far-apart chunks: rank 0 must be
    # the LOWEST index (jnp.argmax / lax.top_k tie-break).
    V = 128 * 128
    x = np.zeros((1, V), np.float32)
    x[0, 5000] = 7.0
    x[0, 13000] = 7.0
    v, i = chunked_top_k(jnp.asarray(x), 4)
    assert int(i[0, 0]) == 5000
    assert float(v[0, 0]) == 7.0
    assert int(i[0, 1]) == 13000


def test_chunked_top_k_values_match_on_dense_ties():
    from minivllm_tpu.sampling.ops import chunked_top_k

    # many equal values: the value multiset must match lax.top_k even
    # if tie ORDER may differ.
    rng = np.random.default_rng(3)
    V = 128 * 100
    x = np.round(rng.standard_normal((2, V)) * 2).astype(np.float32)
    v_ref, _ = jax.lax.top_k(jnp.asarray(x), 64)
    v, i = chunked_top_k(jnp.asarray(x), 64)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    # returned indices really hold the returned values
    got = np.take_along_axis(x, np.asarray(i), axis=1)
    np.testing.assert_array_equal(got, np.asarray(v))
