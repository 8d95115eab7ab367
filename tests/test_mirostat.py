"""Mirostat samplers (reference analog: tests/test_sampler.py Mirostat cases)."""

import numpy as np
import jax
import jax.numpy as jnp

from minivllm_tpu.sampling.mirostat import (
    init_state,
    mirostat_v1_step,
    mirostat_v2_step,
)


def run_chain(step_fn, logits, n=50, tau=3.0):
    st = init_state(tau=tau)
    key = jax.random.PRNGKey(0)
    surprises = []
    for i in range(n):
        tok, st = step_fn(logits, st, jax.random.fold_in(key, i))
        p = jax.nn.softmax(logits)[tok]
        surprises.append(float(-jnp.log2(p)))
    return st, surprises


def test_v2_controls_surprise():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 3, size=512), jnp.float32)
    st, surprises = run_chain(mirostat_v2_step, logits, n=80, tau=3.0)
    # Average surprise over the tail of the chain should approach tau.
    assert abs(np.mean(surprises[40:]) - 3.0) < 1.5
    assert np.isfinite(float(st.mu))


def test_v1_runs_and_updates_mu():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(0, 2, size=256), jnp.float32)
    st0 = init_state(tau=4.0)
    tok, st1 = mirostat_v1_step(logits, st0, jax.random.PRNGKey(0))
    assert 0 <= int(tok) < 256
    assert float(st1.mu) != float(st0.mu)


def test_v2_jit_and_scan():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=128), jnp.float32)

    def body(carry, key):
        st = carry
        tok, st = mirostat_v2_step(logits, st, key)
        return st, tok

    keys = jax.random.split(jax.random.PRNGKey(3), 10)
    st, toks = jax.lax.scan(jax.jit(body), init_state(), keys)
    assert toks.shape == (10,)
