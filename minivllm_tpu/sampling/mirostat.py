"""Mirostat v1/v2 samplers — stateful perplexity-controlled sampling.

Library feature matching the reference (sampling/mirostat.py:17-185; like
the reference, not wired into the engine loop — Mirostat is inherently
sequential per sequence). Functional JAX style: the sampler owns no
mutable state; `step` maps (logits, state, key) -> (token, state) and is
jit-compatible, so callers can `lax.scan` it over a generation loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["MirostatState", "mirostat_v1_step", "mirostat_v2_step", "init_state"]


class MirostatState(NamedTuple):
    mu: jnp.ndarray          # scalar fp32, 2 * tau initially
    tau: jnp.ndarray         # target surprise
    eta: jnp.ndarray         # learning rate


def init_state(tau: float = 5.0, eta: float = 0.1) -> MirostatState:
    return MirostatState(
        mu=jnp.asarray(2.0 * tau, jnp.float32),
        tau=jnp.asarray(tau, jnp.float32),
        eta=jnp.asarray(eta, jnp.float32),
    )


def _surprise(probs: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    return -jnp.log2(jnp.maximum(probs[tok], 1e-30))


def mirostat_v1_step(
    logits: jnp.ndarray, state: MirostatState, key: jax.Array, n_vocab_tail: int = 100
):
    """Mirostat v1 (Basu et al. 2021): estimate Zipf exponent from the top
    of the distribution, derive k from mu, sample from the top-k."""
    V = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32))
    sorted_probs = jnp.sort(probs)[::-1]
    # Zipf exponent estimate from the top n_vocab_tail token ratios.
    n = min(n_vocab_tail, V - 1)
    idx = jnp.arange(1, n + 1, dtype=jnp.float32)
    ratios = jnp.log(sorted_probs[:n] / jnp.maximum(sorted_probs[1 : n + 1], 1e-30))
    ts = jnp.log((idx + 1.0) / idx)
    s_hat = jnp.sum(ratios * ts) / jnp.maximum(jnp.sum(ts * ts), 1e-30)
    # k from mu (paper eq. 4); clamp to [1, V].
    eps = s_hat - 1.0
    k = ((eps * jnp.exp2(state.mu)) / (1.0 - jnp.float32(V) ** (-eps))) ** (
        1.0 / jnp.maximum(s_hat, 1e-3)
    )
    k = jnp.clip(jnp.round(k), 1, V).astype(jnp.int32)
    ranks = jnp.argsort(-logits)
    rank_of = jnp.argsort(ranks)
    masked = jnp.where(rank_of < k, logits, jnp.finfo(jnp.float32).min)
    tok = jax.random.categorical(key, masked)
    surprise = _surprise(probs, tok)
    mu = state.mu - state.eta * (surprise - state.tau)
    return tok.astype(jnp.int32), state._replace(mu=mu)


def mirostat_v2_step(logits: jnp.ndarray, state: MirostatState, key: jax.Array):
    """Mirostat v2: drop tokens whose surprise exceeds mu, sample, then
    update mu toward the target surprise tau."""
    probs = jax.nn.softmax(logits.astype(jnp.float32))
    surprises = -jnp.log2(jnp.maximum(probs, 1e-30))
    keep = surprises <= state.mu
    # Always keep the most probable token.
    top = jnp.argmax(probs)
    keep = keep.at[top].set(True)
    masked = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
    tok = jax.random.categorical(key, masked)
    surprise = _surprise(probs, tok)
    mu = state.mu - state.eta * (surprise - state.tau)
    return tok.astype(jnp.int32), state._replace(mu=mu)
