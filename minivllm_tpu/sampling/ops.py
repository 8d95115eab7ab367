"""In-jit vectorized sampling.

Counterpart of the reference sampler pipeline
(/root/reference/minivllm/sampling/sampler.py:27-110 and
sampling/functional.py): penalties -> avoid-top-k -> temperature ->
typical -> top-k -> top-p -> min-p -> sample, with a greedy shortcut at
temperature 0.

TPU-first differences: everything is one fused jnp program executed inside
the step function (no per-filter host round trips); top-k/top-p/typical
run in a single descending-sort space and the token is drawn there with
`jax.random.categorical`, so no scatter back to vocab order is needed.
Per-sequence parameters arrive as arrays (SamplingState), padded to the
same sequence bucket as the batch.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "SamplingState",
    "MirostatRows",
    "sample_tokens",
    "mirostat_tokens",
    "make_state",
    "make_mirostat_rows",
    "token_logprobs",
]

NEG_INF = float(jnp.finfo(jnp.float32).min)

# Candidate pool for the fast top-k/top-p path; a top-p cutoff virtually
# always lies within the top-512 tokens at serving temperatures.
NUM_CANDIDATES = 512
# Serving pool: lax.top_k lowers to a FULL SORT on TPU — measured 14.8 ms
# at (64, 152k) fp32 vs 2.0 ms at k=64, and the sampler was 7 of the 12
# ms of a decode iteration (docs/performance.md "Step-time budget").
# The runner picks the small pool whenever no request needs deeper ranks
# (candidate_pool below); a top-p cutoff beyond rank 64 is truncated,
# exactly as the 512 pool truncates beyond rank 512.
POOL_FAST = 64


def candidate_pool(sampling_params_list) -> int:
    """Static candidate-pool size for a batch: the fast 64-candidate
    pool unless a request's rank window provably reaches past it
    (top_k > 64, or avoid_top_k shifting the window).
    `MINIVLLM_SAMPLER_POOL` overrides for A/B measurement."""
    import os

    env = os.environ.get("MINIVLLM_SAMPLER_POOL")
    if env:
        return int(env)
    for sp in sampling_params_list:
        if sp.avoid_top_k > 0 or sp.top_k > POOL_FAST:
            return NUM_CANDIDATES
    return POOL_FAST


# Chunk width of the two-stage top-k: one 128-lane vocab chunk per
# per-chunk max, so the chunk-max sweep is a plain lane reduction.
TOPK_CHUNK = 128

# A/B escape hatch, read ONCE at import: chunked_top_k is called at
# trace time inside already-jitted steps, so flipping the env
# mid-process could not affect cached compilations anyway (and with the
# persistent XLA cache an in-process flip would silently measure the
# same variant twice). Set MINIVLLM_CHUNKED_TOPK=0 before engine
# construction, like MINIVLLM_SAMPLER_POOL.
_CHUNKED_TOPK_ENABLED = os.environ.get("MINIVLLM_CHUNKED_TOPK") != "0"


def chunked_top_k(x: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis via two-stage chunk selection.

    `lax.top_k` lowers to a FULL vocab sort on TPU (measured ~6-8 ms at
    (256, 152064) fp32 on v5e even at k=64). This computes the same
    result in ~0.9 ms (probe_sampler.py): per-128-lane chunk maxima
    (one fused sweep), top-k of the (S, V/128) chunk maxima, gather of
    the selected chunks, and a small top-k over the k*128 gathered
    candidates. Exactness: any element of the true top-k has a chunk
    max >= the k-th value, and at most k chunks can rank above it (each
    selected chunk contributes one element preceding it in the stable
    descending order), so the gathered set always covers the top-k.

    Tie semantics: the greedy tie-break (rank 0 = lowest index among
    maxima) matches lax.top_k exactly; deeper ranks of EQUAL values
    split across chunks may come back in chunk-rank order instead of
    vocab order (the value multiset is identical either way).

    Falls back to lax.top_k for small vocabularies (tiny test
    checkpoints) where the two-stage split has nothing to amortize.
    """
    S, V = x.shape
    L = TOPK_CHUNK
    if V < 64 * L or (V + L - 1) // L < k or not _CHUNKED_TOPK_ENABLED:
        return jax.lax.top_k(x, k)
    pad = (L - V % L) % L
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=NEG_INF)
    C = (V + pad) // L
    xc = x.reshape(S, C, L)
    cm = jnp.max(xc, axis=-1)                       # (S, C)
    _, cidx = jax.lax.top_k(cm, k)                  # (S, k) chunk ids
    gath = jnp.take_along_axis(xc, cidx[:, :, None], axis=1)
    vals, pos = jax.lax.top_k(gath.reshape(S, k * L), k)
    chunk_of = jnp.take_along_axis(cidx, pos // L, axis=1)
    # Clamp into [0, V): if a row's real values reach NEG_INF they can
    # tie with pad lanes and a deep rank may resolve to a pad position
    # in [V, V+pad) — lax.top_k can never return an out-of-range index,
    # and a downstream gather/token id >= V would be invalid.
    return vals, jnp.minimum(chunk_of * L + pos % L, V - 1)


def fast_argmax(x: jnp.ndarray) -> jnp.ndarray:
    """argmax over the last axis via two plain reduces (max, then min
    over the matching iota). XLA's variadic argmax reduce measured
    3.3 ms at (64, 152k) on v5e; this form is 0.12 ms. Tie-break:
    lowest index, identical to jnp.argmax."""
    V = x.shape[-1]
    m = jnp.max(x, axis=-1, keepdims=True)
    i = jnp.where(
        x == m, jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1), V
    )
    return jnp.min(i, axis=-1).astype(jnp.int32)


class SamplingState(NamedTuple):
    """Per-sequence sampling parameters, shape (S,) each."""

    temperature: jnp.ndarray   # fp32; 0 => greedy
    top_k: jnp.ndarray         # int32; <=0 => disabled
    top_p: jnp.ndarray         # fp32; 1 => disabled
    min_p: jnp.ndarray         # fp32; 0 => disabled
    typical_p: jnp.ndarray     # fp32; 1 => disabled
    repetition_penalty: jnp.ndarray  # fp32; 1 => disabled
    frequency_penalty: jnp.ndarray   # fp32; 0 => disabled
    presence_penalty: jnp.ndarray    # fp32; 0 => disabled
    avoid_top_k: jnp.ndarray         # int32; 0 => disabled
    seed: jnp.ndarray                # int32; < 0 => unseeded


class MirostatRows(NamedTuple):
    """Per-sequence Mirostat sampler state, shape (S,) each. version 0
    disables the row (the regular pipeline's token passes through)."""

    version: jnp.ndarray  # int32: 0 off, 1 or 2
    mu: jnp.ndarray       # fp32 running surprise bound (host-carried)
    tau: jnp.ndarray      # fp32 target surprise
    eta: jnp.ndarray      # fp32 learning rate


def make_mirostat_rows(sampling_params_list, mus, pad_to: int) -> "MirostatRows":
    """Padded MirostatRows; `mus` carries each sequence's running mu
    (None => fresh request, initialized to 2 * tau)."""
    import numpy as np

    version = np.zeros(pad_to, "int32")
    mu = np.zeros(pad_to, "float32")
    tau = np.full(pad_to, 5.0, "float32")
    eta = np.full(pad_to, 0.1, "float32")
    for i, (sp, m) in enumerate(zip(sampling_params_list, mus)):
        version[i] = sp.mirostat
        tau[i] = sp.mirostat_tau
        eta[i] = sp.mirostat_eta
        mu[i] = 2.0 * sp.mirostat_tau if m is None else m
    return MirostatRows(
        version=jnp.asarray(version),
        mu=jnp.asarray(mu),
        tau=jnp.asarray(tau),
        eta=jnp.asarray(eta),
    )


def make_state(sampling_params_list, pad_to: int) -> "SamplingState":
    """Build a padded SamplingState from host SamplingParams objects."""
    import numpy as np

    n = len(sampling_params_list)

    def arr(get, fill, dtype):
        a = np.full(pad_to, fill, dtype)
        for i, sp in enumerate(sampling_params_list):
            a[i] = get(sp)
        return jnp.asarray(a)

    return SamplingState(
        temperature=arr(lambda s: s.temperature, 0.0, "float32"),
        top_k=arr(lambda s: s.top_k, -1, "int32"),
        top_p=arr(lambda s: s.top_p, 1.0, "float32"),
        min_p=arr(lambda s: s.min_p, 0.0, "float32"),
        typical_p=arr(lambda s: s.typical_p, 1.0, "float32"),
        repetition_penalty=arr(lambda s: s.repetition_penalty, 1.0, "float32"),
        frequency_penalty=arr(lambda s: s.frequency_penalty, 0.0, "float32"),
        presence_penalty=arr(lambda s: s.presence_penalty, 0.0, "float32"),
        avoid_top_k=arr(lambda s: s.avoid_top_k, 0, "int32"),
        seed=arr(lambda s: -1 if s.seed is None else s.seed, -1, "int32"),
    )


def _row_keys(
    key: jax.Array, state: SamplingState, positions: jnp.ndarray
) -> jnp.ndarray:
    """Per-row PRNG keys for batches containing seeded requests. A seeded
    row's key derives from (seed, token position) ONLY — so two identical
    seeded requests reproduce each other across engine restarts and batch
    compositions (beats the reference, whose SamplingConfig.seed is dead,
    /root/reference/minivllm/sampling/config.py:23). Unseeded rows derive
    theirs from the engine step key + row index."""
    S = state.seed.shape[0]

    def mk(seed, pos, i):
        seeded = jax.random.fold_in(
            jax.random.PRNGKey(jnp.maximum(seed, 0)), pos
        )
        base = jax.random.fold_in(key, i)
        return jnp.where(seed >= 0, seeded, base)

    return jax.vmap(mk)(
        state.seed, positions.astype(jnp.int32),
        jnp.arange(S, dtype=jnp.int32),
    )


def apply_penalties(
    logits: jnp.ndarray,
    state: SamplingState,
    all_tokens: jnp.ndarray,
    out_tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Repetition (over prompt+output, HF convention) and
    frequency/presence (over output only, OpenAI convention) penalties
    (reference: functional.py:342-407).

    all_tokens/out_tokens: (S, H) int32 histories padded with -1.
    """
    S, V = logits.shape

    def count(tokens):
        valid = tokens >= 0
        idx = jnp.where(valid, tokens, V)  # pad rows land in a trash column
        cnt = jnp.zeros((S, V + 1), jnp.float32)
        cnt = cnt.at[jnp.arange(S)[:, None], idx].add(valid.astype(jnp.float32))
        return cnt[:, :V]

    seen = count(all_tokens) > 0
    rp = state.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, penalized, logits)

    out_cnt = count(out_tokens)
    logits = logits - state.frequency_penalty[:, None] * out_cnt
    logits = logits - state.presence_penalty[:, None] * (out_cnt > 0)
    return logits


def _typical_mask(probs: jnp.ndarray, typical_p: jnp.ndarray) -> jnp.ndarray:
    """Locally-typical filtering mask in vocab order
    (reference: functional.py:236-285)."""
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    ent = -jnp.sum(probs * logp, axis=-1, keepdims=True)
    dev = jnp.abs(-logp - ent)
    order = jnp.argsort(dev, axis=-1)  # ascending deviation
    p_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(p_sorted, axis=-1)
    keep_sorted = (cum - p_sorted) < typical_p[:, None]  # always keeps first
    keep = jnp.zeros_like(keep_sorted)
    keep = keep.at[jnp.arange(probs.shape[0])[:, None], order].set(keep_sorted)
    return keep


def sample_tokens(
    logits: jnp.ndarray,
    state: SamplingState,
    key: jax.Array,
    all_tokens: jnp.ndarray | None = None,
    out_tokens: jnp.ndarray | None = None,
    with_filters: bool = True,
    typical_active: bool = False,
    positions: jnp.ndarray | None = None,
    seeded: bool = False,
    pool: int = NUM_CANDIDATES,
    bias: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Sample one token per row. logits (S, V) fp32 -> (S,) int32.

    `with_filters=False` compiles the fast path (greedy/temperature only)
    used when no sequence in the batch has filters active — the runner
    decides statically per step. `seeded=True` (static, runner-decided)
    switches to per-row keys so rows with SamplingParams.seed draw
    reproducibly from (seed, position); it requires `positions` (the
    sampled token's position = context length per row). `pool` (static)
    is the rank-filter candidate set size — the runner picks it via
    candidate_pool() from the batch's params.
    """
    logits = logits.astype(jnp.float32)
    S, V = logits.shape

    if seeded and positions is not None:
        keys = _row_keys(key, state, positions)

        def draw(rows: jnp.ndarray) -> jnp.ndarray:
            return jax.vmap(jax.random.categorical)(keys, rows)
    else:

        def draw(rows: jnp.ndarray) -> jnp.ndarray:
            return jax.random.categorical(key, rows, axis=-1)
    # OpenAI logit_bias: additive, before every filter and the argmax
    # (-100 bans, +100 forces). bias = (ids (S, B) int32 with -1
    # padding, vals (S, B) fp32); like the penalty histories, presence
    # is a trace-time property (None vs arrays retraces).
    if bias is not None:
        bids, bvals = bias
        logits = logits.at[
            jnp.arange(S, dtype=jnp.int32)[:, None],
            jnp.clip(bids, 0, V - 1),
        ].add(jnp.where(bids >= 0, bvals, 0.0))
    # Penalties come first (reference order: sampler.py:27-110), so they
    # affect the greedy argmax too.
    if with_filters and all_tokens is not None:
        logits = apply_penalties(logits, state, all_tokens, out_tokens)
    greedy_tok = fast_argmax(logits)
    temp = jnp.maximum(state.temperature, 1e-6)[:, None]
    scaled = logits / temp

    if not with_filters:
        sampled = draw(scaled).astype(jnp.int32)
        return jnp.where(state.temperature > 0, sampled, greedy_tok)

    if typical_active:
        # Typical filtering needs the full distribution's deviation order;
        # take the exact full-sort path (rare in serving).
        # avoid-top-k comes first (reference order: sampler.py:61-82 —
        # penalties -> avoid -> temperature -> typical -> ...): mask the
        # `avoid_top_k` most likely tokens to -inf in vocab space.
        avoid = jnp.clip(state.avoid_top_k, 0, V - 1)[:, None]
        K0 = min(V, NUM_CANDIDATES)
        _, aidx = jax.lax.top_k(scaled, K0)
        amask_cand = jnp.arange(K0, dtype=jnp.int32)[None, :] < avoid
        amask = jnp.zeros((S, V), bool)
        amask = amask.at[jnp.arange(S)[:, None], aidx].set(amask_cand)
        scaled = jnp.where(amask, NEG_INF, scaled)
        probs_full = jax.nn.softmax(scaled, axis=-1)
        keep_typical = _typical_mask(probs_full, state.typical_p)
        scaled = jnp.where(keep_typical, scaled, NEG_INF)
        order = jnp.argsort(-scaled, axis=-1)
        sorted_logits = jnp.take_along_axis(scaled, order, axis=-1)
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
        k = jnp.where(state.top_k <= 0, V, state.top_k)[:, None]
        keep = ranks < k
        cum = jnp.cumsum(sorted_probs, axis=-1)
        keep &= (cum - sorted_probs) < state.top_p[:, None]
        keep &= sorted_probs >= state.min_p[:, None] * sorted_probs[:, :1]
        keep = keep.at[:, 0].set(True)  # never filter everything
        masked = jnp.where(keep, sorted_logits, NEG_INF)
        rank_sample = draw(masked)
        sampled = jnp.take_along_axis(order, rank_sample[:, None], axis=-1)[:, 0]
        # Greedy respects the filters like the reference (argmax runs after
        # the whole pipeline, sampler.py:108-110): rank 0 of the filtered
        # order is always kept.
        greedy_tok = order[:, 0].astype(jnp.int32)
        return jnp.where(
            state.temperature > 0, sampled.astype(jnp.int32), greedy_tok
        )

    # Fast path: rank filters operate on the top-`pool` logits
    # (lax.top_k instead of a full vocab sort — the sort was the dominant
    # sampler cost at large batch, and top_k cost scales with k).
    # Probabilities stay exact w.r.t. the full distribution via a full
    # logsumexp; the top-p cutoff is exact whenever it falls inside the
    # candidate set, and top-k requests are clamped to the pool (the
    # runner widens the pool when a request's ranks reach past it).
    K = min(V, pool)
    denom = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
    cand, idx = chunked_top_k(scaled, K)           # (S, K) descending
    probs = jnp.exp(cand - denom)                  # true probabilities
    ranks = jnp.arange(K, dtype=jnp.int32)[None, :]
    # avoid-top-k (reference functional.py:288-302): exclude the `avoid`
    # most likely tokens, i.e. candidate ranks [0, avoid). The remaining
    # distribution renormalizes over the surviving mass (the reference's
    # downstream softmax over -inf-masked logits does the same), and the
    # top-k window shifts to ranks [avoid, avoid+k).
    avoid = jnp.clip(state.avoid_top_k, 0, K - 1)[:, None]
    avoided = ranks < avoid
    p_avoid = jnp.sum(jnp.where(avoided, probs, 0.0), axis=-1, keepdims=True)
    probs = jnp.where(avoided, 0.0, probs) / jnp.maximum(1.0 - p_avoid, 1e-30)
    k = jnp.where(state.top_k <= 0, K, jnp.minimum(state.top_k, K))[:, None]
    keep = (ranks >= avoid) & (ranks < avoid + k)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= (cum - probs) < state.top_p[:, None]
    top_prob = jnp.take_along_axis(probs, avoid, axis=-1)
    keep &= probs >= state.min_p[:, None] * top_prob
    keep |= ranks == avoid  # never filter everything
    masked = jnp.where(keep, cand, NEG_INF)
    r = draw(masked)
    sampled = jnp.take_along_axis(idx, r[:, None], axis=-1)[:, 0]
    # Greedy respects avoid-top-k (reference applies argmax after the
    # filter pipeline): the best surviving token sits at rank `avoid`.
    greedy_tok = jnp.take_along_axis(idx, avoid, axis=-1)[:, 0].astype(jnp.int32)
    return jnp.where(
        state.temperature > 0, sampled.astype(jnp.int32), greedy_tok
    )


def mirostat_tokens(
    logits: jnp.ndarray,
    base_toks: jnp.ndarray,
    m: MirostatRows,
    key: jax.Array,
    state: SamplingState | None = None,
    positions: jnp.ndarray | None = None,
    seeded: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Mirostat v1/v2 overlay (reference library analog:
    /root/reference/minivllm/sampling/mirostat.py:17-185 — there unreachable
    from the engine; here routed through the single-step decode path).

    Rows with m.version > 0 replace `base_toks` (the regular pipeline's
    token) with a Mirostat draw and update mu toward the target surprise;
    other rows pass through untouched with mu unchanged. Returns
    (tokens (S,) int32, new_mu (S,) fp32). Compiled only into the
    mirostat step variants (full-vocab sorts are fine off the hot path).
    """
    logits = logits.astype(jnp.float32)
    S, V = logits.shape
    mkey = jax.random.fold_in(key, 0x5A5A)
    if seeded and state is not None and positions is not None:
        keys = _row_keys(mkey, state, positions)
    else:
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            mkey, jnp.arange(S, dtype=jnp.int32)
        )
    probs = jax.nn.softmax(logits, axis=-1)

    # v2: drop tokens whose surprise exceeds mu (always keep the argmax).
    surprises = -jnp.log2(jnp.maximum(probs, 1e-30))
    keep2 = surprises <= m.mu[:, None]
    top = jnp.argmax(probs, axis=-1)
    keep2 = keep2.at[jnp.arange(S), top].set(True)
    masked2 = jnp.where(keep2, logits, NEG_INF)
    tok2 = jax.vmap(jax.random.categorical)(keys, masked2)

    # v1: Zipf-exponent estimate from the top of the distribution -> k.
    sorted_probs = -jnp.sort(-probs, axis=-1)  # descending
    n = min(100, V - 1)
    idx = jnp.arange(1, n + 1, dtype=jnp.float32)
    ratios = jnp.log(
        sorted_probs[:, :n] / jnp.maximum(sorted_probs[:, 1 : n + 1], 1e-30)
    )
    ts = jnp.log((idx + 1.0) / idx)
    s_hat = jnp.sum(ratios * ts, axis=-1) / jnp.maximum(jnp.sum(ts * ts), 1e-30)
    eps = s_hat - 1.0
    k = ((eps * jnp.exp2(m.mu)) / (1.0 - jnp.float32(V) ** (-eps))) ** (
        1.0 / jnp.maximum(s_hat, 1e-3)
    )
    k = jnp.clip(jnp.round(k), 1, V).astype(jnp.int32)
    rank_of = jnp.argsort(jnp.argsort(-logits, axis=-1), axis=-1)
    masked1 = jnp.where(rank_of < k[:, None], logits, NEG_INF)
    tok1 = jax.vmap(jax.random.categorical)(keys, masked1)

    mtok = jnp.where(m.version == 2, tok2, tok1).astype(jnp.int32)
    chosen_p = jnp.take_along_axis(probs, mtok[:, None], axis=1)[:, 0]
    surprise = -jnp.log2(jnp.maximum(chosen_p, 1e-30))
    new_mu = m.mu - m.eta * (surprise - m.tau)
    active = m.version > 0
    return (
        jnp.where(active, mtok, base_toks.astype(jnp.int32)),
        jnp.where(active, new_mu, m.mu),
    )


def token_logprobs(logits: jnp.ndarray, toks: jnp.ndarray, k: int):
    """Logprobs of the sampled tokens under the UNFILTERED distribution
    (OpenAI semantics; filters affect which token is drawn, not the
    reported probabilities). logits (S, V) fp32, toks (S,) ->
    (chosen (S,), top_ids (S, k), top_lps (S, k)); k may be 0.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(logp, toks[:, None].astype(jnp.int32), axis=1)[:, 0]
    if k > 0:
        top_lp, top_id = chunked_top_k(logp, k)
        return chosen, top_id.astype(jnp.int32), top_lp
    S = logits.shape[0]
    return chosen, jnp.zeros((S, 0), jnp.int32), jnp.zeros((S, 0), jnp.float32)
