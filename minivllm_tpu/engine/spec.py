"""N-gram (prompt-lookup) speculative decoding.

Technique (public; "prompt lookup decoding", also in HF transformers'
`prompt_lookup_num_tokens`): generated text often repeats spans of its
own prompt/history (code, extraction, quoting). At each decode step,
find the most recent EARLIER occurrence of the sequence's trailing
n-gram; the tokens that followed it become draft tokens, verified in a
single model pass. Greedy acceptance keeps the emitted tokens
bit-identical to plain greedy decoding; for temperature > 0 sampling,
`accept_or_resample` implements exact speculative (rejection) sampling
for the deterministic n-gram proposal, so the emitted stream follows
the target distribution exactly.

Two execution paths:

- HOST path (`propose_ngram` + model_runner.run_verify): one extra
  dispatch per step. Loses behind a high-latency relay (the fused
  window amortizes dispatches better, docs/roadmap.md).
- FUSED path (`propose_ngram_device` + model_runner.run_spec_multi):
  the proposal runs ON DEVICE from a carried token-history buffer,
  and proposal + verification + acceptance all happen INSIDE the fused
  multi-step scan — dispatch count identical to the plain fused
  window, but each iteration can emit up to k+1 tokens. Measured
  (docs/roadmap.md): dispatch parity holds, but the (k+1)-row verify
  pass costs ~3x a plain decode pass at 0.6-7B scales, so speculation
  wins only when acceptance x draft length beats that ratio — above
  what prompt-lookup yields on the measured workloads, hence the
  feature defaults OFF and the engine's adaptive acceptance gate
  bounds the loss when it is enabled.

The reference has no speculative decoding (SURVEY.md §2) — this is a
beyond-parity serving feature. No draft model is involved, so there is
nothing to load or keep in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["propose_ngram", "propose_ngram_device", "accept_or_resample"]

NEG_INF = float(jnp.finfo(jnp.float32).min)

# Backward-scan bound shared by the DEVICE proposer (run_spec_multi) and
# every host-side proposal/qualifier scan. The engine's gate qualifier
# must use the same window as the device proposer — a narrower host scan
# would veto probes whose n-grams recur only deeper in the history,
# keeping the gate shut on workloads the device WOULD draft for.
PROPOSE_WINDOW = 1024


def _filter_rows(
    rows: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    min_p: jnp.ndarray,
    pool: int | None = None,
) -> jnp.ndarray:
    """Apply the sampler's top-k/top-p/min-p filters to temperature-scaled
    logits, returning logits masked to NEG_INF outside the kept set.

    Mirrors sampling/ops.sample_tokens' fast path EXACTLY (same
    candidate pool, exact probabilities via a full logsumexp, rank-0
    always kept, non-candidates excluded) so a speculated row's emitted
    marginal equals what the non-speculative filtered sampler would
    draw — the caller must pass the pool candidate_pool() picked for
    these requests. rows (..., V); top_k/top_p/min_p broadcast over the
    leading dims (shape rows.shape[:-1]).
    """
    from minivllm_tpu.sampling.ops import NUM_CANDIDATES

    *lead, V = rows.shape
    B = 1
    for d in lead:
        B *= d
    flat = rows.reshape(B, V)
    tk = jnp.broadcast_to(top_k, tuple(lead)).reshape(B)
    tp = jnp.broadcast_to(top_p, tuple(lead)).reshape(B)
    mp = jnp.broadcast_to(min_p, tuple(lead)).reshape(B)
    K = min(V, pool if pool is not None else NUM_CANDIDATES)
    denom = jax.scipy.special.logsumexp(flat, axis=-1, keepdims=True)
    from minivllm_tpu.sampling.ops import chunked_top_k

    cand, idx = chunked_top_k(flat, K)             # (B, K) descending
    probs = jnp.exp(cand - denom)
    ranks = jnp.arange(K, dtype=jnp.int32)[None, :]
    k_arr = jnp.where(tk <= 0, K, jnp.minimum(tk, K))[:, None]
    keep = ranks < k_arr
    cum = jnp.cumsum(probs, axis=-1)
    keep &= (cum - probs) < tp[:, None]
    keep &= probs >= mp[:, None] * probs[:, :1]
    keep = keep.at[:, 0].set(True)                 # never filter everything
    mask = jnp.zeros((B, V), bool)
    mask = mask.at[jnp.arange(B)[:, None], idx].set(keep)
    return jnp.where(mask, flat, NEG_INF).reshape(rows.shape)


def propose_ngram(
    token_ids: list[int],
    ngram: int,
    max_draft: int,
    window: int = PROPOSE_WINDOW,
) -> list[int]:
    """Draft tokens following the most recent earlier occurrence of the
    trailing `ngram` tokens. Empty when there is no earlier occurrence
    (or the sequence is shorter than the n-gram).

    `window` bounds the backward scan so the per-step host cost stays
    O(window) for very long sequences.
    """
    L = len(token_ids)
    if max_draft <= 0 or L <= ngram:
        return []
    tail = token_ids[L - ngram:]
    lo = max(0, L - ngram - window)
    # Most recent occurrence wins (locality makes continuation
    # likelier) — but a match too close to the tail clips the
    # continuation (on period-p cycles the nearest match only yields p
    # tokens), so prefer the most recent match with a FULL max_draft
    # continuation available, falling back to the nearest partial one.
    partial = None
    for start in range(L - ngram - 1, lo - 1, -1):
        if token_ids[start:start + ngram] == tail:
            cont = token_ids[start + ngram:start + ngram + max_draft]
            if len(cont) >= max_draft:
                return list(cont)
            if partial is None:
                partial = list(cont)
    return partial if partial is not None else []


def propose_ngram_device(
    hist: jnp.ndarray,
    lens: jnp.ndarray,
    ngram: int,
    k: int,
    window: int = PROPOSE_WINDOW,
) -> jnp.ndarray:
    """In-jit n-gram proposal over a device-resident history buffer.

    hist: (S, HL) int32 token history, row s valid at [0, lens[s]);
    lens: (S,) int32 current lengths. Returns drafts (S, k) int32 with
    -1 padding past the matched continuation (all -1 when no earlier
    occurrence of the trailing n-gram exists within `window`). Matches
    the host `propose_ngram` semantics: the MOST RECENT earlier
    occurrence wins, and the continuation is clipped to the tokens that
    actually exist before the tail.

    Cost: S * window * ngram int32 compares + two small gathers —
    vector work, fully inside the fused decode scan (no host round
    trip, no extra dispatch).
    """
    S, HL = hist.shape
    # Trailing n-gram per row: positions lens - ngram + [0..ngram).
    tail_pos = lens[:, None] - ngram + jnp.arange(ngram, dtype=jnp.int32)
    tail = jnp.take_along_axis(
        hist, jnp.clip(tail_pos, 0, HL - 1), axis=1
    )  # (S, ngram)
    # Match by SHIFT-COMPARE over the whole buffer instead of gathering
    # a (S, window, ngram) candidate tensor: candidate start position p
    # matches iff hist[p + i] == tail[i] for all i < ngram — each i is
    # one statically-shifted elementwise equality, so the whole match
    # map costs ngram vector compares over (S, HL) and NO gathers
    # (measured 2.35 ms -> VPU noise per call at the serving shapes;
    # TPU gathers were the proposer's entire cost).
    NP = HL - ngram + 1  # number of candidate start positions
    match = jnp.ones((S, NP), bool)
    for i in range(ngram):
        match &= hist[:, i : i + NP] == tail[:, i : i + 1]
    p = jnp.arange(NP, dtype=jnp.int32)[None, :]                # (1, NP)
    # Valid starts: strictly before the tail (p <= lens - ngram - 1),
    # within the backward window, and the row long enough to recur.
    valid = (
        (p <= lens[:, None] - ngram - 1)
        & (p >= lens[:, None] - ngram - window)
        & (lens[:, None] >= ngram + 1)
    )
    match &= valid
    # Prefer the most recent match whose continuation has k full tokens
    # before the tail (a nearer match on a period-p cycle only yields p
    # draft tokens); fall back to the nearest partial match.
    full = match & (p + ngram + k <= lens[:, None])
    use_full = jnp.any(full, axis=1)
    any_match = jnp.any(match, axis=1)
    pick = jnp.where(use_full[:, None], full, match)
    # Most recent = LARGEST matching start position.
    mstart = jnp.max(jnp.where(pick, p, -1), axis=1)            # (S,)
    # Continuation: tokens at mstart + ngram + [0..k), clipped to the
    # tail start (don't propose the tail itself as its continuation).
    cpos = mstart[:, None] + ngram + jnp.arange(k, dtype=jnp.int32)
    cont = jnp.take_along_axis(
        hist, jnp.clip(cpos, 0, HL - 1), axis=1
    )  # (S, k)
    ok = (
        any_match[:, None]
        & (cpos < lens[:, None])
    )
    return jnp.where(ok, cont, -1).astype(jnp.int32)


def accept_or_resample(
    logits: jnp.ndarray,
    drafts: jnp.ndarray,
    temperature: jnp.ndarray,
    key: jax.Array,
    filters: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    greedy_only: bool = False,
    seeds: jnp.ndarray | None = None,
    positions: jnp.ndarray | None = None,
    pool: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact speculative sampling for a DETERMINISTIC draft proposal.

    logits: (S, k+1, V) — row i is the model's distribution at position
    len+i given [last token, draft_1..draft_i]. drafts: (S, k) int32
    (-1 = no draft at that slot). temperature: (S,) fp32; rows with 0
    use greedy acceptance (accept iff draft == argmax — bit-identical
    to plain greedy decoding).

    `filters=(top_k, top_p, min_p)` (each (S,)) applies the sampler's
    rank filters to the TARGET distribution before the rejection rule —
    p becomes the filtered softmax, matching what the non-speculative
    filtered sampler emits — so temp>0 + top_p<1 traffic (the standard
    serving operating point) can speculate. Greedy rows are unaffected:
    rank 0 survives every filter, so filtered argmax == raw argmax.

    Returns (tokens (S, k+1) int32, count (S,) int32): `count` tokens
    of each row are valid output, consisting of the accepted draft
    prefix plus one model token (the bonus on full acceptance, or the
    rejection-resampled replacement). For temperature > 0 this is the
    standard speculative-sampling rule specialized to a point-mass
    proposal q = delta(draft): accept draft d at row i with probability
    min(1, p_i(d)/1) = p_i(d); on rejection sample from the residual
    (p_i - q)+ / Z, which for a point mass is p_i with d masked out,
    renormalized — the emitted marginal is exactly p_i. A draft outside
    the filtered set has p_i(d) = 0 and is always rejected.
    """
    from minivllm_tpu.sampling.ops import fast_argmax

    S, K1, V = logits.shape
    k = K1 - 1
    logits = logits.astype(jnp.float32)
    temp = jnp.maximum(temperature, 1e-6)[:, None]            # (S, 1)
    greedy = temperature <= 0.0                               # (S,)
    argmax = fast_argmax(logits)                              # (S, k+1)

    if greedy_only:
        # All rows greedy (static, runner-decided): acceptance is pure
        # argmax equality and every emitted token is an argmax — skip
        # the softmax/log_softmax, PRNG draws, and one-hot residual
        # machinery entirely (each is a pass over (S, k+1, V)).
        accept = (drafts == argmax[:, :k]) & (drafts >= 0)
        a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
        idx = jnp.arange(K1, dtype=jnp.int32)[None, :]
        draft_part = jnp.where(idx[:, :k] < a[:, None], drafts, 0)
        final = jnp.take_along_axis(argmax, a[:, None], axis=1)
        tokens = jnp.zeros((S, K1), jnp.int32)
        tokens = tokens.at[:, :k].set(draft_part)
        tokens = jnp.where(idx == a[:, None], final, tokens)
        return tokens.astype(jnp.int32), (a + 1).astype(jnp.int32)

    rows = logits / temp[..., None]
    if filters is not None:
        top_k, top_p, min_p = filters
        rows = _filter_rows(
            rows, top_k[:, None], top_p[:, None], min_p[:, None],
            pool=pool,
        )
    logp = jax.nn.log_softmax(rows, axis=-1)                  # (S, k+1, V)
    dclip = jnp.clip(drafts, 0, V - 1)
    # p_i(draft_{i+1}) for i in [0, k)
    p_draft = jnp.exp(
        jnp.take_along_axis(logp[:, :k, :], dclip[:, :, None], axis=2)
    )[:, :, 0]                                                # (S, k)
    if seeds is not None:
        # Per-request seeds: a seeded row's draws derive from
        # (seed, first emission position) ONLY — the same contract as
        # sampling/ops._row_keys, so seeded requests reproduce across
        # engine restarts, batch compositions, and spec on/off toggles
        # of OTHER requests. salts 0/1/2 separate the three draw uses.
        def row_key(seed, pos, i, salt):
            seeded_k = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.PRNGKey(jnp.maximum(seed, 0)), pos
                ),
                salt,
            )
            base = jax.random.fold_in(jax.random.fold_in(key, i), salt)
            return jnp.where(seed >= 0, seeded_k, base)

        idx = jnp.arange(S, dtype=jnp.int32)
        keyed = lambda salt: jax.vmap(  # noqa: E731
            lambda s_, p_, i_: row_key(s_, p_, i_, salt)
        )(seeds, positions.astype(jnp.int32), idx)
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (k,)))(keyed(0))
    else:
        ks = jax.random.split(key, 3)
        u = jax.random.uniform(ks[0], (S, k))
    has_draft = drafts >= 0
    accept = jnp.where(
        greedy[:, None],
        drafts == argmax[:, :k],
        u < p_draft,
    ) & has_draft                                             # (S, k)
    # Longest accepted prefix: a = number of leading True.
    a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
    # Residual resample at the rejection row: p with the draft masked.
    # Only mask where a draft actually exists — a no-draft slot (-1,
    # dclip 0) stops the run vacuously, and its "resample" must be a
    # plain draw from p (masking token 0 there would skew the marginal).
    masked = jnp.where(
        jax.nn.one_hot(dclip, V, dtype=bool) & has_draft[:, :, None],
        -jnp.inf,
        rows[:, :k, :],
    )
    if seeds is not None:
        sampled = jax.vmap(
            lambda kk, lg: jax.random.categorical(kk, lg, axis=-1)
        )(keyed(1), rows).astype(jnp.int32)                   # (S, k+1)
        resampled = jax.vmap(
            lambda kk, lg: jax.random.categorical(kk, lg, axis=-1)
        )(keyed(2), masked).astype(jnp.int32)                 # (S, k)
    else:
        # Sampled token per row (for the bonus / final row).
        sampled = jax.random.categorical(ks[1], rows, axis=-1).astype(
            jnp.int32
        )
        resampled = jax.random.categorical(ks[2], masked, axis=-1).astype(
            jnp.int32
        )                                                     # (S, k)
    # Token emitted at row i: accepted rows emit the draft they
    # verified EXCEPT the stream actually emits the model's token at
    # each position: positions 0..a-1 emit drafts (== argmax for
    # greedy), position a emits the model token (bonus or resample).
    idx = jnp.arange(K1, dtype=jnp.int32)[None, :]            # (1, k+1)
    model_tok = jnp.where(greedy[:, None], argmax, sampled)   # (S, k+1)
    # Rejection replacement only exists for rows < k.
    reject_tok = jnp.where(
        greedy[:, None],
        argmax[:, :k],
        resampled,
    )
    # Assemble: for i < a -> drafts[i] (verified); i == a -> if a == k
    # the bonus model_tok[:, k], else reject_tok[:, a]; i > a invalid.
    draft_part = jnp.where(idx[:, :k] < a[:, None], drafts, 0)
    final = jnp.where(
        a[:, None] == k,
        model_tok[:, k:k + 1],
        jnp.take_along_axis(
            reject_tok, jnp.clip(a[:, None], 0, k - 1), axis=1
        ) if k > 0 else model_tok[:, :1],
    )                                                          # (S, 1)
    tokens = jnp.zeros((S, K1), jnp.int32)
    tokens = tokens.at[:, :k].set(draft_part)
    tokens = jnp.where(idx == a[:, None], final, tokens)
    count = a + 1
    return tokens.astype(jnp.int32), count.astype(jnp.int32)
