"""N-gram (prompt-lookup) speculative decoding: proposer unit tests and
engine-level greedy bit-parity (speculation must never change tokens,
only the number of model passes)."""

import numpy as np
import pytest

from minivllm_tpu import LLM, Config, SamplingParams
from minivllm_tpu.engine.spec import propose_ngram
from minivllm_tpu.utils.testing import make_tiny_checkpoint


def test_propose_ngram_basic():
    #            0  1  2  3  4  5  6  7
    toks = [5, 6, 7, 8, 9, 5, 6]  # trailing (5, 6) recurs at start
    assert propose_ngram(toks, 2, 3) == [7, 8, 9]
    assert propose_ngram(toks, 2, 2) == [7, 8]
    # no earlier occurrence
    assert propose_ngram([1, 2, 3, 4], 2, 4) == []
    # the most recent occurrence with a FULL-length continuation wins
    # (a nearer match would clip the draft); here only the first
    # occurrence has 4 tokens after it
    toks = [1, 2, 9, 1, 2, 8, 1, 2]
    assert propose_ngram(toks, 2, 4) == [9, 1, 2, 8]
    # shorter requests can use the nearer match (3 tokens follow it)
    assert propose_ngram(toks, 2, 3) == [8, 1, 2]
    assert propose_ngram(toks, 2, 2) == [8, 1]
    # degenerate sizes
    assert propose_ngram([1], 2, 4) == []
    assert propose_ngram([1, 2, 3], 2, 0) == []


def test_propose_ngram_window():
    toks = [7, 7] + [0] * 2000 + [7, 7]
    assert propose_ngram(toks, 2, 2, window=100) == []
    assert propose_ngram(toks, 2, 2, window=3000) == [0, 0]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_tiny_checkpoint(
        "qwen3", tmp_path_factory.mktemp("spec") / "m",
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        hidden_size=64, vocab_size=256,
    )


def _generate(ckpt, spec_k, prompts, max_tokens=24, impl="xla", fused=True,
              **cfg_kw):
    cfg = Config(
        model=str(ckpt), max_num_seqs=8, max_model_len=256,
        max_num_batched_tokens=512, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl=impl,
        decode_multi_step=8, speculative_num_tokens=spec_k,
        speculative_fused=fused, **cfg_kw,
    )
    llm = LLM(cfg)
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       ignore_eos=True),
        use_tqdm=False,
    )
    return [o["token_ids"] for o in outs], llm.get_stats()


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_engine_greedy_parity_with_speculation(ckpt, impl):
    """Repetitive prompts (n-gram hits likely) through the engine with
    speculation on vs off: token streams must be IDENTICAL, and the
    speculative path must actually have engaged and accepted drafts.
    Runs on both the XLA oracle and the (interpreted) Pallas prefill
    path — the verification rows ride the prefill attention kernels."""
    rng = np.random.default_rng(0)
    base = [int(t) for t in rng.integers(1, 200, 12)]
    prompts = [
        base * 4,                                   # strong repetition
        (base + [7, 9]) * 3,                        # repetition, offset
        [int(t) for t in rng.integers(1, 200, 40)],  # random: no drafts
    ]
    ref, ref_stats = _generate(ckpt, 0, prompts, impl=impl)
    out, stats = _generate(ckpt, 4, prompts, impl=impl)
    assert out == ref, "speculation changed greedy tokens"
    assert ref_stats["ngram_spec_steps"] == 0
    assert stats["ngram_spec_steps"] > 0, "speculation never engaged"
    # A tiny random model may rarely follow the prompt's repetition, but
    # drafts must at least have been proposed and verified.
    assert stats["ngram_spec_drafted"] > 0


def test_speculation_respects_max_tokens_and_eos(ckpt):
    """max_tokens=3 with highly-repetitive prompts: the accepted run is
    clipped by postprocess exactly like plain decoding."""
    prompts = [[3, 4] * 10, [9, 8, 7] * 8]
    ref, _ = _generate(ckpt, 0, prompts, max_tokens=3)
    out, _ = _generate(ckpt, 4, prompts, max_tokens=3)
    assert out == ref
    assert all(len(t) == 3 for t in out)


def test_full_acceptance_and_draft_kv_correctness(ckpt, monkeypatch):
    """HOST path (speculative_fused=False): force full acceptance by
    monkeypatching the proposer with an oracle that drafts the TRUE
    greedy continuation (precomputed with speculation off). Every draft
    then matches argmax, multi-token appends run every step, and —
    critically — later tokens attend to KV that the verification pass
    wrote for draft rows: any error there diverges the stream. (The
    fused path's draft-KV correctness is covered by the greedy-parity
    tests: accepted drafts' KV feeds every later token there too.)"""
    prompt = [11, 23, 5, 8, 19, 3]
    ref, _ = _generate(ckpt, 0, [prompt], max_tokens=16)
    truth = prompt + ref[0]

    import minivllm_tpu.engine.spec as spec_mod

    def oracle(token_ids, ngram, max_draft, window=1024):
        L = len(token_ids)
        if token_ids != truth[:L] or max_draft <= 0:
            return []
        return truth[L:L + max_draft]

    monkeypatch.setattr(spec_mod, "propose_ngram", oracle)
    out, stats = _generate(ckpt, 4, [prompt], max_tokens=16, fused=False)
    assert out == ref
    assert stats["ngram_spec_steps"] > 0
    assert stats["ngram_spec_accepted"] == stats["ngram_spec_drafted"] > 0
    # full acceptance of k=3 drafts (clamped by lookahead) + bonus each
    # pass: 16 tokens in ~4 verification steps instead of 16 decodes
    assert stats["ngram_spec_steps"] <= 6


def test_acceptance_gate_backs_off(ckpt):
    """Repetitive prompts that the (random-weight) model does NOT
    continue: drafts fire but acceptance stays near zero, so the
    adaptive gate must put speculation on cooldown — engaged steps stay
    well below the generated-token count. (Full-acceptance workloads
    keep the gate open: see test_full_acceptance_...)."""
    rng = np.random.default_rng(8)
    base = [int(t) for t in rng.integers(1, 200, 10)]
    prompts = [base * 6 for _ in range(4)]
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=512,
        max_num_batched_tokens=512, kvcache_block_size=16,
        num_kvcache_blocks=256, dtype="float32", attention_impl="xla",
        decode_multi_step=8, speculative_num_tokens=4,
    )
    llm = LLM(cfg)
    # small windows so the test converges quickly
    llm.SPEC_GATE_WINDOW = 8
    llm.SPEC_GATE_COOLDOWN = 20
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=120, ignore_eos=True),
        use_tqdm=False,
    )
    st = llm.get_stats()
    generated = sum(len(o["token_ids"]) for o in outs)
    assert st["ngram_spec_steps"] > 0
    if st["ngram_spec_accepted"] < 0.2 * st["ngram_spec_drafted"]:
        # acceptance poor -> the gate must have limited engagement
        assert st["ngram_spec_steps"] * 4 < generated, (
            st["ngram_spec_steps"], generated
        )


def test_device_proposer_matches_host():
    """propose_ngram_device (the fused path's in-jit proposer) must
    reproduce the host propose_ngram exactly: most recent occurrence,
    continuation clipping, window bound, degenerate sizes."""
    import jax.numpy as jnp

    from minivllm_tpu.engine.spec import propose_ngram_device

    rng = np.random.default_rng(0)
    S, HL, ngram, k = 24, 256, 2, 4
    hist = np.full((S, HL), -1, np.int32)
    lens = np.zeros(S, np.int32)
    for s in range(S):
        L = int(rng.integers(1, 220))
        hist[s, :L] = rng.integers(0, 10, L)  # tiny vocab -> many repeats
        lens[s] = L
    dev = np.asarray(propose_ngram_device(
        jnp.asarray(hist), jnp.asarray(lens), ngram, k, window=64
    ))
    for s in range(S):
        host = propose_ngram(list(hist[s, :lens[s]]), ngram, k, window=64)
        got = [int(t) for t in dev[s] if t >= 0]
        assert got == host, (s, host, got)


def test_accept_or_resample_greedy_and_distribution():
    """Greedy rows accept by argmax equality (bit-identical semantics);
    sampled rows' emitted-token marginal equals softmax(logits/T)
    exactly (Monte Carlo over the worst-case draft = the mode)."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.engine.spec import accept_or_resample

    rng = np.random.default_rng(1)
    k, V = 4, 16
    logits = jnp.asarray(rng.normal(0, 2, (3, k + 1, V)).astype(np.float32))
    am = np.asarray(jnp.argmax(logits, -1))
    drafts = np.stack([
        am[0, :k],                                     # full accept
        np.r_[am[1, 0], (am[1, 1] + 1) % V, am[1, 2:k]],  # reject row 1
        np.full(k, -1),                                # no drafts
    ]).astype(np.int32)
    toks, cnt = accept_or_resample(
        logits, jnp.asarray(drafts), jnp.zeros(3), jax.random.PRNGKey(0)
    )
    toks, cnt = np.asarray(toks), np.asarray(cnt)
    assert cnt[0] == k + 1 and (toks[0] == am[0]).all()
    assert cnt[1] == 2 and (toks[1, :2] == am[1, :2]).all()
    assert cnt[2] == 1 and toks[2, 0] == am[2, 0]

    V = 8
    row = rng.normal(0, 1.5, (1, 2, V)).astype(np.float32)
    T = 0.9
    p = np.exp(row[0, 0] / T)
    p /= p.sum()
    draft = np.asarray([[int(np.argmax(p))]], np.int32)
    N = 20000
    first = np.asarray(jax.jit(lambda key: accept_or_resample(
        jnp.asarray(np.repeat(row, N, 0)), jnp.asarray(np.repeat(draft, N, 0)),
        jnp.full((N,), T, jnp.float32), key)[0][:, 0]
    )(jax.random.PRNGKey(2)))
    emp = np.bincount(first, minlength=V) / N
    assert np.abs(emp - p).max() < 0.015, (emp, p)


def test_accept_or_resample_no_draft_marginal():
    """A row with NO draft at the stopping slot (drafts == -1, the
    common no-n-gram-match case) must emit a plain draw from p — in
    particular token id 0 must remain reachable (a regression masked it
    out because the -1 draft clipped to 0)."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.engine.spec import accept_or_resample

    rng = np.random.default_rng(3)
    V, k, T = 8, 2, 0.8
    row = rng.normal(0, 1.0, (1, k + 1, V)).astype(np.float32)
    # make token 0 the LIKELIEST so any masking bias is unmissable
    row[0, 0, 0] += 2.0
    p = np.exp(row[0, 0] / T)
    p /= p.sum()
    draft = np.full((1, k), -1, np.int32)
    N = 20000
    toks, cnt = jax.jit(lambda key: accept_or_resample(
        jnp.asarray(np.repeat(row, N, 0)),
        jnp.asarray(np.repeat(draft, N, 0)),
        jnp.full((N,), T, jnp.float32), key,
    ))(jax.random.PRNGKey(4))
    assert int(np.asarray(cnt).max()) == 1  # nothing to accept
    emp = np.bincount(np.asarray(toks)[:, 0], minlength=V) / N
    assert np.abs(emp - p).max() < 0.015, (emp, p)


def test_accept_or_resample_filtered_marginal():
    """With filters=(top_k, top_p, min_p) the emitted marginal must equal
    the FILTERED softmax — the same distribution the non-speculative
    sampler pipeline draws from — both when the draft is inside the kept
    set (accept/resample split) and when it falls outside (p(d)=0,
    always rejected)."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.engine.spec import accept_or_resample

    rng = np.random.default_rng(9)
    V, k, T = 16, 1, 0.7
    row = rng.normal(0, 1.5, (1, k + 1, V)).astype(np.float32)
    scaled = row[0, 0] / T
    probs = np.exp(scaled - scaled.max())
    probs /= probs.sum()
    order = np.argsort(-probs)
    # expected filtered distribution: top_p = 0.9 nucleus
    top_p = 0.9
    keep = np.zeros(V, bool)
    cum = 0.0
    for i in order:
        keep[i] = True  # kept iff cumulative mass BEFORE it < top_p
        cum += probs[i]
        if cum >= top_p:
            break
    p_f = np.where(keep, probs, 0.0)
    p_f /= p_f.sum()

    N = 40000
    filters = (
        jnp.full((N,), -1, jnp.int32),
        jnp.full((N,), top_p, jnp.float32),
        jnp.zeros((N,), jnp.float32),
    )

    def run(draft_tok, seed):
        draft = np.full((1, k), draft_tok, np.int32)
        toks, _ = jax.jit(lambda key: accept_or_resample(
            jnp.asarray(np.repeat(row, N, 0)),
            jnp.asarray(np.repeat(draft, N, 0)),
            jnp.full((N,), T, jnp.float32), key, filters=filters,
        ))(jax.random.PRNGKey(seed))
        return np.bincount(np.asarray(toks)[:, 0], minlength=V) / N

    # draft = the mode (worst case for resample correctness)
    emp = run(int(order[0]), 11)
    assert np.abs(emp - p_f).max() < 0.015, (emp, p_f)
    # draft OUTSIDE the nucleus: always rejected, marginal still p_f
    outside = int(order[-1])
    assert not keep[outside]
    emp = run(outside, 12)
    assert np.abs(emp - p_f).max() < 0.015, (emp, p_f)


def test_fused_spec_pallas_short_prompt_parity(ckpt):
    """Fused speculation on the Pallas backend with prompts SHORTER than
    one KV block: the multi-row verify items (decode_attention qrows)
    must handle rows whose context is below one block and partial-block
    tails exactly — greedy parity against the non-speculative run."""
    prompts = [
        [3, 4] * 4,            # 8 tokens < block_size 16
        [9, 8, 7] * 3,         # 9 tokens
        [5, 6] * 20,           # 40 tokens: crosses blocks, groups engage
    ]
    ref, _ = _generate(ckpt, 0, prompts, impl="pallas_interpret")
    out, stats = _generate(ckpt, 4, prompts, impl="pallas_interpret")
    assert out == ref, "fused spec diverged on short-prompt Pallas path"
    assert stats["ngram_spec_steps"] > 0


@pytest.mark.skipif(
    __import__("jax").device_count() < 4, reason="needs 4 virtual devices"
)
def test_fused_spec_grouped_on_dp_tp_mesh(ckpt):
    """Fused speculation on a dp x tp mesh (interpret-mode kernels):
    the multi-row verify items compose with dp row sharding (each
    sequence's k+1 rows are contiguous within one dp chunk) — token
    streams must be bit-identical to the mesh-less run."""
    rng = np.random.default_rng(2)
    base = [int(t) for t in rng.integers(1, 200, 12)]
    prompts = [base * 4, (base + [7]) * 3, [3, 4] * 20,
               [int(t) for t in rng.integers(1, 200, 40)]]
    ref, _ = _generate(ckpt, 0, prompts, impl="pallas_interpret")
    out, stats = _generate(
        ckpt, 4, prompts, impl="pallas_interpret",
        data_parallel_size=2, tensor_parallel_size=2,
    )
    assert out == ref, "fused spec diverged on dp x tp mesh"
    assert stats["ngram_spec_steps"] > 0


def test_fused_and_host_paths_agree_greedy(ckpt):
    """Greedy streams through the FUSED in-jit path and the HOST
    verify path must both equal plain decoding (hence each other)."""
    rng = np.random.default_rng(5)
    base = [int(t) for t in rng.integers(1, 200, 12)]
    prompts = [base * 4, [int(t) for t in rng.integers(1, 200, 30)]]
    ref, _ = _generate(ckpt, 0, prompts)
    fused, fstats = _generate(ckpt, 4, prompts, fused=True)
    host, hstats = _generate(ckpt, 4, prompts, fused=False)
    assert fused == ref
    assert host == ref
    assert fstats["ngram_spec_steps"] > 0


def test_sampled_requests_and_speculation(ckpt):
    """temperature > 0 requests: the FUSED path speculates via exact
    rejection sampling (engine/spec.py accept_or_resample); the HOST
    path is greedy-only and must stay disabled. Filtered sampling
    (top_p < 1, the standard serving point) speculates too — the
    filters apply to the verify distribution. typical_p reorders the
    kept set and must stay disabled."""

    def run(fused, top_p=1.0, temperature=0.8, typical_p=1.0):
        cfg = Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=256, kvcache_block_size=16,
            num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
            decode_multi_step=8, speculative_num_tokens=4, seed=7,
            speculative_fused=fused,
        )
        llm = LLM(cfg)
        outs = llm.generate(
            [[1, 2] * 8, [5, 6] * 8],
            SamplingParams(temperature=temperature, top_p=top_p,
                           typical_p=typical_p,
                           max_tokens=8, ignore_eos=True),
            use_tqdm=False,
        )
        assert all(len(o["token_ids"]) == 8 for o in outs)
        return llm.get_stats()["ngram_spec_steps"]

    assert run(fused=True) > 0, "fused speculation skipped sampled rows"
    assert run(fused=False) == 0
    assert run(fused=True, top_p=0.9) > 0, (
        "filtered sampling must speculate (rejection against the "
        "filtered distribution)"
    )
    assert run(fused=True, typical_p=0.8) == 0, "typical_p must disable"
    # top_p is INERT under argmax: greedy requests speculate through it
    assert run(fused=True, top_p=0.9, temperature=0.0) > 0


def test_seeded_requests_speculate_reproducibly(ckpt):
    """Per-request seeds speculate on the fused path: draws derive from
    (seed, emission position) per row, so a seeded request reproduces
    exactly across engines — and across spec-on/spec-off of OTHER rows
    in the batch (the key chain never touches the shared step key)."""

    def run(seed, spec=True, extra=None):
        cfg = Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=256, kvcache_block_size=16,
            num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
            decode_multi_step=8,
            speculative_num_tokens=4 if spec else 0,
            speculative_fused=spec, seed=7,
        )
        llm = LLM(cfg)
        prompts = [[1, 2] * 8]
        sps = [SamplingParams(temperature=0.9, max_tokens=8,
                              ignore_eos=True, seed=seed)]
        if extra is not None:
            prompts.append([5, 6] * 8)
            sps.append(extra)
        outs = llm.generate(prompts, sps, use_tqdm=False)
        steps = llm.get_stats()["ngram_spec_steps"]
        return outs[0]["token_ids"], steps

    a, steps_a = run(seed=1234)
    assert steps_a > 0, "seeded request did not speculate"
    b, _ = run(seed=1234)
    assert a == b, "seeded spec run not reproducible"
    c, _ = run(seed=1234, extra=SamplingParams(
        temperature=0.7, max_tokens=8, ignore_eos=True))
    assert a == c, "seeded row affected by unseeded batchmate"
    d, _ = run(seed=4321)
    assert a != d, "different seeds produced identical streams"
