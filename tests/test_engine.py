"""End-to-end engine tests on a tiny random checkpoint (CPU, no network).

Covers the reference's mocked integration tier (tests/test_llm_engine.py,
test_llm.py) but with the real runner and real generation.
"""

import jax
import numpy as np
import pytest

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.llm import LLM
from minivllm_tpu.utils.testing import make_tiny_checkpoint


@pytest.fixture(autouse=True)
def _clear_caches_after_each_test():
    """This module's warmup-coverage tests compile a few hundred XLA:CPU
    programs EACH — past ~300 live executables the CPU backend
    segfaults inside backend_compile (see conftest's module-scoped
    clearing). Drop the jit caches after every test here so the live
    count stays bounded within the module; the module-scoped `llm`
    fixture's programs recompile on next use (cheap on CPU)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="module")
def tiny_qwen3(tmp_path_factory):
    return make_tiny_checkpoint("qwen3", tmp_path_factory.mktemp("m") / "qwen3")


@pytest.fixture(scope="module")
def llm(tiny_qwen3):
    cfg = Config(
        model=str(tiny_qwen3),
        max_num_seqs=8,
        max_model_len=256,
        max_num_batched_tokens=256,
        kvcache_block_size=16,
        num_kvcache_blocks=128,
        dtype="float32",
        attention_impl="xla",
    )
    return LLM(cfg)


def hf_greedy(model_dir, prompt, n):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir).eval()
    toks = list(prompt)
    with torch.no_grad():
        for _ in range(n):
            logits = model(torch.tensor([toks])).logits[0, -1]
            toks.append(int(logits.argmax()))
    return toks[len(prompt):]


def test_generate_greedy_matches_hf(llm, tiny_qwen3):
    prompt = [11, 47, 3, 88, 120, 9, 55]
    out = llm.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True),
        use_tqdm=False,
    )
    ref = hf_greedy(tiny_qwen3, prompt, 12)
    assert out[0]["token_ids"] == ref


def test_generate_batch_mixed_lengths(llm, tiny_qwen3):
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 190, n)) for n in (5, 23, 17, 40)]
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs) == 4
    for p, o in zip(prompts, outs):
        assert o["token_ids"] == hf_greedy(tiny_qwen3, p, 8)


def test_fully_cached_prompt_reroutes_to_decode(llm, tiny_qwen3):
    """Re-serving an identical prompt (every block a prefix-cache hit,
    one token left to compute) runs as a decode step and still matches
    greedy HF output exactly."""
    rng = np.random.default_rng(3)
    prompt = list(rng.integers(1, 190, 32))  # two full 16-token blocks
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    first = llm.generate([prompt], sp, use_tqdm=False)
    prefill_before = llm.model_runner.total_prefill_tokens
    again = llm.generate([prompt], sp, use_tqdm=False)
    # the rerouted single-token step counts as decode work
    assert llm.model_runner.total_prefill_tokens == prefill_before
    assert again[0]["token_ids"] == first[0]["token_ids"]
    assert first[0]["token_ids"] == hf_greedy(tiny_qwen3, prompt, 6)


def test_generate_per_prompt_params(llm):
    prompts = [[1, 2, 3], [4, 5, 6, 7]]
    outs = llm.generate(
        prompts,
        [
            SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
            SamplingParams(temperature=0.8, top_p=0.9, max_tokens=6, ignore_eos=True),
        ],
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 3
    assert len(outs[1]["token_ids"]) == 6


def test_prefix_cache_reuse_consistent(llm, tiny_qwen3):
    """Second request sharing a >=1-block prefix must produce identical
    greedy output despite skipping cached prefill tokens."""
    rng = np.random.default_rng(1)
    shared = list(rng.integers(1, 190, 16))  # exactly one 16-token block
    a = shared + [7, 8]
    b = shared + [9, 10, 11]
    out_a = llm.generate(
        [a], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )
    hits_before = llm.scheduler.block_manager.stats["prefix_cache_hits"]
    out_b = llm.generate(
        [b], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )
    hits_after = llm.scheduler.block_manager.stats["prefix_cache_hits"]
    assert hits_after > hits_before
    assert out_a[0]["token_ids"] == hf_greedy(tiny_qwen3, a, 6)
    assert out_b[0]["token_ids"] == hf_greedy(tiny_qwen3, b, 6)


def test_eos_stops_generation(llm, tiny_qwen3):
    # Set eos to the first token value that makes its first appearance
    # mid-continuation; generation must stop there (inclusive).
    prompt = [11, 47, 3, 88]
    ref = hf_greedy(tiny_qwen3, prompt, 8)
    eos = ref[0]
    k = ref.index(eos)
    llm.config.eos = eos
    llm.scheduler.eos = eos
    try:
        out = llm.generate(
            [prompt], SamplingParams(temperature=0.0, max_tokens=8),
            use_tqdm=False,
        )
        assert out[0]["token_ids"] == ref[: k + 1]
    finally:
        llm.config.eos = -1
        llm.scheduler.eos = -1


def test_add_request_and_step_api(llm):
    sid = llm.add_request([5, 6, 7], SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True))
    assert isinstance(sid, int)
    outs = []
    while not llm.is_finished():
        finished, n = llm.step()
        outs += finished
    assert len(outs) == 1
    assert outs[0][0] == sid
    assert len(outs[0][1]) == 2


def test_repetition_penalty_end_to_end(llm):
    """Greedy decoding of a degenerate random model loops on one token; a
    strong repetition penalty must break the loop."""
    prompt = [11, 47, 3, 88, 120]
    plain = llm.generate(
        [prompt], SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
        use_tqdm=False,
    )[0]["token_ids"]
    penalized = llm.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True,
                       repetition_penalty=50.0),
        use_tqdm=False,
    )[0]["token_ids"]
    # plain greedy repeats; penalized must produce more distinct tokens
    assert len(set(penalized)) > len(set(plain))


def test_sampling_reproducible_with_seed(tiny_qwen3):
    def run():
        cfg = Config(
            model=str(tiny_qwen3), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
            seed=42,
        )
        llm = LLM(cfg)
        out = llm.generate(
            [[3, 1, 4, 1, 5]],
            SamplingParams(temperature=1.0, top_p=0.9, max_tokens=10, ignore_eos=True),
            use_tqdm=False,
        )
        return out[0]["token_ids"]

    assert run() == run()


def test_preemption_recovers_correct_output(tiny_qwen3):
    """Memory pressure forces preempt-youngest + recompute-from-scratch;
    final greedy outputs must equal an unconstrained run's (reference
    behavior: scheduler.py:250-266, recompute softened by prefix cache)."""
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(1, 190, size=n)) for n in (30, 37, 25)]

    def run(num_blocks):
        llm = LLM(Config(
            model=str(tiny_qwen3), max_num_seqs=8, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=num_blocks, dtype="float32",
            attention_impl="xla",
        ))
        outs = llm.generate(prompts, sp, use_tqdm=False)
        stats = llm.get_stats()
        llm.exit()
        return [o["token_ids"] for o in outs], stats

    ample, _ = run(64)
    # 10 blocks: 3 seqs eventually need 4 blocks each (37+24 tokens) and
    # can't all fit -> the youngest gets preempted and recomputed
    tight, stats = run(10)
    assert stats["num_preemptions"] > 0, "expected memory-pressure preemption"
    assert tight == ample


def test_warmup_precompiles_buckets(llm):
    """After warmup, a generate hitting the warmed buckets triggers no
    new jit compilation (cache sizes across compiled step fns stay
    fixed), and the prefix-cache hash table stays clean."""
    import numpy as np

    runner = llm.model_runner
    bm = llm.scheduler.block_manager
    hashes_before = dict(bm.hash_to_block_id)
    runs = llm.warmup(prompt_len=24, batch_sizes=[2], max_tokens=[3, 2],
                      prefill_buckets=False)
    # 3 width classes x (2 windows x (2 core + 3 aux_win) + 9 aux)
    assert runs == 57
    assert bm.enable_prefix_caching  # restored
    # dummy prompts left no NEW cache entries (cycling blocks through
    # the free list may evict tombstones of already-freed blocks — they
    # were only resurrection candidates — but nothing may be added)
    assert set(bm.hash_to_block_id) <= set(hashes_before)

    def cache_sizes():
        return {
            k: fn._cache_size() for k, fn in runner._compiled.items()
        }
    before = cache_sizes()
    rng = np.random.default_rng(9)
    prompts = [[int(t) for t in rng.integers(1, 150, 24)] for _ in range(2)]
    for sp in (
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
        # logprob/penalty variants are part of the warmed set too (any
        # requested k rides the fixed top-20 program)
        SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                       logprobs=4),
        SamplingParams(temperature=0.8, top_p=0.95, max_tokens=2,
                       ignore_eos=True, repetition_penalty=1.3, logprobs=2),
    ):
        llm.generate(prompts, sp, use_tqdm=False)
    after = cache_sizes()
    assert after == before, "post-warmup generate triggered a new compile"


def test_warmup_covers_all_prompt_lengths(tiny_qwen3):
    """Full warmup (prefill-bucket sweep on): a first request at ANY
    prompt length — bucket boundaries, width-class straddles, and a
    chunked long prompt — triggers zero new compiles."""
    import numpy as np

    llm = LLM(Config(
        model=str(tiny_qwen3), max_num_seqs=4, max_model_len=256,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=128, dtype="float32", attention_impl="xla",
    ))
    llm.warmup(batch_sizes=[2], max_tokens=[2])
    runner = llm.model_runner

    def cache_sizes():
        return {k: fn._cache_size() for k, fn in runner._compiled.items()}

    before = cache_sizes()
    rng = np.random.default_rng(11)
    # Adversarial lengths: inside each bucket, at straddles, and beyond
    # the batch budget (chunked prefill) — greedy, sampled, and the
    # logprob/penalty/prompt-logprob variants a real serving session
    # mixes in (the round-3 caveat: these used to compile lazily).
    for L in (1, 5, 33, 65, 100, 128, 129, 200, 250):
        for sp in (
            SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True),
            SamplingParams(temperature=0.8, top_p=0.95, max_tokens=2,
                           ignore_eos=True),
            SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                           logprobs=5),
            SamplingParams(temperature=0.8, top_p=0.95, max_tokens=2,
                           ignore_eos=True, repetition_penalty=1.2),
            SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                           prompt_logprobs=3),
        ):
            prompt = [int(t) for t in rng.integers(1, 150, L)]
            llm.generate([prompt], sp, use_tqdm=False)
    assert cache_sizes() == before, (
        "a prompt length triggered a post-warmup compile"
    )
    llm.exit()


def test_warmup_covers_mixed_session_zero_compiles(tmp_path):
    """Round-5 closure of the warmup program space (the round-4 caveat:
    typical/seeded at non-dominant windows and shared-prefix group
    shapes stayed lazy): after warmup, a mixed session using typical_p,
    seeds, and n>1 KV-forked groups across window sizes triggers ZERO
    new compiles. Group shapes are warmable because _detect_groups
    collapses (G, Gmax, Wg) to <= 2 classes each."""
    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / "m",
        num_attention_heads=4, num_key_value_heads=2, head_dim=128,
        hidden_size=64,
    )
    llm = LLM(Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=256, kvcache_block_size=16,
        num_kvcache_blocks=128, dtype="float32",
        attention_impl="pallas_interpret", decode_multi_step=2,
    ))
    # Make tiny sharing worthwhile BEFORE warmup: gen_forked gates on
    # the same threshold the serving-time detector uses.
    llm.model_runner.SHARED_PREFIX_MIN_SAVED_TOKENS = 1
    # prefill_buckets off: the prompt-length sweep is covered by
    # test_warmup_covers_all_prompt_lengths, and the full sweep would
    # blow the XLA:CPU ~300-live-executable limit in one process.
    llm.warmup(batch_sizes=[4], max_tokens=[2, 3], prefill_buckets=False)
    runner = llm.model_runner

    def cache_sizes():
        return {k: fn._cache_size() for k, fn in runner._compiled.items()}

    before = cache_sizes()
    rng = np.random.default_rng(21)
    session = [
        SamplingParams(temperature=0.8, typical_p=0.9, max_tokens=3,
                       ignore_eos=True),
        SamplingParams(temperature=0.8, seed=42, max_tokens=3,
                       ignore_eos=True),
        SamplingParams(temperature=0.8, typical_p=0.8, seed=9,
                       max_tokens=2, ignore_eos=True),
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                       n=2),
        SamplingParams(temperature=0.8, top_p=0.95, max_tokens=3,
                       ignore_eos=True, n=2),
    ]
    for L in (28, 64):
        for sp in session:
            n_prompts = 2 if sp.n > 1 else 4
            prompts = [
                [int(t) for t in rng.integers(1, 150, L)]
                for _ in range(n_prompts)
            ]
            llm.generate(prompts, sp, use_tqdm=False)
    assert llm.get_stats()["shared_prefix_steps"] > 0, (
        "forked session never formed groups"
    )
    assert cache_sizes() == before, (
        "mixed typical/seeded/forked session triggered a post-warmup compile"
    )
    llm.exit()


def test_typical_p_applies_on_single_step_decode(llm):
    """Regression: the single-step decode path dropped typical_active,
    silently ignoring typical_p (the fused-window and prefill paths
    applied it). With typical_p ~ 0 the kept set collapses to the single
    most-typical token, so the emitted stream is deterministic and must
    match between the fused-window path and the single-step path (forced
    via logprobs, which gates the window off)."""
    prompt = [3, 9, 27, 81]
    # Per-request seed: draws depend on (seed, position) only, so the
    # two paths emit identical streams iff they apply the same filters.
    fused = llm.generate(
        [prompt],
        SamplingParams(temperature=1.0, typical_p=0.01, max_tokens=8,
                       ignore_eos=True, seed=5),
        use_tqdm=False,
    )[0]["token_ids"]
    single = llm.generate(
        [prompt],
        SamplingParams(temperature=1.0, typical_p=0.01, max_tokens=8,
                       ignore_eos=True, seed=5, logprobs=0),
        use_tqdm=False,
    )[0]["token_ids"]
    assert fused == single, "single-step decode ignored typical_p"


def test_warmup_oom_shrinks_kv_cache(tiny_qwen3):
    """A device RESOURCE_EXHAUSTED during warmup (mis-estimated compile
    workspace) shrinks the KV cache and retries instead of failing boot;
    the engine then serves correctly on the smaller cache."""
    llm = LLM(Config(
        model=str(tiny_qwen3), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
    ))
    runner = llm.model_runner
    blocks_before = runner.num_blocks
    real_run = runner.run
    state = {"raised": 0}

    def oom_once(*a, **kw):
        if state["raised"] < 2:
            state["raised"] += 1
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating 123 bytes"
            )
        return real_run(*a, **kw)

    runner.run = oom_once
    llm.warmup(batch_sizes=[2], max_tokens=[2], sampled=False,
               prefill_buckets=False)
    runner.run = real_run
    assert state["raised"] == 2
    assert runner.num_blocks < blocks_before
    assert llm.config.num_kvcache_blocks == runner.num_blocks
    assert llm.scheduler.block_manager.enable_prefix_caching  # restored
    # serving still works and matches a fresh engine on the small cache
    prompts = [[1, 5, 9, 2], [3, 7, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    got = [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]
    llm.exit()
    ref_llm = LLM(Config(
        model=str(tiny_qwen3), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=16, dtype="float32", attention_impl="xla",
    ))
    ref = [o["token_ids"] for o in ref_llm.generate(prompts, sp,
                                                    use_tqdm=False)]
    ref_llm.exit()
    assert got == ref


def test_mid_serving_oom_recovers_all_requests(tiny_qwen3):
    """A device RESOURCE_EXHAUSTED in the middle of LIVE serving (e.g. a
    lazily-compiled bucket exhausting compile workspace): step() must
    preempt every live request to the recompute path, shrink the KV
    cache, rebuild the block pool, and COMPLETE every request — with
    greedy tokens identical to an unperturbed run (reference analog:
    attention_backend.py:596-614 retries during serving)."""

    def make():
        return LLM(Config(
            model=str(tiny_qwen3), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
            decode_multi_step=4,
        ))

    rng = np.random.default_rng(21)
    prompts = [[int(t) for t in rng.integers(1, 150, L)]
               for L in (9, 22, 35)]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

    ref_llm = make()
    ref = [o["token_ids"] for o in ref_llm.generate(prompts, sp,
                                                    use_tqdm=False)]
    ref_llm.exit()

    llm = make()
    runner = llm.model_runner
    blocks_before = runner.num_blocks
    state = {"calls": 0, "raised": 0}

    def wrap(real):
        def inner(*a, **kw):
            state["calls"] += 1
            # Fail once, mid-generation (after prefill + one decode-ish
            # dispatch) — the engine must recover, not crash.
            if state["calls"] == 3 and state["raised"] == 0:
                state["raised"] += 1
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory allocating"
                )
            return real(*a, **kw)
        return inner

    runner.run = wrap(runner.run)
    runner.run_multi = wrap(runner.run_multi)
    got = [o["token_ids"] for o in llm.generate(prompts, sp,
                                                use_tqdm=False)]
    st = llm.get_stats()
    llm.exit()
    assert state["raised"] == 1, "injected OOM never fired"
    assert st["num_oom_recoveries"] == 1
    assert runner.num_blocks < blocks_before
    assert all(len(t) == 12 for t in got)
    assert got == ref, "OOM recovery changed greedy tokens"
    # Cross-step speculation state computed against the old cache/block
    # ids must have been dropped (the hist/lens arrays were donated into
    # the failed dispatch; reuse would touch deleted device arrays).
    assert runner._spec is None and runner._spec_hist_cache is None


def test_auto_blocks_estimated_limit_is_conservative(tiny_qwen3, monkeypatch):
    """When the runtime reports no memory_stats (the TPU relay returns
    None), the KV auto-sizer must derive a device-kind HBM limit and
    keep 30% of the post-weight budget as temp headroom, capped by the
    configured load — the old fallback allocated the full theoretical
    need (15.5 of 15.75 GiB at a 64x2048 config) and the first prefill
    OOM'd unrecoverably (round-5 regression)."""
    from minivllm_tpu.engine.model_runner import ModelRunner

    llm = LLM(Config(
        model=str(tiny_qwen3), max_num_seqs=64, max_model_len=2048,
        max_num_batched_tokens=4096, kvcache_block_size=16,
        num_kvcache_blocks=16, dtype="float32", attention_impl="xla",
    ))
    runner = llm.model_runner

    class FakeDev:
        platform = "tpu"
        device_kind = "TPU v5 lite"

        @staticmethod
        def memory_stats():
            return None

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev()])
    runner.config.num_kvcache_blocks = -1
    num = runner._resolve_num_blocks()
    limit = ModelRunner._HBM_BY_KIND["tpu v5 lite"]
    weights = sum(x.nbytes for x in jax.tree.leaves(runner.params))
    post_weight = int(limit * runner.config.device_memory_utilization) - weights
    need = 64 * (2048 // 16 + 1)
    assert num <= need
    assert num * runner._bytes_per_block() <= post_weight * 0.7 + 1
    assert num >= 16
    llm.exit()


def test_oom_recovery_survives_oom_during_shrink(tiny_qwen3):
    """Round-5 regression: right after a runtime OOM the device sits at
    its high-water mark, and the recovery's own cache REALLOCATION can
    hit RESOURCE_EXHAUSTED too (measured: a 2048-len workload OOM'd
    inside shrink_kv_cache.make_zeros and the recovery escaped). The
    engine must keep compounding the shrink until the allocation fits,
    then serve correctly."""
    llm = LLM(Config(
        model=str(tiny_qwen3), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
        decode_multi_step=4,
    ))
    runner = llm.model_runner
    blocks_before = runner.num_blocks
    rng = np.random.default_rng(3)
    prompts = [[int(t) for t in rng.integers(1, 150, L)] for L in (9, 22)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ref = [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]

    state = {"run_oom": 0, "shrink_oom": 0}
    real_run = runner.run
    real_shrink = runner.shrink_kv_cache

    def oom_run(*a, **kw):
        if state["run_oom"] == 0:
            state["run_oom"] = 1
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory")
        return real_run(*a, **kw)

    def oom_shrink(*a, **kw):
        # First two reallocation attempts fail like a full device; the
        # real shrink still compounds num_blocks down each attempt.
        nb = real_shrink(*a, **kw)
        if state["shrink_oom"] < 2:
            state["shrink_oom"] += 1
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory")
        return nb

    runner.run = oom_run
    runner.shrink_kv_cache = oom_shrink
    got = [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]
    runner.run = real_run
    runner.shrink_kv_cache = real_shrink
    assert state["run_oom"] == 1 and state["shrink_oom"] == 2
    assert llm.num_oom_recoveries == 1
    # Three shrink attempts compounded: 64 -> 56 -> 49 -> 42.
    assert runner.num_blocks < int(blocks_before * 0.875 * 0.875)
    assert got == ref, "shrink-retry recovery changed greedy tokens"
    llm.exit()


def test_multihost_oom_fails_fast(tiny_qwen3, monkeypatch):
    """Under multi-host serving the scheduler is REPLICATED: a local
    preempt-all/shrink/rebuild after a device OOM would silently diverge
    host-visible state from peers that did not OOM. The engine must
    fail fast with an actionable error instead of recovering locally
    (CLAUDE.md determinism invariant)."""
    from minivllm_tpu.engine.llm_engine import LLMEngine

    llm = LLM(Config(
        model=str(tiny_qwen3), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
    ))
    # Simulate a pod slice without jax.distributed: flag the config and
    # report >1 processes (initialization itself is covered by
    # tests/test_multihost.py's real two-process integration).
    llm.config.multihost = True
    monkeypatch.setattr(LLMEngine, "_process_count", staticmethod(lambda: 2))
    runner = llm.model_runner

    def oom(*a, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating")

    runner.run = oom
    runner.run_multi = oom
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    with pytest.raises(RuntimeError, match="multi-host"):
        llm.generate([[1, 5, 9, 2]], sp, use_tqdm=False)
    assert llm.num_oom_recoveries == 0, "engine must not recover locally"
    llm.exit()


def test_cached_prefill_fuses_into_decode_window(tiny_qwen3):
    """A fully-prefix-cached prompt runs its last prompt token AND the
    whole completion in ONE fused dispatch (no separate cached-prefill
    step), still matching HF greedy output exactly."""
    llm = LLM(Config(
        model=str(tiny_qwen3), max_num_seqs=8, max_model_len=256,
        max_num_batched_tokens=256, kvcache_block_size=16,
        num_kvcache_blocks=128, dtype="float32", attention_impl="xla",
        decode_multi_step=8,
    ))
    rng = np.random.default_rng(11)
    prompt = list(rng.integers(1, 190, 32))  # two full 16-token blocks
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    first = llm.generate([prompt], sp, use_tqdm=False)
    runner = llm.model_runner
    prefill_before = runner.total_prefill_tokens
    count_before = runner.inference_count
    again = llm.generate([prompt], sp, use_tqdm=False)
    assert again[0]["token_ids"] == first[0]["token_ids"]
    assert first[0]["token_ids"] == hf_greedy(tiny_qwen3, prompt, 6)
    assert runner.total_prefill_tokens == prefill_before
    # one fused window of 8 covers the prompt token + all 6 completions
    assert runner.inference_count == count_before + 1


def test_seeded_request_reproduces_across_runs(llm):
    """SamplingParams.seed: identical seeded requests reproduce across
    separate generate() calls (different engine step counters) and
    across batch compositions."""
    prompt = [4, 9, 2, 77, 31]
    sp = SamplingParams(
        temperature=1.0, top_p=0.95, seed=1234, max_tokens=10,
        ignore_eos=True,
    )
    a = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    # Same request inside a larger batch of unseeded traffic.
    outs = llm.generate(
        [[5, 5, 5], prompt, [8, 1, 99, 3]],
        [
            SamplingParams(temperature=1.0, max_tokens=10, ignore_eos=True),
            sp,
            SamplingParams(temperature=0.7, max_tokens=10, ignore_eos=True),
        ],
        use_tqdm=False,
    )
    assert outs[1]["token_ids"] == a


def test_two_identical_seeded_requests_match_in_one_batch(llm):
    prompt = [12, 3, 44, 9]
    sp = SamplingParams(
        temperature=0.9, seed=7, max_tokens=8, ignore_eos=True
    )
    outs = llm.generate([prompt, prompt], [sp, sp], use_tqdm=False)
    # Both requests share (seed, position) -> identical streams. (They
    # also share the prefix cache, so positions align exactly.)
    assert outs[0]["token_ids"] == outs[1]["token_ids"]


def test_mirostat_through_engine(llm):
    """Mirostat requests route through the single-step decode path,
    produce full-length completions, and are seed-reproducible."""
    prompt = [3, 18, 100, 42, 7]
    sp = SamplingParams(
        mirostat=2, mirostat_tau=3.0, temperature=1.0, seed=55,
        max_tokens=12, ignore_eos=True,
    )
    a = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    b = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    assert len(a) == 12
    assert a == b
    # Mixed batch: a mirostat row next to a greedy row; greedy is
    # unaffected by the overlay.
    greedy = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate([prompt, prompt], [sp, greedy], use_tqdm=False)
    assert outs[0]["token_ids"] == a
    ref = llm.generate([prompt], greedy, use_tqdm=False)[0]["token_ids"]
    assert outs[1]["token_ids"] == ref
