"""Randomized engine stress: mixed request shapes under memory pressure
(preemptions), mid-flight aborts, chunked prefill, prefix-cache reuse,
and speculative decoding — asserting the invariants that matter:

- greedy outputs are IDENTICAL to an unperturbed run (preemption
  recompute and prefix caching are semantically transparent);
- no KV blocks leak (the free list returns to its initial size);
- aborted requests free their blocks and never complete.

The reference has no comparable test (SURVEY.md §4 — its integration
tests are mocked); this drives the real engine end to end on CPU.
"""

import numpy as np
import pytest

from minivllm_tpu import LLM, Config, SamplingParams
from minivllm_tpu.utils.testing import make_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_tiny_checkpoint(
        "qwen3", tmp_path_factory.mktemp("stress") / "m",
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        hidden_size=64, vocab_size=256,
    )


def _cfg(ckpt, blocks, spec=0):
    return Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=192,
        max_num_batched_tokens=128,  # forces chunked prefill on long prompts
        kvcache_block_size=16, num_kvcache_blocks=blocks,
        dtype="float32", attention_impl="xla", decode_multi_step=4,
        speculative_num_tokens=spec,
    )


def _prompts(rng, n):
    out = []
    base = [int(t) for t in rng.integers(1, 200, 24)]
    for i in range(n):
        kind = i % 3
        if kind == 0:  # long prompt -> chunked prefill
            out.append([int(t) for t in rng.integers(1, 200, 150)])
        elif kind == 1:  # shares a prefix with others -> cache hits
            out.append(base + [int(t) for t in rng.integers(1, 200, 10 + i)])
        else:  # repetitive -> speculative drafts fire
            out.append(base * 3)
    return out


def test_memory_pressure_parity_and_no_leaks(ckpt):
    """A cache big enough to never preempt vs one that thrashes: greedy
    outputs must match exactly, and both engines must return every
    block to the free list."""
    rng = np.random.default_rng(3)
    prompts = _prompts(rng, 9)
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)

    def run(blocks, spec):
        llm = LLM(_cfg(ckpt, blocks, spec))
        bm = llm.scheduler.block_manager
        free0 = bm.num_free_blocks
        outs = llm.generate(prompts, sp, use_tqdm=False)
        assert bm.num_free_blocks == free0, "leaked KV blocks"
        return [o["token_ids"] for o in outs], llm.get_stats()

    ref, _ = run(blocks=256, spec=0)
    tight, st = run(blocks=30, spec=0)  # ~2 long seqs' worth: must preempt
    assert st["num_preemptions"] > 0, "pressure case never preempted"
    assert tight == ref, "preemption/recompute changed greedy tokens"
    spec_out, st = run(blocks=256, spec=3)
    assert st["ngram_spec_steps"] > 0
    assert spec_out == ref, "speculation changed greedy tokens"


def test_abort_midflight_frees_blocks_and_spares_others(ckpt):
    """Abort half the requests after a few engine steps: the survivors
    finish with exactly the tokens of an undisturbed run, the aborted
    never complete, and all blocks come back."""
    rng = np.random.default_rng(4)
    prompts = _prompts(rng, 6)
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True)

    llm = LLM(_cfg(ckpt, blocks=256))
    ref = {
        i: o["token_ids"]
        for i, o in enumerate(llm.generate(prompts, sp, use_tqdm=False))
    }

    llm = LLM(_cfg(ckpt, blocks=256))
    bm = llm.scheduler.block_manager
    free0 = bm.num_free_blocks
    ids = [llm.add_request(p, sp) for p in prompts]
    done: dict[int, list[int]] = {}
    steps = 0
    aborted = set()
    while not llm.is_finished():
        outs, _ = llm.step()
        for seq_id, toks, *_ in outs:
            done[seq_id] = toks
        steps += 1
        if steps == 3:
            for i in (1, 3, 5):
                assert llm.abort_request(ids[i]) or ids[i] in done
                aborted.add(ids[i])
    for i, sid in enumerate(ids):
        if sid in aborted and sid not in done:
            continue  # aborted before completing: fine
        assert done[sid] == ref[i], f"survivor {i} diverged"
    assert bm.num_free_blocks == free0, "leaked KV blocks after aborts"
