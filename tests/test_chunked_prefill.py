"""Chunked prefill: prompts larger than max_num_batched_tokens prefill in
chunks with exact output parity (beyond-reference capability)."""

import numpy as np
import pytest

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.llm import LLM
from minivllm_tpu.utils.testing import make_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_tiny_checkpoint(
        "qwen3", tmp_path_factory.mktemp("cp") / "m",
        max_position_embeddings=1024,
    )


def make_llm(ckpt, budget):
    return LLM(Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=512,
        max_num_batched_tokens=budget, kvcache_block_size=16,
        num_kvcache_blocks=128, dtype="float32", attention_impl="xla",
    ))


def hf_greedy(ckpt, prompt, n):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(ckpt).eval()
    toks = list(prompt)
    with torch.no_grad():
        for _ in range(n):
            toks.append(int(model(torch.tensor([toks])).logits[0, -1].argmax()))
    return toks[len(prompt):]


def test_long_prompt_chunks_and_matches(ckpt):
    """A 300-token prompt with a 128-token batch budget prefills in
    chunks and matches HF exactly."""
    llm = make_llm(ckpt, budget=128)
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(1, 190, 300))
    out = llm.generate(
        [prompt], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )[0]["token_ids"]
    assert out == hf_greedy(ckpt, prompt, 6)
    # prefill must have been split into >= 3 chunks of <= 128 tokens
    assert llm.metrics.summary()["num_prefill_steps"] >= 3


def test_chunking_with_batch(ckpt):
    """A long prompt plus short prompts: short ones are not starved and all
    outputs stay exact."""
    llm = make_llm(ckpt, budget=128)
    rng = np.random.default_rng(1)
    long_p = list(rng.integers(1, 190, 200))
    short_a = list(rng.integers(1, 190, 10))
    short_b = list(rng.integers(1, 190, 30))
    outs = llm.generate(
        [long_p, short_a, short_b],
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        use_tqdm=False,
    )
    for p, o in zip([long_p, short_a, short_b], outs):
        assert o["token_ids"] == hf_greedy(ckpt, p, 5)


def test_chunked_prefill_with_prefix_cache(ckpt):
    """Chunked re-prefill over an already-cached prefix stays exact."""
    llm = make_llm(ckpt, budget=128)
    rng = np.random.default_rng(2)
    shared = list(rng.integers(1, 190, 160))  # 10 full blocks
    a = shared + [3, 4]
    b = shared + [7, 8, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    out_a = llm.generate([a], sp, use_tqdm=False)[0]["token_ids"]
    out_b = llm.generate([b], sp, use_tqdm=False)[0]["token_ids"]
    assert llm.scheduler.block_manager.stats["prefix_cache_hits"] > 0
    assert out_a == hf_greedy(ckpt, a, 4)
    assert out_b == hf_greedy(ckpt, b, 4)
