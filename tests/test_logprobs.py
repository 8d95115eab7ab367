"""Completion-token logprobs (SamplingParams.logprobs) — beyond the
reference. Greedy logprobs must match the HF model's log-softmax exactly;
mixed batches only record entries for requesting sequences."""

import numpy as np
import pytest

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.llm import LLM
from minivllm_tpu.utils.testing import make_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_tiny_checkpoint(
        "qwen3", tmp_path_factory.mktemp("lp") / "m",
        num_attention_heads=8, num_key_value_heads=8, head_dim=16,
        hidden_size=64,
    )


@pytest.fixture(scope="module")
def llm(ckpt):
    return LLM(
        Config(
            model=str(ckpt), dtype="float32", attention_impl="xla",
            max_num_seqs=4, max_model_len=128, max_num_batched_tokens=128,
            kvcache_block_size=16, num_kvcache_blocks=32,
        )
    )


def hf_logprobs(ckpt, tokens):
    """log-softmax over the HF forward at every position."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        str(ckpt), torch_dtype=torch.float32
    ).eval()
    with torch.no_grad():
        logits = model(torch.tensor([tokens])).logits[0]
    return torch.log_softmax(logits, dim=-1).numpy()


def test_greedy_logprobs_match_hf(llm, ckpt):
    prompt = [3, 17, 9, 4, 22]
    sp = SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True, logprobs=3
    )
    out = llm.generate([prompt], sp, use_tqdm=False)[0]
    toks = out["token_ids"]
    entries = out["logprobs"]
    assert len(entries) == len(toks) == 4
    ref = hf_logprobs(ckpt, prompt + toks)
    for i, (tok, e) in enumerate(zip(toks, entries)):
        assert e["token_id"] == tok
        pos = len(prompt) + i - 1  # logits that produced token i
        np.testing.assert_allclose(
            e["logprob"], ref[pos, tok], rtol=2e-3, atol=2e-3
        )
        assert len(e["top"]) == 3
        # greedy: the sampled token is the argmax -> best top entry
        assert max(e["top"], key=e["top"].get) == tok
        np.testing.assert_allclose(
            sorted(e["top"].values(), reverse=True),
            np.sort(ref[pos])[::-1][:3],
            rtol=2e-3, atol=2e-3,
        )


def test_mixed_batch_only_requesters_get_logprobs(llm):
    sps = [
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                       logprobs=0),
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
    ]
    outs = llm.generate([[5, 6, 7], [8, 9]], sps, use_tqdm=False)
    assert "logprobs" in outs[0] and len(outs[0]["logprobs"]) == 3
    assert all(e["top"] == {} for e in outs[0]["logprobs"])
    assert "logprobs" not in outs[1]


def test_logprobs_with_sampling_filters(llm):
    """Filtered sampling still reports unfiltered-distribution logprobs
    (finite, <= 0) for the sampled token."""
    sp = SamplingParams(
        temperature=0.8, top_k=5, top_p=0.9, max_tokens=4,
        ignore_eos=True, logprobs=2, seed=7,
    )
    out = llm.generate([[11, 12, 13]], sp, use_tqdm=False)[0]
    for e in out["logprobs"]:
        assert np.isfinite(e["logprob"]) and e["logprob"] <= 0.0
        assert len(e["top"]) == 2


# -- prompt logprobs (echo support) ----------------------------------------


def test_prompt_logprobs_match_hf(llm, ckpt):
    """prompt_logprobs=k returns one entry per prompt token: the first has
    no prefix (None logprob), each other matches HF's log-softmax at the
    preceding position."""
    prompt = [3, 17, 9, 4, 22, 8]
    sp = SamplingParams(
        temperature=0.0, max_tokens=2, ignore_eos=True, prompt_logprobs=3
    )
    out = llm.generate([prompt], sp, use_tqdm=False)[0]
    entries = out["prompt_logprobs"]
    assert len(entries) == len(prompt)
    assert entries[0]["token_id"] == prompt[0]
    assert entries[0]["logprob"] is None and entries[0]["top"] is None
    ref = hf_logprobs(ckpt, prompt)
    for i in range(1, len(prompt)):
        e = entries[i]
        assert e["token_id"] == prompt[i]
        np.testing.assert_allclose(
            e["logprob"], ref[i - 1, prompt[i]], rtol=2e-3, atol=2e-3
        )
        assert len(e["top"]) == 3
        np.testing.assert_allclose(
            sorted(e["top"].values(), reverse=True),
            np.sort(ref[i - 1])[::-1][:3],
            rtol=2e-3, atol=2e-3,
        )


def test_prompt_logprobs_bypass_prefix_cache(llm, ckpt):
    """A prompt whose blocks are already prefix-cached must still compute
    (and report) logprobs for every prompt position."""
    prompt = [7, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    sp0 = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
    llm.generate([prompt], sp0, use_tqdm=False)  # seeds the prefix cache
    sp = SamplingParams(
        temperature=0.0, max_tokens=2, ignore_eos=True,
        prompt_logprobs=1, logprobs=1,
    )
    out = llm.generate([prompt], sp, use_tqdm=False)[0]
    entries = out["prompt_logprobs"]
    assert len(entries) == len(prompt)
    ref = hf_logprobs(ckpt, prompt)
    for i in range(1, len(prompt)):
        np.testing.assert_allclose(
            entries[i]["logprob"], ref[i - 1, prompt[i]],
            rtol=2e-3, atol=2e-3,
        )
    # completion logprobs coexist on the same request
    assert len(out["logprobs"]) == 2


def test_prompt_logprobs_mixed_batch(llm):
    """Only requesting sequences record prompt entries."""
    sps = [
        SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                       prompt_logprobs=0),
        SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True),
    ]
    outs = llm.generate([[5, 6, 7, 8], [9, 10]], sps, use_tqdm=False)
    assert len(outs[0]["prompt_logprobs"]) == 4
    assert all(
        e["top"] == {} for e in outs[0]["prompt_logprobs"][1:]
    )  # k=0: chosen-token logprob only
    assert "prompt_logprobs" not in outs[1]


def test_prompt_logprobs_chunked_prefill(tmp_path_factory):
    """A prompt longer than max_num_batched_tokens prefills in chunks;
    prompt-logprob entries must cover every position seamlessly."""
    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path_factory.mktemp("plpc") / "m",
        num_attention_heads=8, num_key_value_heads=8, head_dim=16,
        hidden_size=64, max_position_embeddings=1024,
    )
    llm = LLM(Config(
        model=str(ckpt), dtype="float32", attention_impl="xla",
        max_num_seqs=2, max_model_len=512, max_num_batched_tokens=128,
        kvcache_block_size=16, num_kvcache_blocks=64,
    ))
    rng = np.random.default_rng(3)
    prompt = list(int(t) for t in rng.integers(1, 190, 300))
    sp = SamplingParams(
        temperature=0.0, max_tokens=2, ignore_eos=True, prompt_logprobs=2
    )
    out = llm.generate([prompt], sp, use_tqdm=False)[0]
    entries = out["prompt_logprobs"]
    assert len(entries) == len(prompt)
    assert [e["token_id"] for e in entries] == prompt
    assert llm.metrics.summary()["num_prefill_steps"] >= 3
    ref = hf_logprobs(ckpt, prompt)
    got = np.array([e["logprob"] for e in entries[1:]])
    want = ref[np.arange(len(prompt) - 1), prompt[1:]]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
