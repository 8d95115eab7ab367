"""OpenAI logit_bias: additive token biases applied before filters and
the greedy argmax (-100 bans, +100 forces). Beyond the reference (its
sampler has no bias hook); routed down the single-step decode path."""

import numpy as np
import pytest

from minivllm_tpu import LLM, Config, SamplingParams
from minivllm_tpu.utils.testing import make_tiny_checkpoint


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = tmp_path_factory.mktemp("bias") / "m"
    make_tiny_checkpoint("qwen3", d)
    return LLM(Config(
        model=str(d), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
        decode_multi_step=4,
    ))


PROMPT = [5, 9, 13, 44, 7]


def test_forcing_bias_dominates_greedy(llm):
    """+100 on one token makes greedy emit it at every step."""
    out = llm.generate(
        [PROMPT],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       logit_bias={42: 100.0}),
        use_tqdm=False,
    )[0]
    assert out["token_ids"] == [42] * 6


def test_banning_bias_excludes_token(llm):
    """-100 on the greedy token reroutes every step away from it."""
    ref = llm.generate(
        [PROMPT],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
        use_tqdm=False,
    )[0]["token_ids"]
    banned = set(ref)
    out = llm.generate(
        [PROMPT],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                       logit_bias={t: -100.0 for t in banned}),
        use_tqdm=False,
    )[0]["token_ids"]
    assert not (set(out) & banned)


def test_bias_applies_to_sampled_rows(llm):
    """Banning all but a handful of tokens constrains sampling to them
    (bias lands before the candidate-pool filters)."""
    allow = {3, 7, 11}
    vocab = llm.model_runner.model.vocab_size
    bias = {t: -100.0 for t in range(vocab) if t not in allow}
    out = llm.generate(
        [PROMPT],
        SamplingParams(temperature=1.0, max_tokens=12, ignore_eos=True,
                       seed=9, logit_bias=bias),
        use_tqdm=False,
    )[0]["token_ids"]
    assert set(out) <= allow


def test_bias_mixed_batch_isolated(llm):
    """Bias rows don't leak into unbiased batchmates."""
    ref = llm.generate(
        [PROMPT],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )[0]["token_ids"]
    outs = llm.generate(
        [PROMPT, PROMPT],
        [
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                           logit_bias={42: 100.0}),
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        ],
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == [42] * 6
    assert outs[1]["token_ids"] == ref


def test_bias_validation():
    with pytest.raises(ValueError):
        SamplingParams(logit_bias={5: 101.0})
    with pytest.raises(ValueError):
        SamplingParams(logit_bias={-1: 1.0})
    sp = SamplingParams(logit_bias={"7": -3})  # OpenAI string keys
    assert sp.logit_bias == {7: -3.0}
