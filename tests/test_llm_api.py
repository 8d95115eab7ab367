"""User-API tests over a real tiny model + offline tokenizer (reference
analogs: tests/test_llm.py, tests/test_llm_engine.py — but driven through
real string-prompt encode/decode instead of mocks)."""

import pytest

from minivllm_tpu import LLM, Config, SamplingParams
from minivllm_tpu.utils.example_utils import format_chat_prompt
from minivllm_tpu.utils.testing import make_tiny_checkpoint, make_tiny_tokenizer


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = tmp_path_factory.mktemp("llm-api")
    make_tiny_checkpoint("qwen3", d)
    make_tiny_tokenizer(d)
    llm = LLM(Config(
        model=str(d), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
    ))
    yield llm
    llm.exit()


def test_string_prompts_roundtrip(llm):
    outs = llm.generate(
        ["hello world", "the quick brown fox"],
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs) == 2
    for o in outs:
        assert isinstance(o["text"], str) and o["text"]
        assert len(o["token_ids"]) == 5


def test_eos_resolved_from_tokenizer(llm):
    assert llm.config.eos == llm.tokenizer.eos_token_id == 1


def test_eos_stops_generation(llm):
    """A sequence sampling EOS must finish early when ignore_eos=False.
    Token 1 is </s>; with a random model greedy may never emit it, so
    force it by capping max_tokens and checking the ignore_eos contract
    instead: ignore_eos=True runs to max_tokens even if EOS appears."""
    out = llm.generate(
        ["hello"],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )[0]
    assert len(out["token_ids"]) == 6


def test_output_order_matches_prompt_order(llm):
    prompts = ["hello", "the quick brown fox jumps", "cat sat on mat"]
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
        use_tqdm=False,
    )
    # greedy outputs are deterministic per prompt: re-running one prompt
    # alone must reproduce its batched result (order preserved).
    for i in (0, 2):
        solo = llm.generate(
            [prompts[i]],
            SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
            use_tqdm=False,
        )[0]
        assert solo["token_ids"] == outs[i]["token_ids"]


def test_per_prompt_sampling_params(llm):
    outs = llm.generate(
        ["hello world", "hello world"],
        [
            SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True),
            SamplingParams(temperature=0.0, max_tokens=7, ignore_eos=True),
        ],
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 2
    assert len(outs[1]["token_ids"]) == 7


def test_get_stats_keys(llm):
    llm.generate(
        ["hello world"],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        use_tqdm=False,
    )
    stats = llm.get_stats()
    for key in (
        "num_prefill_steps", "num_decode_steps", "decode_tokens_per_s",
        "ttft_s_p50", "prefix_cache_hit_rate", "num_free_blocks",
        "total_prefill_tokens", "total_decode_tokens",
    ):
        assert key in stats, key


def test_chat_template_formatting(llm):
    text = format_chat_prompt(llm.tokenizer, "hello", system="the system")
    assert "system the system" in text
    assert "user hello" in text
    assert text.rstrip().endswith("assistant")
    # no tokenizer -> passthrough
    assert format_chat_prompt(None, "hello") == "hello"


def test_exit_idempotent(tmp_path):
    make_tiny_checkpoint("qwen3", tmp_path)
    llm = LLM(Config(
        model=str(tmp_path), max_num_seqs=2, max_model_len=64,
        max_num_batched_tokens=64, kvcache_block_size=16,
        num_kvcache_blocks=8, dtype="float32", attention_impl="xla",
    ))
    llm.exit()
    llm.exit()  # second call is a no-op (reference: llm_engine.py:116-169)


def test_stream_matches_generate(llm):
    """Library-level streaming yields the same greedy tokens, in order,
    as a blocking generate() of the same prompt."""
    prompt = [9, 4, 22, 8]
    sp = SamplingParams(temperature=0.0, max_tokens=7, ignore_eos=True)
    want = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    got = []
    for chunk in llm.stream(prompt, sp):
        assert chunk  # never yields empty chunks
        got.extend(chunk)
    assert got == want


def test_stream_early_close_aborts(llm):
    """Abandoning the stream generator frees the request: no orphan keeps
    decoding and its blocks return to the free list."""
    bm = llm.scheduler.block_manager
    free_before = bm.num_free_blocks
    sp = SamplingParams(temperature=0.0, max_tokens=50, ignore_eos=True)
    for chunk in llm.stream([5, 6, 7, 8], sp):
        break  # client goes away after the first chunk
    assert llm.is_finished()
    assert bm.num_free_blocks == free_before
    # engine still serves normally afterwards
    out = llm.generate([[1, 2, 3]], SamplingParams(
        temperature=0.0, max_tokens=3, ignore_eos=True), use_tqdm=False)
    assert len(out[0]["token_ids"]) == 3
