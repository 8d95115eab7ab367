"""Stop strings / stop_token_ids TERMINATE generation (engine-level).

Beyond reference parity (the reference scheduler finishes only on the
single EOS id, /root/reference/minivllm/engine/scheduler.py) — but the
serving-critical contract is that a stop match frees capacity: the
sequence must finish within one decode window of the match with its KV
blocks released, not silently decode to max_tokens."""

import pytest

from minivllm_tpu import LLM, Config, SamplingParams
from minivllm_tpu.utils.testing import make_tiny_checkpoint, make_tiny_tokenizer

MT = 40  # generous max_tokens: early termination must beat it


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = tmp_path_factory.mktemp("stop-llm")
    make_tiny_checkpoint("qwen3", d)
    make_tiny_tokenizer(d)
    llm = LLM(Config(
        model=str(d), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
        decode_multi_step=4,
    ))
    yield llm
    llm.exit()


@pytest.fixture(scope="module")
def ref(llm):
    """Unperturbed greedy run: the stop tests derive their targets from
    what the model actually emits."""
    out = llm.generate(
        ["hello world"],
        SamplingParams(temperature=0.0, max_tokens=MT, ignore_eos=True),
        use_tqdm=False,
    )[0]
    assert len(out["token_ids"]) == MT
    assert out["finish_reason"] == "length"
    return out


def test_stop_token_ids_end_generation(llm, ref):
    target = ref["token_ids"][6]
    first = ref["token_ids"].index(target)
    out = llm.generate(
        ["hello world"],
        SamplingParams(
            temperature=0.0, max_tokens=MT, ignore_eos=True,
            stop_token_ids=[target],
        ),
        use_tqdm=False,
    )[0]
    # ends AT the stop token (included, like vLLM), greedy-identical
    assert out["token_ids"] == ref["token_ids"][: first + 1]
    assert out["finish_reason"] == "stop"
    assert out["stop_reason"] == target


def test_stop_string_terminates_within_one_window(llm, ref):
    tok = llm.tokenizer
    full_text = tok.decode(ref["token_ids"], skip_special_tokens=True)
    # Stop string: the decoded form of a mid-generation token.
    word = tok.decode([ref["token_ids"][6]], skip_special_tokens=True)
    assert word and word in full_text
    idx = full_text.find(word)
    # Token index at which the match first becomes visible.
    j = next(
        j for j in range(len(ref["token_ids"]))
        if word in tok.decode(
            ref["token_ids"][: j + 1], skip_special_tokens=True
        )
    )
    free_before = llm.scheduler.block_manager.num_free_blocks
    out = llm.generate(
        ["hello world"],
        SamplingParams(
            temperature=0.0, max_tokens=MT, ignore_eos=True, stop=[word],
        ),
        use_tqdm=False,
    )[0]
    # 1. generation TERMINATED: within one fused decode window of the
    # match, nowhere near max_tokens
    n = len(out["token_ids"])
    assert j < n <= j + 1 + llm.config.decode_multi_step, (j, n, MT)
    # 2. text truncated exactly at the match (OpenAI semantics)
    assert out["text"] == full_text[:idx]
    assert out["finish_reason"] == "stop"
    assert out["stop_reason"] == word
    # 3. all KV blocks freed
    assert llm.scheduler.block_manager.num_free_blocks == free_before


def test_include_stop_str_in_output(llm, ref):
    tok = llm.tokenizer
    full_text = tok.decode(ref["token_ids"], skip_special_tokens=True)
    word = tok.decode([ref["token_ids"][6]], skip_special_tokens=True)
    idx = full_text.find(word)
    out = llm.generate(
        ["hello world"],
        SamplingParams(
            temperature=0.0, max_tokens=MT, ignore_eos=True, stop=[word],
            include_stop_str_in_output=True,
        ),
        use_tqdm=False,
    )[0]
    assert out["text"] == full_text[: idx + len(word)]
    assert out["text"].endswith(word)


def test_stop_frees_capacity_mid_serving(llm, ref):
    """Two concurrent requests; one stops early. Its blocks must return
    to the pool while the other keeps decoding, and the survivor's
    tokens must be unchanged."""
    word = llm.tokenizer.decode(
        [ref["token_ids"][4]], skip_special_tokens=True
    )
    sp_stop = SamplingParams(
        temperature=0.0, max_tokens=MT, ignore_eos=True, stop=[word]
    )
    sp_plain = SamplingParams(
        temperature=0.0, max_tokens=MT, ignore_eos=True
    )
    sid_stop = llm.add_request("hello world", sp_stop)
    sid_plain = llm.add_request("the quick brown fox", sp_plain)
    stop_seq = llm.scheduler.get(sid_stop)
    done = {}
    free_at_stop_finish = None
    while not llm.is_finished():
        finished, _ = llm.step()
        for seq_id, toks, *_ in finished:
            done[seq_id] = toks
        if sid_stop in done and free_at_stop_finish is None:
            free_at_stop_finish = llm.scheduler.block_manager.num_free_blocks
            # the stopped request's blocks are back in the pool while
            # the other request still holds its own
            assert not stop_seq.block_table
            assert llm.scheduler.get(sid_stop) is None
            assert llm.scheduler.get(sid_plain) is not None
    assert len(done[sid_stop]) < MT
    assert len(done[sid_plain]) == MT


def test_stop_string_requires_validation():
    with pytest.raises(ValueError):
        SamplingParams(stop=[""])
    with pytest.raises(ValueError):
        SamplingParams(stop_token_ids=[-3])
    sp = SamplingParams(stop="foo")
    assert sp.stop == ["foo"]


def test_incremental_detokenizer_matches_full_decode(llm, ref):
    """The streaming detokenizer must converge to the one-shot decode
    for any prefix feed order."""
    from minivllm_tpu.utils.detok import IncrementalDetokenizer

    tok = llm.tokenizer
    ids = ref["token_ids"]
    detok = IncrementalDetokenizer(tok)
    for i in range(1, len(ids) + 1):
        detok.update(ids[:i])
    assert detok.text == tok.decode(ids, skip_special_tokens=True)
