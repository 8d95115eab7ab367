"""Engine-state checkpoint/resume: interrupt generation mid-stream, save
request state, restore into a fresh engine, and finish — greedy output must
match an uninterrupted run token for token. The reference has no engine
persistence at all (SURVEY.md §5)."""

import json

import pytest

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.llm import LLM
from minivllm_tpu.utils.testing import make_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_tiny_checkpoint(
        "qwen3", tmp_path_factory.mktemp("ckre") / "m",
        num_attention_heads=8, num_key_value_heads=8, head_dim=16,
        hidden_size=64,
    )


def _mk(ckpt):
    return LLM(
        Config(
            model=str(ckpt), dtype="float32", attention_impl="xla",
            max_num_seqs=4, max_model_len=128, max_num_batched_tokens=128,
            kvcache_block_size=16, num_kvcache_blocks=32,
            decode_multi_step=1,
        ),
        init_random=True,  # PRNGKey(0) -> identical weights across engines
    )


PROMPTS = [[3, 17, 9, 4, 22, 8, 1], [5, 5, 12, 30]]
SP = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)


def test_save_resume_matches_uninterrupted(ckpt, tmp_path):
    ref = _mk(ckpt).generate(PROMPTS, SP, use_tqdm=False)

    # Interrupted run: a few steps, then snapshot mid-generation.
    eng = _mk(ckpt)
    order = [eng.add_request(p, SP) for p in PROMPTS]
    partial = {}
    for _ in range(5):
        for seq_id, toks, *_ in eng.step()[0]:
            partial[seq_id] = toks
    state_file = tmp_path / "engine_state.json"
    n = eng.save_state(str(state_file))
    assert n == sum(1 for i in order if i not in partial)
    saved = json.loads(state_file.read_text())
    assert saved["version"] == 1 and len(saved["requests"]) == n
    # Every saved request has made some progress past its prompt.
    assert all(
        r["completion_token_ids"] for r in saved["requests"]
    ), "expected mid-generation snapshot"

    # Fresh engine (same random weights), restore, run to completion.
    eng2 = _mk(ckpt)
    new_ids = eng2.load_state(str(state_file))
    assert len(new_ids) == n
    done = {}
    while not eng2.is_finished():
        for seq_id, toks, *_ in eng2.step()[0]:
            done[seq_id] = toks
    resumed = dict(zip(new_ids, [done[i] for i in new_ids]))

    # Stitch finished-before-save + resumed outputs back in prompt order.
    out = []
    it = iter(new_ids)
    for i in order:
        out.append(partial[i] if i in partial else resumed[next(it)])
    assert out == [o["token_ids"] for o in ref]


def test_save_empty_engine(ckpt, tmp_path):
    eng = _mk(ckpt)
    path = tmp_path / "empty.json"
    assert eng.save_state(str(path)) == 0
    assert eng.load_state(str(path)) == []


def test_load_rejects_unknown_version(ckpt, tmp_path):
    eng = _mk(ckpt)
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"version": 99, "requests": []}))
    with pytest.raises(ValueError, match="version"):
        eng.load_state(str(bad))
