"""n>1 sampling via copy-on-write KV forking.

Beyond the reference (one completion per prompt). The serving-critical
properties: the prompt prefills ONCE (siblings share its full blocks by
refcount, block_manager.fork), sibling outputs are exactly what n
independent requests would produce (seeded parity), and the reference's
refcount semantics hold through finish/abort (no leaked or double-freed
blocks; ref /root/reference/minivllm/engine/block_manager.py:346-364)."""

import numpy as np
import pytest

from minivllm_tpu import LLM, Config, SamplingParams
from minivllm_tpu.utils.testing import make_tiny_checkpoint


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_checkpoint("qwen3", tmp_path_factory.mktemp("n") / "m")


def make(tiny, **kw):
    cfg = dict(
        model=str(tiny), max_num_seqs=8, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
        decode_multi_step=4,
    )
    cfg.update(kw)
    return LLM(Config(**cfg))


PROMPT = [7, 3, 11, 2, 9, 4, 15, 8] * 5  # 40 tokens: 2 full blocks + tail


def test_greedy_n_matches_single(tiny):
    llm = make(tiny)
    sp1 = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    ref = llm.generate([PROMPT], sp1, use_tqdm=False)[0]["token_ids"]
    spn = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True, n=3)
    out = llm.generate([PROMPT], spn, use_tqdm=False)[0]
    assert len(out["completions"]) == 3
    for c in out["completions"]:
        assert c["token_ids"] == ref, "greedy sibling diverged from single"
    assert out["token_ids"] == ref  # top-level mirrors sibling 0
    llm.exit()


def test_seeded_n_parity_with_independent_requests(tiny):
    """n=4 with seed s must emit exactly what 4 independent requests
    with seeds s..s+3 emit (seeded draws depend on (seed, position)
    only), and the siblings must be mutually distinct."""
    llm = make(tiny)
    seed = 1234
    indep = [
        llm.generate(
            [PROMPT],
            SamplingParams(temperature=1.0, max_tokens=8, ignore_eos=True,
                           seed=seed + i),
            use_tqdm=False,
        )[0]["token_ids"]
        for i in range(4)
    ]
    out = llm.generate(
        [PROMPT],
        SamplingParams(temperature=1.0, max_tokens=8, ignore_eos=True,
                       seed=seed, n=4),
        use_tqdm=False,
    )[0]
    got = [c["token_ids"] for c in out["completions"]]
    assert got == indep
    assert len({tuple(t) for t in got}) > 1, "siblings identical"
    llm.exit()


def test_fork_shares_prompt_blocks_and_prefills_once(tiny):
    llm = make(tiny)
    llm.model_runner.total_prefill_tokens = 0
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True, n=3)
    pid = llm.add_request(PROMPT, sp)
    fam = llm.family(pid)
    assert len(fam) == 3
    llm.step()  # prefill: parent full + sibling tails in one batch
    seqs = {s.seq_id: s for s in llm.scheduler.running}
    assert set(fam) <= set(seqs)
    parent = seqs[fam[0]]
    bm = llm.scheduler.block_manager
    for sid in fam[1:]:
        child = seqs[sid]
        # full prompt blocks shared by id, tail block fresh
        assert child.block_table[:2] == parent.block_table[:2]
        assert child.block_table[2] != parent.block_table[2]
    for bid in parent.block_table[:2]:
        assert bm.blocks[bid].ref_count == 3
    # prompt computed once + one tail (8 uncached tokens) per sibling
    assert llm.model_runner.total_prefill_tokens == 40 + 2 * 8
    while not llm.is_finished():
        llm.step()
    # all references released
    assert bm.num_free_blocks == bm.num_blocks
    llm.exit()


def test_fork_survives_parent_finishing_first(tiny):
    """Parent finishes (EOS via stop token) while children keep
    decoding: shared blocks must survive via child refs and free only
    when the last sibling finishes."""
    llm = make(tiny)
    ref = llm.generate(
        [PROMPT],
        SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True),
        use_tqdm=False,
    )[0]["token_ids"]
    # parent stops early on its 3rd token; children run to max_tokens
    # (stop_token_ids applies to all siblings — use per-seq max instead)
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True, n=3)
    pid = llm.add_request(PROMPT, sp)
    fam = llm.family(pid)
    llm.step()
    seqs = {s.seq_id: s for s in llm.scheduler.running}
    # shrink the parent's budget so it finishes first
    seqs[fam[0]].sampling_params.max_tokens = 3
    done = {}
    while not llm.is_finished():
        for sid, toks, *_ in llm.step()[0]:
            done[sid] = toks
    assert len(done[fam[0]]) == 3
    for sid in fam[1:]:
        assert done[sid] == ref, "child diverged after parent finished"
    bm = llm.scheduler.block_manager
    assert bm.num_free_blocks == bm.num_blocks
    llm.exit()


def test_best_of_keeps_top_n_by_cumulative_logprob(tiny):
    """best_of=4, n=2, seeded: the kept completions must be exactly the
    top-2 of the 4 sibling streams by cumulative logprob (verified
    against 4 independent seeded runs), best first."""
    llm = make(tiny)
    seed = 77
    sp_one = [
        SamplingParams(temperature=1.0, max_tokens=6, ignore_eos=True,
                       seed=seed + i, logprobs=0)
        for i in range(4)
    ]
    indep = llm.generate([PROMPT] * 4, sp_one, use_tqdm=False)
    scores = [
        (sum(e["logprob"] for e in o["logprobs"]), tuple(o["token_ids"]))
        for o in indep
    ]
    expected = [t for _, t in sorted(scores, reverse=True)[:2]]
    out = llm.generate(
        [PROMPT],
        SamplingParams(temperature=1.0, max_tokens=6, ignore_eos=True,
                       seed=seed, n=2, best_of=4),
        use_tqdm=False,
    )[0]
    got = [tuple(c["token_ids"]) for c in out["completions"]]
    assert got == expected
    # logprobs were forced for ranking, not requested: stripped
    assert all("logprobs" not in c for c in out["completions"])
    assert tuple(out["token_ids"]) == expected[0]  # top-level = best
    llm.exit()


def test_best_of_validation():
    with pytest.raises(ValueError):
        SamplingParams(n=4, best_of=2)
    sp = SamplingParams(n=2, best_of=4)
    assert sp.best_of == 4


def test_n_validation():
    with pytest.raises(ValueError):
        SamplingParams(n=0)
    with pytest.raises(ValueError):
        SamplingParams(n=100)


def test_stream_n_matches_generate(tiny):
    """n>1 library streaming: stream() multiplexes (sibling_index, chunk)
    pairs with a terminal (i, None) per sibling — the same surface as the
    server's stream_many — and the reassembled streams are exactly the
    non-streamed family result."""
    llm = make(tiny)
    sp = SamplingParams(temperature=1.0, max_tokens=8, ignore_eos=True,
                        seed=77, n=3)
    ref = llm.generate([PROMPT], sp, use_tqdm=False)[0]
    expected = [c["token_ids"] for c in ref["completions"]]
    got: list[list[int]] = [[] for _ in range(3)]
    finished = [False] * 3
    for i, chunk in llm.stream(PROMPT, sp):
        if chunk is None:
            assert not finished[i], "duplicate terminal for sibling"
            finished[i] = True
        else:
            assert not finished[i], "chunk after sibling terminal"
            got[i].extend(chunk)
    assert all(finished)
    assert got == expected
    bm = llm.scheduler.block_manager
    assert bm.num_free_blocks == bm.num_blocks  # family blocks all freed
    llm.exit()


def test_stream_rejects_best_of_over_n(tiny):
    llm = make(tiny)
    with pytest.raises(ValueError, match="best_of"):
        next(llm.stream(PROMPT, SamplingParams(n=1, best_of=2)))
    llm.exit()
