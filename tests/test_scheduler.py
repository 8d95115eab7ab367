"""Scheduler two-phase behavior, budgets, preemption, postprocess
(reference: tests/test_scheduler.py)."""

import pytest

from minivllm_tpu.engine.scheduler import Scheduler
from minivllm_tpu.engine.sequence import Sequence, SequenceStatus
from minivllm_tpu.sampling_params import SamplingParams


def mk_seq(n_tokens, block_size=64, offset=1, **sp):
    return Sequence(list(range(offset, n_tokens + offset)),
                    SamplingParams(**sp), block_size=block_size)


def test_prefill_first(default_config):
    s = Scheduler(default_config)
    a, b = mk_seq(10), mk_seq(20)
    s.add(a)
    s.add(b)
    seqs, is_prefill = s.schedule()
    assert is_prefill
    assert seqs == [a, b]
    assert all(x.status == SequenceStatus.RUNNING for x in seqs)
    assert s.num_waiting == 0


def test_prefill_token_budget_chunks(default_config):
    s = Scheduler(default_config)
    a = mk_seq(400)
    b = mk_seq(400, offset=5000)  # distinct tokens: no prefix-cache hits
    s.add(a)
    s.add(b)
    seqs, is_prefill = s.schedule()
    assert is_prefill
    # a fits fully; b gets the remaining 112-token chunk and stays waiting
    assert seqs == [a, b]
    assert a.chunk_range == (0, 400)
    assert b.chunk_range == (0, 112)
    assert b.num_computed_tokens == 112
    assert s.num_waiting == 1  # b continues next round
    s.postprocess(seqs, [1, 2])
    assert len(a) == 401  # a sampled a token
    assert len(b) == 400  # b's mid-chunk sample discarded
    seqs2, is_prefill = s.schedule()
    assert is_prefill and seqs2 == [b]
    assert b.chunk_range == (112, 400)


def test_decode_after_prefill(default_config):
    s = Scheduler(default_config)
    a = mk_seq(10, max_tokens=8)
    s.add(a)
    seqs, is_prefill = s.schedule()
    s.postprocess(seqs, [42])
    seqs, is_prefill = s.schedule()
    assert not is_prefill
    assert seqs == [a]


def test_postprocess_finishes_on_eos(default_config):
    default_config.eos = 99
    s = Scheduler(default_config)
    a = mk_seq(10, max_tokens=8)
    s.add(a)
    seqs, _ = s.schedule()
    s.postprocess(seqs, [99])
    assert a.is_finished
    assert s.is_finished()
    assert s.block_manager.num_free_blocks == s.block_manager.num_blocks


def test_ignore_eos(default_config):
    default_config.eos = 99
    s = Scheduler(default_config)
    a = mk_seq(10, max_tokens=4, ignore_eos=True)
    s.add(a)
    seqs, _ = s.schedule()
    s.postprocess(seqs, [99])
    assert not a.is_finished


def test_finish_on_max_tokens(default_config):
    s = Scheduler(default_config)
    a = mk_seq(10, max_tokens=2)
    s.add(a)
    seqs, _ = s.schedule()
    s.postprocess(seqs, [1])
    assert not a.is_finished
    seqs, _ = s.schedule()
    s.postprocess(seqs, [2])
    assert a.is_finished
    assert a.completion_token_ids == [1, 2]


def test_preemption_under_memory_pressure(limited_cache_config):
    # 4 blocks of 64 tokens total; two seqs of 100 tokens need 2 blocks each.
    s = Scheduler(limited_cache_config)
    a = mk_seq(100, max_tokens=64)
    b = mk_seq(100, max_tokens=64)
    s.add(a)
    s.add(b)
    seqs, is_prefill = s.schedule()
    assert seqs == [a, b]
    s.postprocess(seqs, [1, 1])
    # decode until one seq crosses a block boundary (position 128 -> block 3
    # for each seq; no free blocks -> youngest (b) preempted)
    preempted = False
    for step in range(40):
        seqs, is_prefill = s.schedule()
        if is_prefill:
            break
        s.postprocess(seqs, [1] * len(seqs))
        if s.num_preemptions:
            preempted = True
            break
    assert preempted
    assert b.status == SequenceStatus.WAITING
    assert b.num_preemptions == 1
    assert b.block_table == []


def test_unschedulable_request_raises(fake_model_dir):
    from minivllm_tpu.config import Config

    cfg = Config(model=fake_model_dir, max_num_seqs=8, max_model_len=512,
                 max_num_batched_tokens=512)
    cfg.num_kvcache_blocks = 2  # 128-token capacity
    s = Scheduler(cfg)
    s.add(mk_seq(300))  # needs 5 blocks, only 2 exist
    with pytest.raises(RuntimeError, match="cannot be scheduled"):
        s.schedule()


def test_oversized_prompt_chunks(fake_model_dir):
    """A prompt above the batch budget schedules in chunks (the reference
    rejects this configuration)."""
    from minivllm_tpu.config import Config

    cfg = Config(model=fake_model_dir, max_num_seqs=8, max_model_len=512,
                 max_num_batched_tokens=256)
    cfg.num_kvcache_blocks = 100
    s = Scheduler(cfg)
    big = mk_seq(400)
    s.add(big)
    seqs, is_prefill = s.schedule()
    assert is_prefill and seqs == [big]
    assert big.chunk_range == (0, 256)
    s.postprocess(seqs, [1])
    assert len(big) == 400  # mid-chunk sample discarded
    seqs, _ = s.schedule()
    assert big.chunk_range == (256, 400)
    s.postprocess(seqs, [5])
    assert big.token_ids[-1] == 5
    assert s.num_running == 1


def test_max_num_seqs_cap(fake_model_dir):
    from minivllm_tpu.config import Config

    cfg = Config(model=fake_model_dir, max_num_seqs=2, max_model_len=512,
                 max_num_batched_tokens=512)
    cfg.num_kvcache_blocks = 100
    s = Scheduler(cfg)
    for _ in range(3):
        s.add(mk_seq(10))
    seqs, _ = s.schedule()
    assert len(seqs) == 2
    assert s.num_waiting == 1
