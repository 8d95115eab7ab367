"""Sequence token/block math and state transitions
(reference: tests/test_sequence.py)."""

import pytest

from minivllm_tpu.engine.sequence import Sequence, SequenceStatus
from minivllm_tpu.sampling_params import SamplingParams


def test_basic_properties():
    seq = Sequence([1, 2, 3, 4, 5], SamplingParams(max_tokens=4), block_size=4)
    assert len(seq) == 5
    assert seq.num_prompt_tokens == 5
    assert seq.num_completion_tokens == 0
    assert seq.last_token == 5
    assert seq.status == SequenceStatus.WAITING


def test_ids_monotonic():
    a = Sequence([1], block_size=4)
    b = Sequence([1], block_size=4)
    assert b.seq_id > a.seq_id


def test_block_math():
    seq = Sequence(list(range(10)), block_size=4)
    assert seq.num_blocks == 3
    assert seq.last_block_num_tokens == 2
    assert seq.block(0) == [0, 1, 2, 3]
    assert seq.block(2) == [8, 9]
    with pytest.raises(IndexError):
        seq.block(3)


def test_block_math_exact_multiple():
    seq = Sequence(list(range(8)), block_size=4)
    assert seq.num_blocks == 2
    assert seq.last_block_num_tokens == 4


def test_append_and_completion():
    seq = Sequence([1, 2, 3], block_size=4)
    seq.append_token(7)
    seq.append_token(9)
    assert seq.completion_token_ids == [7, 9]
    assert seq.prompt_token_ids == [1, 2, 3]
    assert seq.num_completion_tokens == 2
    assert len(seq) == 5


def test_reset_for_recompute():
    seq = Sequence([1, 2, 3], block_size=4)
    seq.status = SequenceStatus.RUNNING
    seq.block_table = [5, 6]
    seq.num_cached_tokens = 4
    seq.reset_for_recompute()
    assert seq.status == SequenceStatus.WAITING
    assert seq.block_table == []
    assert seq.num_cached_tokens == 0
    assert seq.num_preemptions == 1


def test_empty_prompt_rejected():
    with pytest.raises(ValueError):
        Sequence([], block_size=4)
