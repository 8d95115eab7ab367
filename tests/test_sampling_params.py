"""SamplingParams validation (reference: tests/test_sampling_params.py)."""

import pytest

from minivllm_tpu.sampling_params import SamplingParams


def test_defaults():
    sp = SamplingParams()
    assert sp.temperature == 1.0
    assert sp.top_k == -1
    assert sp.max_tokens == 64
    assert not sp.is_greedy
    assert not sp.has_penalties


def test_greedy():
    assert SamplingParams(temperature=0.0).is_greedy


@pytest.mark.parametrize(
    "kwargs",
    [
        {"temperature": -0.1},
        {"top_p": 0.0},
        {"top_p": 1.5},
        {"top_k": 0},
        {"top_k": -2},
        {"min_p": -0.1},
        {"min_p": 1.1},
        {"max_tokens": 0},
        {"typical_p": 0.0},
        {"repetition_penalty": 0.0},
    ],
)
def test_invalid(kwargs):
    with pytest.raises(ValueError):
        SamplingParams(**kwargs)


def test_penalties_flag():
    assert SamplingParams(repetition_penalty=1.2).has_penalties
    assert SamplingParams(frequency_penalty=0.5).has_penalties
    assert SamplingParams(presence_penalty=0.5).has_penalties
