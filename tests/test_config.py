"""Config validation tests (reference: tests/test_config.py)."""

import pytest

from minivllm_tpu.config import Config


def test_defaults(fake_model_dir):
    cfg = Config(model=fake_model_dir)
    assert cfg.kvcache_block_size == 64
    assert cfg.tensor_parallel_size == 1
    assert cfg.hf_config is not None
    assert cfg.hf_config.model_type == "qwen3"
    assert cfg.model_dtype == "bfloat16"
    assert cfg.gpu_memory_utilization == cfg.device_memory_utilization


def test_max_model_len_clamped_to_model(fake_model_dir):
    cfg = Config(model=fake_model_dir, max_model_len=100000,
                 max_num_batched_tokens=100000)
    assert cfg.max_model_len == 2048  # fake model max_position_embeddings


def test_batched_tokens_below_model_len_allowed(fake_model_dir):
    """The reference rejects budgets below max_model_len; chunked prefill
    makes this configuration valid here."""
    cfg = Config(model=fake_model_dir, max_num_batched_tokens=128,
                 max_model_len=512)
    assert cfg.max_num_batched_tokens == 128


@pytest.mark.parametrize("util", [0.05, 1.5])
def test_memory_utilization_range(fake_model_dir, util):
    with pytest.raises(ValueError, match="device_memory_utilization"):
        Config(model=fake_model_dir, device_memory_utilization=util)


def test_block_size_divisor(fake_model_dir):
    with pytest.raises(ValueError, match="kvcache_block_size"):
        Config(model=fake_model_dir, kvcache_block_size=50)


def test_tp_size_range(fake_model_dir):
    with pytest.raises(ValueError, match="tensor_parallel_size"):
        Config(model=fake_model_dir, tensor_parallel_size=0)
    with pytest.raises(ValueError, match="tensor_parallel_size"):
        Config(model=fake_model_dir, tensor_parallel_size=128)


def test_bad_model_path():
    with pytest.raises(ValueError, match="not a valid directory"):
        Config(model="/nonexistent/path/to/model")


def test_bad_dtype(fake_model_dir):
    with pytest.raises(ValueError, match="dtype"):
        Config(model=fake_model_dir, dtype="int4")


def test_buckets_derived(fake_model_dir):
    cfg = Config(model=fake_model_dir, max_num_seqs=48, max_model_len=512,
                 max_num_batched_tokens=600)
    assert cfg.decode_seq_buckets[-1] == 48
    assert cfg.decode_seq_buckets == sorted(set(cfg.decode_seq_buckets))
    assert cfg.prefill_token_buckets[-1] == 600
    assert all(b <= 600 for b in cfg.prefill_token_buckets)
