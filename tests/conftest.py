"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so SPMD/tensor-parallel paths
are exercised for real (the reference could only mock TP in CI — SURVEY.md
§4). Must run before jax initializes, hence the env mutation at import.
"""

import json
import os

# Force CPU before any backend initializes. Note: env-var JAX_PLATFORMS may
# already be pinned to a hardware plugin by the environment's sitecustomize,
# so use jax.config (which wins) plus XLA_FLAGS for the virtual device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from minivllm_tpu.config import Config
from minivllm_tpu.sampling_params import SamplingParams
from minivllm_tpu.engine.sequence import Sequence


def make_fake_model_dir(tmp_path, **overrides):
    """Directory with only a config.json — enough for Config/hf_config
    (mirrors the reference's fake model dirs, tests/conftest.py:22-109)."""
    cfg = {
        "architectures": ["Qwen3ForCausalLM"],
        "model_type": "qwen3",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "num_hidden_layers": 2,
        "head_dim": 16,
        "vocab_size": 256,
        "max_position_embeddings": 2048,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,
        "torch_dtype": "float32",
    }
    cfg.update(overrides)
    d = tmp_path / "fake_model"
    d.mkdir(exist_ok=True)
    (d / "config.json").write_text(json.dumps(cfg))
    return str(d)


@pytest.fixture
def fake_model_dir(tmp_path):
    return make_fake_model_dir(tmp_path)


@pytest.fixture
def default_config(fake_model_dir):
    cfg = Config(model=fake_model_dir, max_num_seqs=16, max_model_len=512,
                 max_num_batched_tokens=512)
    cfg.num_kvcache_blocks = 100
    return cfg


@pytest.fixture
def limited_cache_config(fake_model_dir):
    """Tiny cache to force preemption (reference conftest.py:117-154)."""
    cfg = Config(model=fake_model_dir, max_num_seqs=8, max_model_len=512,
                 max_num_batched_tokens=512)
    cfg.num_kvcache_blocks = 4
    return cfg


@pytest.fixture
def short_sequence():
    return Sequence([1, 2, 3], SamplingParams(), block_size=4)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite compiles several hundred XLA:CPU programs in one
    process; past ~300 the CPU backend segfaults/aborts INSIDE
    backend_compile (reproduced 4/4 at tests/test_shared_prefix.py's
    engine test, which passes in isolation and in any small group —
    the crash follows cumulative compiler state, not a specific
    program). Dropping the jit caches at module teardown keeps the
    live-executable count bounded; per-module recompiles on CPU are
    cheap next to the engine tests themselves."""
    yield
    jax.clear_caches()
