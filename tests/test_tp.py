"""Real SPMD tensor-parallel tests on the 8-virtual-device CPU mesh —
actual multi-device execution, not mocks (improves on the reference's
mocked TP tier, SURVEY.md §4)."""

import numpy as np
import pytest
import jax

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.engine.model_runner import ModelRunner
from minivllm_tpu.engine.sequence import Sequence
from minivllm_tpu.parallel.sharding import make_mesh
from minivllm_tpu.utils.testing import make_tiny_checkpoint

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    # 8 kv heads so tp in {1,2,4,8} divides evenly.
    return make_tiny_checkpoint(
        "qwen3",
        tmp_path_factory.mktemp("tp") / "m",
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=16,
        hidden_size=64,
    )


def run_tokens(ckpt, tp):
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
        tensor_parallel_size=tp,
    )
    mesh = make_mesh(tp) if tp > 1 else None
    runner = ModelRunner(cfg, mesh=mesh)
    seqs = [
        Sequence(list(range(1, 1 + n)), SamplingParams(temperature=0.0),
                 block_size=16)
        for n in (7, 12)
    ]
    nb = 0
    for s in seqs:
        need = (len(s) + 15) // 16
        s.block_table = list(range(nb, nb + need))
        nb += need
    out = [runner.run(seqs, is_prefill=True)]
    for t, s in zip(out[-1], seqs):
        s.append_token(int(t))
    for _ in range(4):
        out.append(runner.run(seqs, is_prefill=False))
        for t, s in zip(out[-1], seqs):
            s.append_token(int(t))
    return out


def test_tp_matches_single_device(ckpt):
    ref = run_tokens(ckpt, 1)
    for tp in (2, 4, 8):
        assert run_tokens(ckpt, tp) == ref, f"tp={tp} diverged"


def test_tp_requires_divisible_heads(tmp_path):
    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / "bad", num_attention_heads=6,
        num_key_value_heads=3, head_dim=16, hidden_size=96,
        intermediate_size=128,
    )
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
        tensor_parallel_size=4,
    )
    with pytest.raises(ValueError, match="not divisible"):
        ModelRunner(cfg, mesh=make_mesh(4))
