"""Pod-mesh (dcn x tp) execution on virtual devices: the multi-host layout
runs and matches single-device outputs."""

import numpy as np
import pytest
import jax

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.engine.model_runner import ModelRunner
from minivllm_tpu.engine.sequence import Sequence
from minivllm_tpu.parallel.multihost import make_pod_mesh
from minivllm_tpu.utils.testing import make_tiny_checkpoint

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def run_tokens(ckpt, mesh, tp):
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
        tensor_parallel_size=tp,
    )
    runner = ModelRunner(cfg, mesh=mesh)
    seqs = [
        Sequence(list(range(1, 1 + n)), SamplingParams(temperature=0.0),
                 block_size=16)
        for n in (6, 11)
    ]
    nb = 0
    for s in seqs:
        need = (len(s) + 15) // 16
        s.block_table = list(range(nb, nb + need))
        nb += need
    outs = [runner.run(seqs, is_prefill=True)]
    for t, s in zip(outs[-1], seqs):
        s.append_token(int(t))
    for _ in range(3):
        outs.append(runner.run(seqs, is_prefill=False))
        for t, s in zip(outs[-1], seqs):
            s.append_token(int(t))
    return outs


def test_pod_mesh_matches_single_device(tmp_path):
    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / "m", num_attention_heads=8,
        num_key_value_heads=8, head_dim=16, hidden_size=64,
    )
    ref = run_tokens(ckpt, None, 1)
    mesh = make_pod_mesh(tp_size=4)  # 2 "hosts" x 4 chips on 8 cpu devices
    assert dict(mesh.shape) == {
        "dcn": 2, "pp": 1, "dp": 1, "sp": 1, "ep": 1, "tp": 4,
    }
    out = run_tokens(ckpt, mesh, 4)
    assert out == ref


def test_pod_mesh_shape_validation():
    with pytest.raises(ValueError, match="not divisible"):
        make_pod_mesh(tp_size=3)
