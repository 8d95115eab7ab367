"""Pod-mesh (dcn x tp) execution on virtual devices: the multi-host layout
runs and matches single-device outputs."""

from pathlib import Path

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


def test_requests_synchronized_single_process():
    from minivllm_tpu.parallel.multihost import requests_synchronized

    assert requests_synchronized([("any", "payload")]) is True


_CHILD = r'''
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
pid, ckpt, port = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from minivllm_tpu import LLM, Config, SamplingParams
from minivllm_tpu.parallel.multihost import requests_synchronized
cfg = Config(
    model=ckpt, max_num_seqs=4, max_model_len=128, dtype="float32",
    attention_impl="xla", tensor_parallel_size=4,
    multihost=True, coordinator_address="127.0.0.1:" + port,
    num_processes=2, process_id=pid,
)
llm = LLM(cfg)
assert jax.process_count() == 2
P = [[1, 5, 9, 2], [3, 7, 11, 13, 2], [4, 4, 8]]
sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
assert requests_synchronized([(p, "greedy8") for p in P])
outs = llm.generate(P, sp, use_tqdm=False)
print("TOKENS " + json.dumps([o["token_ids"] for o in outs]), flush=True)
'''


def test_two_process_engine_determinism(tmp_path):
    """REAL two-process multi-host integration (jax.distributed over the
    local coordinator, 2 processes x 4 virtual CPU devices): both
    replicated engines — Config(multihost=True) drives initialization
    and the pod mesh end to end — must emit identical greedy tokens,
    matching the single-process run. The reference cannot express this
    at all (MASTER_ADDR hardcoded 127.0.0.1 single-node,
    /root/reference/minivllm/engine/llm_engine.py:83-90)."""
    import json
    import socket
    import subprocess
    import sys

    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / "m", num_attention_heads=8,
        num_key_value_heads=8, head_dim=16, hidden_size=64,
    )
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i), str(ckpt), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            # the child runs from tmp_path, so the repo root must ride
            # PYTHONPATH explicitly (the parent may have it only via cwd)
            env={
                **{k: v for k, v in __import__("os").environ.items()
                   if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
                "PYTHONPATH": ":".join(
                    p for p in (
                        str(Path(__file__).resolve().parent.parent),
                        __import__("os").environ.get("PYTHONPATH", ""),
                    ) if p
                ),
            },
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        toks = [ln for ln in stdout.splitlines() if ln.startswith("TOKENS ")]
        assert toks, f"child failed:\n{stderr[-2000:]}"
        outs.append(json.loads(toks[0][len("TOKENS "):]))
    assert outs[0] == outs[1], "hosts diverged"

    # Same tokens as a single-process mesh-less run (run in-process).
    from minivllm_tpu.llm import LLM

    llm = LLM(Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        dtype="float32", attention_impl="xla",
    ))
    ref = [
        o["token_ids"]
        for o in llm.generate(
            [[1, 5, 9, 2], [3, 7, 11, 13, 2], [4, 4, 8]],
            SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
            use_tqdm=False,
        )
    ]
    assert outs[0] == ref
