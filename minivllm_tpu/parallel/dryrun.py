"""Multi-chip dry-run: jit the full serving step over an n-device
tensor-parallel mesh and execute one prefill + one decode step on tiny
shapes. Used by the driver (__graft_entry__.dryrun_multichip) with
virtual CPU devices to validate the SPMD program without hardware.
"""

from __future__ import annotations

import json
import tempfile
from pathlib import Path


def run_dryrun(n_devices: int) -> None:
    import jax

    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices})"
        )
    import numpy as np
    from transformers import AutoConfig

    from minivllm_tpu import Config, SamplingParams
    from minivllm_tpu.engine.model_runner import ModelRunner
    from minivllm_tpu.engine.sequence import Sequence
    from minivllm_tpu.parallel.sharding import make_mesh

    cfg_dict = {
        "architectures": ["Qwen3ForCausalLM"],
        "model_type": "qwen3",
        "hidden_size": 128,
        "intermediate_size": 256,
        "num_attention_heads": 8,
        "num_key_value_heads": 8,
        "num_hidden_layers": 2,
        "head_dim": 32,
        "vocab_size": 512,
        "max_position_embeddings": 1024,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,
    }
    tmp = Path(tempfile.mkdtemp())
    (tmp / "config.json").write_text(json.dumps(cfg_dict))
    config = Config(
        model=str(tmp),
        hf_config=AutoConfig.from_pretrained(tmp),
        max_num_seqs=4,
        max_model_len=128,
        max_num_batched_tokens=128,
        kvcache_block_size=16,
        num_kvcache_blocks=16,
        tensor_parallel_size=n_devices,
        dtype="float32",
        attention_impl="xla",
    )
    mesh = make_mesh(n_devices)
    runner = ModelRunner(config, init_random=True, mesh=mesh)

    seqs = [
        Sequence(list(np.arange(1, 1 + n)), SamplingParams(temperature=0.0),
                 block_size=16)
        for n in (5, 9)
    ]
    next_block = 0
    for seq in seqs:
        nb = (len(seq) + 15) // 16
        seq.block_table = list(range(next_block, next_block + nb))
        next_block += nb
    toks = runner.run(seqs, is_prefill=True)
    assert len(toks) == 2, toks
    for seq, t in zip(seqs, toks):
        seq.append_token(int(t))
    toks = runner.run(seqs, is_prefill=False)
    assert len(toks) == 2, toks
    print(
        f"dryrun_multichip OK: tp={n_devices}, mesh={mesh.shape}, "
        f"prefill+decode tokens={toks}"
    )
