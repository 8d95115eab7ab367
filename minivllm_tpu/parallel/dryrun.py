"""Multi-chip dry-run: jit the full serving step over an n-device mesh
and execute one prefill + one decode step on tiny shapes. Used by the
driver (__graft_entry__.dryrun_multichip) with virtual CPU devices to
validate the SPMD program without hardware.

Two passes: (1) a dense Qwen3 model over a pure tensor-parallel mesh
(tp=n), and (2) when n is even, a Qwen3-MoE model over a 2D
("ep", "tp") mesh (ep=2, tp=n/2) exercising expert-parallel sharding of
the expert-stacked weights together with tp sharding inside each expert.
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

    base = {
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
    passes = [
        (
            "dense tp",
            {**base, "architectures": ["Qwen3ForCausalLM"],
             "model_type": "qwen3"},
            n_devices,
            1,
        )
    ]
    if n_devices % 2 == 0:
        passes.append(
            (
                "moe ep x tp",
                {**base, "architectures": ["Qwen3MoeForCausalLM"],
                 "model_type": "qwen3_moe", "num_experts": 8,
                 "num_experts_per_tok": 2, "moe_intermediate_size": 64,
                 "norm_topk_prob": True, "decoder_sparse_step": 1,
                 "mlp_only_layers": []},
                n_devices // 2,
                2,
            )
        )

    for name, cfg_dict, tp, ep in passes:
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
            tensor_parallel_size=tp,
            dtype="float32",
            attention_impl="xla",
        )
        mesh = make_mesh(tp, ep_size=ep)
        runner = ModelRunner(config, init_random=True, mesh=mesh)

        seqs = [
            Sequence(list(np.arange(1, 1 + n)),
                     SamplingParams(temperature=0.0), block_size=16)
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
            f"dryrun_multichip [{name}] OK: tp={tp} ep={ep} "
            f"mesh={dict(mesh.shape)}, prefill+decode tokens={toks}"
        )
