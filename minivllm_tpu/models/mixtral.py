"""Mixtral model family (MixtralForCausalLM, e.g. Mixtral-8x7B).

Beyond reference parity — the reference supports no MoE models
(SURVEY.md §2.2). Mixtral composes two pieces this codebase already
has: Mistral-style attention (GQA + uniform sliding window, handled by
the Qwen base via `attn_window` — the Pallas kernels skip
out-of-window KV blocks entirely) and a routed sparse SwiGLU MoE MLP.

HF numerical contract (transformers MixtralSparseMoeBlock.forward):
full-E softmax of the router logits in fp32 -> top-k -> renormalize by
the top-k sum -> weighted expert outputs. That is exactly
`ops/moe.moe_mlp` with norm_topk_prob=True, so the whole MoE stack
(dropless grouped matmul, Pallas gmm kernel, ep/tp shard_map wrapper)
is inherited from QwenMoeForCausalLM unchanged; only the config field
names (num_local_experts; experts share the dense intermediate_size)
and the HF weight names (block_sparse_moe.gate, experts.{E}.w1/w3/w2
for gate/up/down) differ.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from minivllm_tpu.models.qwen import QwenForCausalLM
from minivllm_tpu.models.qwen_moe import QwenMoeForCausalLM

__all__ = ["MixtralForCausalLM"]


class MixtralForCausalLM(QwenMoeForCausalLM):
    def __init__(self, hf_config, dtype=jnp.bfloat16, attn_backend=None) -> None:
        # Skip QwenMoe's __init__ (it reads Qwen3-MoE config field names);
        # build the dense skeleton, then fill the MoE attributes from
        # Mixtral's fields.
        QwenForCausalLM.__init__(self, hf_config, dtype, attn_backend)
        c = hf_config
        self.num_experts = c.num_local_experts
        self.top_k = c.num_experts_per_tok
        self.moe_intermediate_size = c.intermediate_size
        # MixtralSparseMoeBlock always renormalizes the top-k weights.
        self.norm_topk_prob = True
        # Every Mixtral layer is sparse (no decoder_sparse_step /
        # mlp_only_layers analog).
        self.dense_layer_mask = np.zeros((self.num_layers,), dtype=bool)
        self.has_dense = False

    def _mlp_weight_rules(self):
        T = np.transpose
        # HF Mixtral expert naming: w1 = gate, w3 = up, w2 = down.
        return [
            ("block_sparse_moe.gate.weight", ("layers", "router"), T),
            (r"block_sparse_moe.experts.{E}.w1.weight",
             ("layers", "moe_gate"), T),
            (r"block_sparse_moe.experts.{E}.w3.weight",
             ("layers", "moe_up"), T),
            (r"block_sparse_moe.experts.{E}.w2.weight",
             ("layers", "moe_down"), T),
        ]
