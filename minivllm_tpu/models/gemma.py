"""Gemma / Gemma2 model families.

Beyond reference parity (the reference supports Qwen2/3, OPT, GPT2 only —
SURVEY.md §2). Both ride the shared Qwen decoder graph (models/qwen.py)
through its hooks:

- Gemma: RMSNorm uses the zero-centered (1 + w) weight convention, hidden
  states are scaled by sqrt(hidden_size) after embedding, and the MLP is
  GeGLU (tanh-approximated GELU on the gate).
- Gemma2 additionally: post-attention and post-feedforward RMSNorms (four
  norms per layer), query scaling by query_pre_attn_scalar**-0.5,
  attention-logit soft-capping, final-logit soft-capping, and sliding-
  window attention on alternating layers. The window/softcap route through
  the attention backend's oracle path (ops/backend.py) — the sliding
  window only masks scores; paged blocks are retained so prefix caching
  semantics are unchanged.

HF graph references: transformers GemmaForCausalLM / Gemma2ForCausalLM
(logit parity verified against them in tests/test_logit_parity.py).

Pipeline parallelism note: Gemma2's sliding/full layer pattern has period
2, so layers-per-stage must stay even for _attn_extras(local lidx) to see
the right parity; shard_params enforces divisibility, Gemma2 additionally
requires (num_layers / pp) % 2 == 0 when pp > 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from minivllm_tpu.models.qwen import QwenForCausalLM
from minivllm_tpu.models.common import mask_pad_logits
from minivllm_tpu.ops.activation import gelu_new
from minivllm_tpu.ops.norm import rms_norm
from minivllm_tpu.ops.quant import qdot, qtranspose

__all__ = ["GemmaForCausalLM", "Gemma2ForCausalLM"]


class GemmaForCausalLM(QwenForCausalLM):
    def __init__(self, hf_config, dtype=jnp.bfloat16, attn_backend=None) -> None:
        super().__init__(hf_config, dtype, attn_backend)
        self.qkv_bias = bool(getattr(hf_config, "attention_bias", False))
        self.qk_norm = False
        self.norm_init = 0.0  # identity scale under the (1 + w) convention

    # (1 + w) norm weights, zero-initialized in checkpoints.
    def _norm(self, x, w):
        return rms_norm(x, 1.0 + w.astype(jnp.float32), self.rms_eps)

    def pre_layers(self, params, batch):
        x, aux = super().pre_layers(params, batch)
        # HF scales by a sqrt(hidden) constant cast to the model dtype.
        normalizer = jnp.asarray(self.hidden_size**0.5, self.dtype)
        return x * normalizer, aux

    def _mlp(self, lp, h):
        gate = qdot(h, lp["gate_proj"], a8=self.a8)
        up = qdot(h, lp["up_proj"], a8=self.a8)
        return qdot(gelu_new(gate) * up, lp["down_proj"], a8=self.a8)

    def init_params(self, rng):
        # Norm weights are zero-centered ((1 + w) convention): identity
        # scale is w = 0, matching fresh Gemma checkpoints.
        params = super().init_params(rng)
        params["final_norm"] = jnp.zeros_like(params["final_norm"])
        for key in ("input_ln", "post_ln"):
            if key in params["layers"]:
                params["layers"][key] = jnp.zeros_like(params["layers"][key])
        return params


class Gemma2ForCausalLM(GemmaForCausalLM):
    def __init__(self, hf_config, dtype=jnp.bfloat16, attn_backend=None) -> None:
        super().__init__(hf_config, dtype, attn_backend)
        c = hf_config
        self.scale = float(getattr(c, "query_pre_attn_scalar", self.head_dim)) ** -0.5
        self.attn_softcap = getattr(c, "attn_logit_softcapping", None)
        self.final_softcap = getattr(c, "final_logit_softcapping", None)
        window = getattr(c, "sliding_window", None) or 0
        layer_types = getattr(c, "layer_types", None) or [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(self.num_layers)
        ]
        # Per-layer window; "full" layers get a sentinel wider than any
        # context so the same masked program serves both layer types.
        self._windows = np.asarray(
            [
                window if t == "sliding_attention" and window else 1 << 30
                for t in layer_types
            ],
            np.int32,
        )

    def _attn_extras(self, lidx) -> dict:
        extras = {"window": jnp.asarray(self._windows)[lidx]}
        if self.attn_softcap:
            extras["softcap"] = float(self.attn_softcap)
        return extras

    def _residual_tail(self, lp, x, attn_out):
        x = x + self._norm(attn_out, lp["post_attn_ln"])
        h = self._norm(x, lp["pre_ff_ln"])
        return x + self._norm(self._mlp(lp, h), lp["post_ff_ln"])

    def compute_logits(self, params, hidden):
        w = (
            qtranspose(params["embed"])
            if self.tie_embeddings
            else params["lm_head"]
        )
        logits = qdot(hidden, w, preferred_element_type=jnp.float32)
        if self.final_softcap:
            cap = float(self.final_softcap)
            logits = cap * jnp.tanh(logits / cap)
        return mask_pad_logits(logits, self.vocab_size)

    # -- parameter structure (four norms per layer) ---------------------------

    def init_params(self, rng):
        params = super().init_params(rng)
        L, D = self.num_layers, self.hidden_size
        layers = params["layers"]
        layers.pop("post_ln")
        layers["post_attn_ln"] = jnp.zeros((L, D), self.dtype)
        layers["pre_ff_ln"] = jnp.zeros((L, D), self.dtype)
        layers["post_ff_ln"] = jnp.zeros((L, D), self.dtype)
        return params

    def load_weights(self, weights):
        from minivllm_tpu.models.common import WeightCollector

        col = WeightCollector(self.num_layers, self.dtype, 0)
        T = np.transpose
        pad_v = self.padded_vocab_size - self.vocab_size

        def pad_rows(t):
            return np.pad(t, ((0, pad_v), (0, 0)))

        for hf, path, tr in [
            (r"model\.embed_tokens\.weight", ("embed",), pad_rows),
            (r"model\.norm\.weight", ("final_norm",), None),
            ("input_layernorm.weight", ("layers", "input_ln"), None),
            ("post_attention_layernorm.weight", ("layers", "post_attn_ln"), None),
            ("pre_feedforward_layernorm.weight", ("layers", "pre_ff_ln"), None),
            ("post_feedforward_layernorm.weight", ("layers", "post_ff_ln"), None),
            ("self_attn.q_proj.weight", ("layers", "q_proj"), T),
            ("self_attn.k_proj.weight", ("layers", "k_proj"), T),
            ("self_attn.v_proj.weight", ("layers", "v_proj"), T),
            ("self_attn.o_proj.weight", ("layers", "o_proj"), T),
            ("mlp.gate_proj.weight", ("layers", "gate_proj"), T),
            ("mlp.up_proj.weight", ("layers", "up_proj"), T),
            ("mlp.down_proj.weight", ("layers", "down_proj"), T),
        ]:
            if not hf.startswith("model"):
                hf = r"model\.layers\.{L}\." + hf.replace(".", r"\.")
            col.rule(hf, path, tr)
        unmatched = []
        for name, tensor in weights:
            if not col.add(name, tensor):
                if name == "lm_head.weight" and self.tie_embeddings:
                    continue
                unmatched.append(name)
        if unmatched:
            raise ValueError(f"unmatched checkpoint tensors: {unmatched[:8]}")
        return col.build()

    def param_pspecs(self):
        from jax.sharding import PartitionSpec as P

        specs = super().param_pspecs()
        layers = specs["layers"]
        layers.pop("post_ln")
        rep2 = P("pp", None)
        layers["post_attn_ln"] = rep2
        layers["pre_ff_ln"] = rep2
        layers["post_ff_ln"] = rep2
        return specs
