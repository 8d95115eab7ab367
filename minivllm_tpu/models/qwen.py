"""Qwen2 / Qwen3 / Llama / Mistral model family.

Functional counterpart of the reference's shared Qwen architecture
(/root/reference/minivllm/models/qwen_base.py:65-388, qwen2.py, qwen3.py):
pre-RMSNorm decoder with RoPE GQA attention and SwiGLU MLP. Qwen2 uses QKV
bias; Qwen3 drops the bias and adds per-head q/k RMSNorm. Llama and
Mistral are the same graph with neither bias nor q/k-norm (beyond
reference parity); Mistral's sliding-window attention is exact — the
window masks in both backends and the Pallas kernels skip
out-of-window KV blocks.

TPU-first design: parameters are stacked over layers and the forward pass
is one `lax.scan`; the paged KV cache (L, num_slots, kvh, hd) rides in the
scan carry and is scattered in place; batch metadata arrives as an explicit
pytree (PrefillBatch / DecodeBatch) rather than a context side-channel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from minivllm_tpu.models.common import WeightCollector, mask_pad_logits
from minivllm_tpu.ops.quant import qdot, qlookup, qtranspose, quantize_tree
from minivllm_tpu.ops.attention import (
    DecodeBatch,
    PrefillBatch,
    cache_len,
    store_kv,
)
from minivllm_tpu.ops.norm import rms_norm
from minivllm_tpu.ops.activation import silu_and_mul
from minivllm_tpu.ops.rotary import apply_rope, compute_cos_sin

__all__ = ["QwenForCausalLM"]


class QwenForCausalLM:
    """Static architecture description + pure forward functions."""

    # W8A8 matmul path (config.quantization == "w8a8"; the runner sets
    # this after construction). Read at trace time by the layer qdots.
    a8 = False

    def __init__(self, hf_config, dtype=jnp.bfloat16, attn_backend=None) -> None:
        c = hf_config
        self.dtype = jnp.dtype(dtype)
        self.num_layers = c.num_hidden_layers
        self.hidden_size = c.hidden_size
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = getattr(c, "num_key_value_heads", self.num_heads)
        self.head_dim = getattr(c, "head_dim", None) or (
            self.hidden_size // self.num_heads
        )
        self.intermediate_size = c.intermediate_size
        self.vocab_size = c.vocab_size
        self.rms_eps = getattr(c, "rms_norm_eps", 1e-6)
        self.rope_theta = getattr(c, "rope_theta", 10000.0)
        self.tie_embeddings = getattr(c, "tie_word_embeddings", False)
        self.max_position_embeddings = getattr(c, "max_position_embeddings", 4096)
        # Qwen2: QKV bias, no q/k norm. Qwen3: no bias, q/k per-head RMSNorm
        # (reference: qwen2.py:23-40, qwen3.py:23-40).
        model_type = getattr(c, "model_type", "qwen3")
        # Uniform sliding-window attention (Mistral); None = full attention.
        # Masked exactly in both attention backends; the Pallas kernels skip
        # out-of-window KV blocks entirely.
        self.attn_window = None
        if model_type == "qwen2":
            self.qkv_bias = True
            self.qk_norm = False
        elif model_type in ("llama", "mistral", "mixtral"):
            self.qkv_bias = bool(getattr(c, "attention_bias", False))
            self.qk_norm = False
            if model_type in ("mistral", "mixtral"):
                self.attn_window = getattr(c, "sliding_window", None)
        else:
            self.qkv_bias = bool(getattr(c, "attention_bias", False))
            self.qk_norm = True
        scaling = getattr(c, "rope_scaling", None) or {}
        self.rope_scaling_type = scaling.get("rope_type", scaling.get("type"))
        self.rope_scaling_factor = float(scaling.get("factor", 1.0))
        self.rope_scaling_extra = dict(scaling)
        self.scale = self.head_dim**-0.5
        self.attn_backend = attn_backend
        # Vocab padded to a lane-and-TP-friendly multiple; pad logits are
        # masked to -inf in compute_logits so they are never sampled.
        self.padded_vocab_size = -(-self.vocab_size // 256) * 256

    # -- parameters ----------------------------------------------------------

    def init_params(self, rng) -> dict:
        """Random-normal parameters (tests / benchmarks)."""
        L, D, I = self.num_layers, self.hidden_size, self.intermediate_size
        H, KV, hd = self.num_heads, self.num_kv_heads, self.head_dim
        keys = iter(jax.random.split(rng, 16))

        def normal(*shape):
            return jax.random.normal(next(keys), shape, self.dtype) * jnp.asarray(
                0.02, self.dtype
            )

        def lin(in_d, out_d):
            return normal(L, in_d, out_d)

        layers = {
            "input_ln": jnp.ones((L, D), self.dtype),
            "q_proj": lin(D, H * hd),
            "k_proj": lin(D, KV * hd),
            "v_proj": lin(D, KV * hd),
            "o_proj": lin(H * hd, D),
            "post_ln": jnp.ones((L, D), self.dtype),
            **self._init_mlp_params(normal),
        }
        if self.qkv_bias:
            layers["q_bias"] = jnp.zeros((L, H * hd), self.dtype)
            layers["k_bias"] = jnp.zeros((L, KV * hd), self.dtype)
            layers["v_bias"] = jnp.zeros((L, KV * hd), self.dtype)
        if self.qk_norm:
            layers["q_norm"] = jnp.ones((L, hd), self.dtype)
            layers["k_norm"] = jnp.ones((L, hd), self.dtype)
        params = {
            "embed": jax.random.normal(
                next(keys), (self.padded_vocab_size, D), self.dtype
            )
            * jnp.asarray(0.02, self.dtype),
            "layers": layers,
            "final_norm": jnp.ones((D,), self.dtype),
        }
        if not self.tie_embeddings:
            params["lm_head"] = jax.random.normal(
                next(keys), (D, self.padded_vocab_size), self.dtype
            ) * jnp.asarray(0.02, self.dtype)
        return params

    def _init_mlp_params(self, normal) -> dict:
        """Dense SwiGLU MLP parameters; MoE subclasses override.
        `normal(*shape)` draws 0.02-scaled random normals."""
        L, D, I = self.num_layers, self.hidden_size, self.intermediate_size
        return {
            "gate_proj": normal(L, D, I),
            "up_proj": normal(L, D, I),
            "down_proj": normal(L, I, D),
        }

    def _mlp_weight_rules(self):
        """(hf_suffix_pattern, layers_key, transform) rules for the MLP."""
        T = np.transpose
        return [
            ("mlp.gate_proj.weight", ("layers", "gate_proj"), T),
            ("mlp.up_proj.weight", ("layers", "up_proj"), T),
            ("mlp.down_proj.weight", ("layers", "down_proj"), T),
        ]

    def load_weights(self, weights) -> dict:
        """Assemble params from an iterator of (hf_name, numpy array).

        HF stores Linear weights (out, in); we store (in, out), so kernels
        are transposed at load (reference mapping: qwen_base.py:326-388).
        """
        col = WeightCollector(
            self.num_layers, self.dtype, getattr(self, "num_experts", 0)
        )
        T = np.transpose
        pad_v = self.padded_vocab_size - self.vocab_size

        def pad_rows(t):
            return np.pad(t, ((0, pad_v), (0, 0)))

        def pad_cols_t(t):
            return np.pad(np.transpose(t), ((0, 0), (0, pad_v)))

        for hf, path, tr in [
            (r"model\.embed_tokens\.weight", ("embed",), pad_rows),
            (r"model\.norm\.weight", ("final_norm",), None),
            ("input_layernorm.weight", ("layers", "input_ln"), None),
            ("post_attention_layernorm.weight", ("layers", "post_ln"), None),
            ("self_attn.q_proj.weight", ("layers", "q_proj"), T),
            ("self_attn.k_proj.weight", ("layers", "k_proj"), T),
            ("self_attn.v_proj.weight", ("layers", "v_proj"), T),
            ("self_attn.o_proj.weight", ("layers", "o_proj"), T),
            ("self_attn.q_proj.bias", ("layers", "q_bias"), None),
            ("self_attn.k_proj.bias", ("layers", "k_bias"), None),
            ("self_attn.v_proj.bias", ("layers", "v_bias"), None),
            ("self_attn.q_norm.weight", ("layers", "q_norm"), None),
            ("self_attn.k_norm.weight", ("layers", "k_norm"), None),
            *self._mlp_weight_rules(),
        ]:
            if not hf.startswith("model"):
                hf = r"model\.layers\.{L}\." + hf.replace(".", r"\.")
            col.rule(hf, path, tr)
        if not self.tie_embeddings:
            col.rule(r"lm_head\.weight", ("lm_head",), pad_cols_t)
        unmatched = []
        for name, tensor in weights:
            if not col.add(name, tensor):
                if name == "lm_head.weight" and self.tie_embeddings:
                    continue
                unmatched.append(name)
        if unmatched:
            raise ValueError(f"unmatched checkpoint tensors: {unmatched[:8]}")
        return col.build()

    def _mlp_quant_plan(self) -> dict:
        return {
            ("layers", "gate_proj"): (1,),
            ("layers", "up_proj"): (1,),
            ("layers", "down_proj"): (1,),
        }

    def quant_plan(self) -> dict:
        """Kernels to quantize (path -> contraction axes): every large
        matmul including the (tied) embedding/logits table."""
        plan = {
            ("embed",): (1,),
            ("layers", "q_proj"): (1,),
            ("layers", "k_proj"): (1,),
            ("layers", "v_proj"): (1,),
            ("layers", "o_proj"): (1,),
            **self._mlp_quant_plan(),
        }
        if not self.tie_embeddings:
            plan[("lm_head",)] = (0,)
        return plan

    def quantize_params(self, params: dict, fmt: str = "int8") -> dict:
        return quantize_tree(params, self.quant_plan(), fmt)

    def param_pspecs(self) -> dict:
        """PartitionSpecs for SPMD parallelism (see parallel/sharding.py):
        attention/MLP in Megatron column->row tp pattern, vocab-sharded
        embedding and lm_head. The stacked layer axis shards over "pp"
        (pipeline stages, parallel/pipeline.py); on non-pipelined meshes
        that axis has size 1 and the spec is a no-op."""
        from jax.sharding import PartitionSpec as P

        col = P("pp", None, "tp")   # (L, in, out): shard out
        row = P("pp", "tp", None)   # (L, in, out): shard in
        rep2 = P("pp", None)
        layers = {
            "input_ln": rep2,
            "q_proj": col,
            "k_proj": col,
            "v_proj": col,
            "o_proj": row,
            "post_ln": rep2,
            **self._mlp_pspecs(),
        }
        if self.qkv_bias:
            layers["q_bias"] = P("pp", "tp")
            layers["k_bias"] = P("pp", "tp")
            layers["v_bias"] = P("pp", "tp")
        if self.qk_norm:
            layers["q_norm"] = rep2
            layers["k_norm"] = rep2
        specs = {
            "embed": P("tp", None),
            "layers": layers,
            "final_norm": P(None),
        }
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    def _mlp_pspecs(self) -> dict:
        from jax.sharding import PartitionSpec as P

        return {
            "gate_proj": P("pp", None, "tp"),
            "up_proj": P("pp", None, "tp"),
            "down_proj": P("pp", "tp", None),
        }

    # -- forward -------------------------------------------------------------

    def _norm(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """RMSNorm hook (Gemma overrides with the (1 + w) convention)."""
        return rms_norm(x, w, self.rms_eps)

    def _attn_extras(self, lidx) -> dict:
        """Per-layer attention kwargs hook (Gemma2 overrides with its
        alternating windows / softcap; lidx is the traced local layer
        index)."""
        if self.attn_window is not None:
            return {"window": int(self.attn_window)}
        return {}

    def _residual_tail(self, lp: dict, x: jnp.ndarray, attn_out) -> jnp.ndarray:
        """Post-attention residual + MLP block (Gemma2 overrides with its
        post-attention / pre+post-feedforward norm arrangement)."""
        x = x + attn_out
        h_mlp = self._norm(x, lp["post_ln"])
        return x + self._mlp(lp, h_mlp)

    def _mlp(self, lp: dict, h: jnp.ndarray) -> jnp.ndarray:
        """Dense SwiGLU MLP on normed hidden states (T, D) -> (T, D)."""
        gate = qdot(h, lp["gate_proj"], a8=self.a8)
        up = qdot(h, lp["up_proj"], a8=self.a8)
        return qdot(silu_and_mul(gate, up), lp["down_proj"], a8=self.a8)

    def _rope(self, positions):
        return compute_cos_sin(
            positions,
            self.head_dim,
            self.rope_theta,
            self.rope_scaling_type,
            self.rope_scaling_factor,
            self.max_position_embeddings,
            self.rope_scaling_extra,
        )

    def pre_layers(self, params: dict, batch):
        """Embed inputs; returns (x, aux) where aux is the per-token RoPE
        table (leading axis = token axis, so pipeline stages can slice it
        per microbatch, parallel/pipeline.py)."""
        x = qlookup(params["embed"], batch.input_ids, self.dtype)  # (T, D)
        return x, self._rope(batch.positions)

    def post_layers(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        return self._norm(x, params["final_norm"])

    def run_layers(
        self,
        layer_params: dict,
        x: jnp.ndarray,
        batch: PrefillBatch | DecodeBatch,
        k_cache: jnp.ndarray,
        v_cache: jnp.ndarray,
        aux,
        *,
        is_prefill: bool,
        layer_offset=0,
    ):
        """Scan the decoder layers stacked in `layer_params` over x.

        Works on any leading-stacked subset of layers: the caches are the
        (possibly pipeline-stage-local) flat slot arrays covering exactly
        those layers, so the per-layer base offset is local_index * stride.
        `layer_offset` is the subset's global first-layer index (traced
        under pipeline parallelism) for hooks keyed on the global layer,
        e.g. Gemma2's alternating sliding windows.
        """
        H, KV, hd = self.num_heads, self.num_kv_heads, self.head_dim
        backend = self.attn_backend
        eps = self.rms_eps
        cos, sin = aux
        # Trace-time phase marker for hooks below the layer body that
        # need it (e.g. the MoE spmd row axis: decode rows shard over
        # "dp", packed prefill tokens over "sp"). Static per compiled
        # step function.
        self._is_prefill = is_prefill
        n_local = jax.tree.leaves(layer_params)[0].shape[0]
        stride = cache_len(k_cache) // n_local

        def layer(carry, scanned):
            x, k_cache, v_cache = carry
            lp, lidx = scanned
            base = lidx * stride
            T = x.shape[0]
            h_in = self._norm(x, lp["input_ln"])
            q = qdot(h_in, lp["q_proj"], a8=self.a8)
            k = qdot(h_in, lp["k_proj"], a8=self.a8)
            v = qdot(h_in, lp["v_proj"], a8=self.a8)
            if self.qkv_bias:
                q = q + lp["q_bias"]
                k = k + lp["k_bias"]
                v = v + lp["v_bias"]
            q = q.reshape(T, H, hd)
            k = k.reshape(T, KV, hd)
            v = v.reshape(T, KV, hd)
            if self.qk_norm:
                q = self._norm(q, lp["q_norm"])
                k = self._norm(k, lp["k_norm"])
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            slots = base + batch.slot_mapping
            k_cache, v_cache = store_kv(k_cache, v_cache, k, v, slots)
            # Traced GLOBAL layer index for hooks below the layer body
            # that key on it (e.g. Qwen3-MoE's mixed dense/sparse layer
            # mask); valid only within this trace.
            self._layer_idx = layer_offset + lidx
            extras = self._attn_extras(layer_offset + lidx)
            if is_prefill:
                attn = backend.prefill(
                    q, k_cache, v_cache, batch, self.scale, base, **extras
                )
            else:
                attn = backend.decode(
                    q, k_cache, v_cache, batch, self.scale, base, **extras
                )
            x = self._residual_tail(
                lp, x, qdot(attn.reshape(T, H * hd), lp["o_proj"], a8=self.a8)
            )
            return (x, k_cache, v_cache), None

        lidx = jnp.arange(n_local, dtype=jnp.int32)
        (x, k_cache, v_cache), _ = lax.scan(
            layer, (x, k_cache, v_cache), (layer_params, lidx)
        )
        return x, k_cache, v_cache

    def forward(
        self,
        params: dict,
        batch: PrefillBatch | DecodeBatch,
        k_cache: jnp.ndarray,
        v_cache: jnp.ndarray,
        *,
        is_prefill: bool,
    ):
        """Run the decoder. Returns (hidden, k_cache, v_cache).

        k_cache/v_cache: flat (L * num_slots, kv_heads, head_dim) arrays,
        scattered in place (donate them at the jit boundary).
        """
        x, aux = self.pre_layers(params, batch)
        x, k_cache, v_cache = self.run_layers(
            params["layers"], x, batch, k_cache, v_cache, aux,
            is_prefill=is_prefill,
        )
        return self.post_layers(params, x), k_cache, v_cache

    def compute_logits(self, params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
        """hidden (N, D) -> logits (N, padded_V) fp32; pad columns -inf."""
        w = (
            qtranspose(params["embed"])
            if self.tie_embeddings
            else params["lm_head"]
        )
        logits = qdot(hidden, w, preferred_element_type=jnp.float32)
        return mask_pad_logits(logits, self.vocab_size)
