"""GPT-2 model family.

Counterpart of the reference GPT-2 implementation
(/root/reference/minivllm/models/gpt2.py:39-257): learned positional
embeddings, fused-QKV Conv1D attention, tanh-GELU MLP, tied lm_head.

Checkpoint notes: HF GPT-2 stores Conv1D weights already as (in, out), so
unlike the torch reference (which transposes to Linear layout,
gpt2.py:158-257) they load directly; the fused c_attn is split into
q/k/v at load so each shard carries whole heads under tensor parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from minivllm_tpu.models.common import WeightCollector, mask_pad_logits
from minivllm_tpu.ops.activation import gelu_new
from minivllm_tpu.ops.attention import cache_len, store_kv
from minivllm_tpu.ops.norm import layer_norm
from minivllm_tpu.ops.quant import qdot, qlookup, qtranspose, quantize_tree

__all__ = ["GPT2ForCausalLM"]


class GPT2ForCausalLM:
    a8 = False  # W8A8 matmul path (see qwen.py)

    def __init__(self, hf_config, dtype=jnp.bfloat16, attn_backend=None) -> None:
        c = hf_config
        self.dtype = jnp.dtype(dtype)
        self.num_layers = c.n_layer
        self.hidden_size = c.n_embd
        self.num_heads = c.n_head
        self.num_kv_heads = self.num_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.ffn_dim = getattr(c, "n_inner", None) or 4 * self.hidden_size
        self.vocab_size = c.vocab_size
        self.max_position_embeddings = c.n_positions
        self.layer_norm_eps = getattr(c, "layer_norm_epsilon", 1e-5)
        self.tie_embeddings = True
        self.scale = self.head_dim**-0.5
        self.attn_backend = attn_backend
        self.padded_vocab_size = -(-self.vocab_size // 256) * 256

    # -- parameters ----------------------------------------------------------

    def init_params(self, rng) -> dict:
        L, D, F = self.num_layers, self.hidden_size, self.ffn_dim
        keys = iter(jax.random.split(rng, 12))

        def lin(shape):
            return jax.random.normal(next(keys), shape, self.dtype) * jnp.asarray(
                0.02, self.dtype
            )

        layers = {
            "ln1": jnp.ones((L, D), self.dtype),
            "ln1_bias": jnp.zeros((L, D), self.dtype),
            "q_proj": lin((L, D, D)),
            "q_bias": jnp.zeros((L, D), self.dtype),
            "k_proj": lin((L, D, D)),
            "k_bias": jnp.zeros((L, D), self.dtype),
            "v_proj": lin((L, D, D)),
            "v_bias": jnp.zeros((L, D), self.dtype),
            "o_proj": lin((L, D, D)),
            "o_bias": jnp.zeros((L, D), self.dtype),
            "ln2": jnp.ones((L, D), self.dtype),
            "ln2_bias": jnp.zeros((L, D), self.dtype),
            "fc_in": lin((L, D, F)),
            "fc_in_bias": jnp.zeros((L, F), self.dtype),
            "fc_out": lin((L, F, D)),
            "fc_out_bias": jnp.zeros((L, D), self.dtype),
        }
        return {
            "embed": lin((self.padded_vocab_size, D)),
            "embed_pos": lin((self.max_position_embeddings, D)),
            "layers": layers,
            "final_norm": jnp.ones((D,), self.dtype),
            "final_norm_bias": jnp.zeros((D,), self.dtype),
        }

    def load_weights(self, weights) -> dict:
        col = WeightCollector(self.num_layers, self.dtype)
        D = self.hidden_size
        pad_v = self.padded_vocab_size - self.vocab_size

        def pad_rows(t):
            return np.pad(t, ((0, pad_v), (0, 0)))

        def split3(i):
            # c_attn weight (D, 3D) -> (D, D) slice; bias (3D,) -> (D,)
            def f(t):
                return t[..., i * D : (i + 1) * D]

            return f

        pre = r"(?:transformer\.)?h\.{L}\."
        rules = [
            (r"(?:transformer\.)?wte\.weight", ("embed",), pad_rows),
            (r"(?:transformer\.)?wpe\.weight", ("embed_pos",), None),
            (r"(?:transformer\.)?ln_f\.weight", ("final_norm",), None),
            (r"(?:transformer\.)?ln_f\.bias", ("final_norm_bias",), None),
            (pre + r"ln_1\.weight", ("layers", "ln1"), None),
            (pre + r"ln_1\.bias", ("layers", "ln1_bias"), None),
            (pre + r"attn\.c_attn\.weight", ("layers", "q_proj"), split3(0)),
            (pre + r"attn\.c_attn\.bias", ("layers", "q_bias"), split3(0)),
            (pre + r"attn\.c_proj\.weight", ("layers", "o_proj"), None),
            (pre + r"attn\.c_proj\.bias", ("layers", "o_bias"), None),
            (pre + r"ln_2\.weight", ("layers", "ln2"), None),
            (pre + r"ln_2\.bias", ("layers", "ln2_bias"), None),
            (pre + r"mlp\.c_fc\.weight", ("layers", "fc_in"), None),
            (pre + r"mlp\.c_fc\.bias", ("layers", "fc_in_bias"), None),
            (pre + r"mlp\.c_proj\.weight", ("layers", "fc_out"), None),
            (pre + r"mlp\.c_proj\.bias", ("layers", "fc_out_bias"), None),
        ]
        for pat, path, tr in rules:
            col.rule(pat, path, tr)
        # k/v slices of the fused c_attn need their own rules (a tensor can
        # only match one rule, so route c_attn through a multi-add below).
        k_col = WeightCollector(self.num_layers, self.dtype)
        k_col.rule(pre + r"attn\.c_attn\.weight", ("layers", "k_proj"), split3(1))
        k_col.rule(pre + r"attn\.c_attn\.bias", ("layers", "k_bias"), split3(1))
        v_col = WeightCollector(self.num_layers, self.dtype)
        v_col.rule(pre + r"attn\.c_attn\.weight", ("layers", "v_proj"), split3(2))
        v_col.rule(pre + r"attn\.c_attn\.bias", ("layers", "v_bias"), split3(2))
        unmatched = []
        for name, tensor in weights:
            matched = col.add(name, tensor)
            if "c_attn" in name:
                k_col.add(name, tensor)
                v_col.add(name, tensor)
            if not matched:
                if name in ("lm_head.weight",) or name.endswith("attn.bias") or name.endswith("attn.masked_bias"):
                    continue  # tied head / causal-mask buffers
                unmatched.append(name)
        if unmatched:
            raise ValueError(f"unmatched checkpoint tensors: {unmatched[:8]}")
        params = col.build()
        params["layers"].update(k_col.build().get("layers", {}))
        params["layers"].update(v_col.build().get("layers", {}))
        return params

    def quant_plan(self) -> dict:
        plan = {
            ("embed",): (1,),
            ("layers", "q_proj"): (1,),
            ("layers", "k_proj"): (1,),
            ("layers", "v_proj"): (1,),
            ("layers", "o_proj"): (1,),
            ("layers", "fc_in"): (1,),
            ("layers", "fc_out"): (1,),
        }
        return plan

    def quantize_params(self, params: dict, fmt: str = "int8") -> dict:
        return quantize_tree(params, self.quant_plan(), fmt)

    def param_pspecs(self) -> dict:
        from jax.sharding import PartitionSpec as P

        col, row, rep2 = P("pp", None, "tp"), P("pp", "tp", None), P("pp", None)
        bias_col = P("pp", "tp")
        layers = {
            "ln1": rep2, "ln1_bias": rep2,
            "q_proj": col, "q_bias": bias_col,
            "k_proj": col, "k_bias": bias_col,
            "v_proj": col, "v_bias": bias_col,
            "o_proj": row, "o_bias": rep2,
            "ln2": rep2, "ln2_bias": rep2,
            "fc_in": col, "fc_in_bias": bias_col,
            "fc_out": row, "fc_out_bias": rep2,
        }
        return {
            "embed": P("tp", None),
            "embed_pos": P(None, None),
            "layers": layers,
            "final_norm": P(None),
            "final_norm_bias": P(None),
        }

    # -- forward -------------------------------------------------------------

    def pre_layers(self, params, batch):
        x = qlookup(params["embed"], batch.input_ids, self.dtype)
        return x + params["embed_pos"][batch.positions], None

    def post_layers(self, params, x):
        return layer_norm(
            x, params["final_norm"], params["final_norm_bias"],
            self.layer_norm_eps,
        )

    def run_layers(
        self, layer_params, x, batch, k_cache, v_cache, aux, *,
        is_prefill: bool, layer_offset=0,
    ):
        H, hd = self.num_heads, self.head_dim
        eps = self.layer_norm_eps
        backend = self.attn_backend
        n_local = jax.tree.leaves(layer_params)[0].shape[0]
        stride = cache_len(k_cache) // n_local

        def layer(carry, scanned):
            x, k_cache, v_cache = carry
            lp, lidx = scanned
            base = lidx * stride
            T = x.shape[0]
            h_in = layer_norm(x, lp["ln1"], lp["ln1_bias"], eps)
            q = (qdot(h_in, lp["q_proj"], a8=self.a8) + lp["q_bias"]).reshape(T, H, hd)
            k = (qdot(h_in, lp["k_proj"], a8=self.a8) + lp["k_bias"]).reshape(T, H, hd)
            v = (qdot(h_in, lp["v_proj"], a8=self.a8) + lp["v_bias"]).reshape(T, H, hd)
            slots = base + batch.slot_mapping
            k_cache, v_cache = store_kv(k_cache, v_cache, k, v, slots)
            if is_prefill:
                attn = backend.prefill(q, k_cache, v_cache, batch, self.scale, base)
            else:
                attn = backend.decode(q, k_cache, v_cache, batch, self.scale, base)
            o = qdot(attn.reshape(T, H * hd), lp["o_proj"], a8=self.a8)
            x = x + o + lp["o_bias"]
            h_mlp = layer_norm(x, lp["ln2"], lp["ln2_bias"], eps)
            h_mlp = gelu_new(qdot(h_mlp, lp["fc_in"], a8=self.a8) + lp["fc_in_bias"])
            x = x + qdot(h_mlp, lp["fc_out"], a8=self.a8) + lp["fc_out_bias"]
            return (x, k_cache, v_cache), None

        lidx = jnp.arange(n_local, dtype=jnp.int32)
        (x, k_cache, v_cache), _ = lax.scan(
            layer, (x, k_cache, v_cache), (layer_params, lidx)
        )
        return x, k_cache, v_cache

    def forward(self, params, batch, k_cache, v_cache, *, is_prefill: bool):
        x, aux = self.pre_layers(params, batch)
        x, k_cache, v_cache = self.run_layers(
            params["layers"], x, batch, k_cache, v_cache, aux,
            is_prefill=is_prefill,
        )
        return self.post_layers(params, x), k_cache, v_cache

    def compute_logits(self, params, hidden):
        logits = qdot(
            hidden, qtranspose(params["embed"]), preferred_element_type=jnp.float32
        )
        return mask_pad_logits(logits, self.vocab_size)
