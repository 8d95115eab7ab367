"""OPT model family.

Counterpart of the reference OPT implementation
(/root/reference/minivllm/models/opt.py:30-343): learned positional
embeddings with offset 2, MHA with QKV bias, pre- or post-LayerNorm
decoder (do_layer_norm_before), ReLU MLP, tied lm_head, optional
project_in/project_out when word_embed_proj_dim != hidden_size.

Same TPU design as qwen.py: stacked layer params + lax.scan, paged KV
cache in the scan carry, explicit batch-metadata pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from minivllm_tpu.models.common import WeightCollector, mask_pad_logits
from minivllm_tpu.ops.attention import cache_len, store_kv
from minivllm_tpu.ops.norm import layer_norm
from minivllm_tpu.ops.quant import qdot, qlookup, qtranspose, quantize_tree

__all__ = ["OPTForCausalLM"]


class OPTForCausalLM:
    a8 = False  # W8A8 matmul path (see qwen.py)

    def __init__(self, hf_config, dtype=jnp.bfloat16, attn_backend=None) -> None:
        c = hf_config
        self.dtype = jnp.dtype(dtype)
        self.num_layers = c.num_hidden_layers
        self.hidden_size = c.hidden_size
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = self.num_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.ffn_dim = c.ffn_dim
        self.vocab_size = c.vocab_size
        self.word_embed_dim = getattr(c, "word_embed_proj_dim", c.hidden_size)
        self.max_position_embeddings = c.max_position_embeddings
        self.do_layer_norm_before = getattr(c, "do_layer_norm_before", True)
        self.tie_embeddings = True  # OPT always ties lm_head to embed_tokens
        self.scale = self.head_dim**-0.5
        self.attn_backend = attn_backend
        self.padded_vocab_size = -(-self.vocab_size // 256) * 256
        self.needs_projection = self.word_embed_dim != self.hidden_size
        # HF OPT offsets learned positions by 2 (opt.py:30-40).
        self.pos_offset = 2

    # -- parameters ----------------------------------------------------------

    def init_params(self, rng) -> dict:
        L, D, F = self.num_layers, self.hidden_size, self.ffn_dim
        keys = iter(jax.random.split(rng, 12))

        def lin(shape):
            return jax.random.normal(next(keys), shape, self.dtype) * jnp.asarray(
                0.02, self.dtype
            )

        layers = {
            "attn_ln": jnp.ones((L, D), self.dtype),
            "attn_ln_bias": jnp.zeros((L, D), self.dtype),
            "q_proj": lin((L, D, D)),
            "q_bias": jnp.zeros((L, D), self.dtype),
            "k_proj": lin((L, D, D)),
            "k_bias": jnp.zeros((L, D), self.dtype),
            "v_proj": lin((L, D, D)),
            "v_bias": jnp.zeros((L, D), self.dtype),
            "o_proj": lin((L, D, D)),
            "o_bias": jnp.zeros((L, D), self.dtype),
            "final_ln": jnp.ones((L, D), self.dtype),
            "final_ln_bias": jnp.zeros((L, D), self.dtype),
            "fc1": lin((L, D, F)),
            "fc1_bias": jnp.zeros((L, F), self.dtype),
            "fc2": lin((L, F, D)),
            "fc2_bias": jnp.zeros((L, D), self.dtype),
        }
        params = {
            "embed": lin((self.padded_vocab_size, self.word_embed_dim)),
            "embed_pos": lin(
                (self.max_position_embeddings + self.pos_offset, D)
            ),
            "layers": layers,
        }
        if self.do_layer_norm_before:
            params["final_norm"] = jnp.ones((D,), self.dtype)
            params["final_norm_bias"] = jnp.zeros((D,), self.dtype)
        if self.needs_projection:
            params["project_in"] = lin((self.word_embed_dim, D))
            params["project_out"] = lin((D, self.word_embed_dim))
        return params

    def load_weights(self, weights) -> dict:
        col = WeightCollector(self.num_layers, self.dtype)
        T = np.transpose
        pad_v = self.padded_vocab_size - self.vocab_size

        def pad_rows(t):
            return np.pad(t, ((0, pad_v), (0, 0)))

        pre = r"model\.decoder\.layers\.{L}\."
        rules = [
            (r"model\.decoder\.embed_tokens\.weight", ("embed",), pad_rows),
            (r"model\.decoder\.embed_positions\.weight", ("embed_pos",), None),
            (r"model\.decoder\.final_layer_norm\.weight", ("final_norm",), None),
            (r"model\.decoder\.final_layer_norm\.bias", ("final_norm_bias",), None),
            (r"model\.decoder\.project_in\.weight", ("project_in",), T),
            (r"model\.decoder\.project_out\.weight", ("project_out",), T),
            (pre + r"self_attn_layer_norm\.weight", ("layers", "attn_ln"), None),
            (pre + r"self_attn_layer_norm\.bias", ("layers", "attn_ln_bias"), None),
            (pre + r"self_attn\.q_proj\.weight", ("layers", "q_proj"), T),
            (pre + r"self_attn\.q_proj\.bias", ("layers", "q_bias"), None),
            (pre + r"self_attn\.k_proj\.weight", ("layers", "k_proj"), T),
            (pre + r"self_attn\.k_proj\.bias", ("layers", "k_bias"), None),
            (pre + r"self_attn\.v_proj\.weight", ("layers", "v_proj"), T),
            (pre + r"self_attn\.v_proj\.bias", ("layers", "v_bias"), None),
            (pre + r"self_attn\.out_proj\.weight", ("layers", "o_proj"), T),
            (pre + r"self_attn\.out_proj\.bias", ("layers", "o_bias"), None),
            (pre + r"final_layer_norm\.weight", ("layers", "final_ln"), None),
            (pre + r"final_layer_norm\.bias", ("layers", "final_ln_bias"), None),
            (pre + r"fc1\.weight", ("layers", "fc1"), T),
            (pre + r"fc1\.bias", ("layers", "fc1_bias"), None),
            (pre + r"fc2\.weight", ("layers", "fc2"), T),
            (pre + r"fc2\.bias", ("layers", "fc2_bias"), None),
        ]
        for pat, path, tr in rules:
            col.rule(pat, path, tr)
        unmatched = []
        for name, tensor in weights:
            if not col.add(name, tensor):
                if name == "lm_head.weight":  # tied
                    continue
                unmatched.append(name)
        if unmatched:
            raise ValueError(f"unmatched checkpoint tensors: {unmatched[:8]}")
        return col.build()

    def quant_plan(self) -> dict:
        plan = {
            ("embed",): (1,),
            ("layers", "q_proj"): (1,),
            ("layers", "k_proj"): (1,),
            ("layers", "v_proj"): (1,),
            ("layers", "o_proj"): (1,),
            ("layers", "fc1"): (1,),
            ("layers", "fc2"): (1,),
        }
        return plan

    def quantize_params(self, params: dict, fmt: str = "int8") -> dict:
        return quantize_tree(params, self.quant_plan(), fmt)

    def param_pspecs(self) -> dict:
        from jax.sharding import PartitionSpec as P

        col, row, rep2 = P("pp", None, "tp"), P("pp", "tp", None), P("pp", None)
        bias_col = P("pp", "tp")
        layers = {
            "attn_ln": rep2, "attn_ln_bias": rep2,
            "q_proj": col, "q_bias": bias_col,
            "k_proj": col, "k_bias": bias_col,
            "v_proj": col, "v_bias": bias_col,
            "o_proj": row, "o_bias": rep2,
            "final_ln": rep2, "final_ln_bias": rep2,
            "fc1": col, "fc1_bias": bias_col,
            "fc2": row, "fc2_bias": rep2,
        }
        specs = {
            "embed": P("tp", None),
            "embed_pos": P(None, None),
            "layers": layers,
        }
        if self.do_layer_norm_before:
            specs["final_norm"] = P(None)
            specs["final_norm_bias"] = P(None)
        if self.needs_projection:
            specs["project_in"] = P(None, None)
            specs["project_out"] = P(None, None)
        return specs

    # -- forward -------------------------------------------------------------

    def pre_layers(self, params, batch):
        x = qlookup(params["embed"], batch.input_ids, self.dtype)
        if self.needs_projection:
            x = jnp.dot(x, params["project_in"])
        x = x + params["embed_pos"][batch.positions + self.pos_offset]
        return x, None

    def post_layers(self, params, x):
        if self.do_layer_norm_before:
            x = layer_norm(x, params["final_norm"], params["final_norm_bias"])
        if self.needs_projection:
            x = jnp.dot(x, params["project_out"])
        return x

    def run_layers(
        self, layer_params, x, batch, k_cache, v_cache, aux, *,
        is_prefill: bool, layer_offset=0,
    ):
        H, hd = self.num_heads, self.head_dim
        backend = self.attn_backend
        n_local = jax.tree.leaves(layer_params)[0].shape[0]
        stride = cache_len(k_cache) // n_local

        def layer(carry, scanned):
            x, k_cache, v_cache = carry
            lp, lidx = scanned
            base = lidx * stride
            T = x.shape[0]
            residual = x
            h_in = (
                layer_norm(x, lp["attn_ln"], lp["attn_ln_bias"])
                if self.do_layer_norm_before
                else x
            )
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
            x = residual + o + lp["o_bias"]
            if not self.do_layer_norm_before:
                x = layer_norm(x, lp["attn_ln"], lp["attn_ln_bias"])
            residual = x
            h_mlp = (
                layer_norm(x, lp["final_ln"], lp["final_ln_bias"])
                if self.do_layer_norm_before
                else x
            )
            h_mlp = jnp.maximum(qdot(h_mlp, lp["fc1"], a8=self.a8) + lp["fc1_bias"], 0)
            x = residual + qdot(h_mlp, lp["fc2"], a8=self.a8) + lp["fc2_bias"]
            if not self.do_layer_norm_before:
                x = layer_norm(x, lp["final_ln"], lp["final_ln_bias"])
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
